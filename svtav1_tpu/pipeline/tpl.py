"""TPL (Temporal Dependency Model) + CRF q assignment — TPU-native.

Behavioral reference: Source/Lib/Codec/src_ops_process.c (dispenser
tpl_mc_flow_dispenser_sb_generic :519, synthesizer tpl_model_update_b :1483,
r0 svt_aom_generate_r0beta :1587) and rc_process.c crf_qindex_calc :782
(qstep-ratio path). Re-architected TPU-first:

- The dispenser is ONE jitted whole-frame program per window frame (16x16
  grid, fully batched): open-loop intra probe (source neighbors — the
  reference's OIS is source-based too, src_ops_process.c:620), full-pel +
  subpel ME against up to TWO references (the coded frame's actual past and
  future anchors — the reference walks the true ref lists,
  src_ops_process.c:1572), MC from each ref's TPL *recon*, 16x16 DCT +
  quant at the TPL qindex, transform-domain recon error, per-block ref
  pick. Frames run in CODING order so every reference's TPL recon exists
  when used (tpl_mc_flow's decode-order walk).
- The synthesizer is vectorized numpy on tiny per-frame grids (H/16 x W/16),
  reverse coding order, scatter-add over the 4 MV-overlapped blocks of each
  block's CHOSEN reference — exact tpl_model_update_b math (cur_dep_dist +
  scaled mc_dep_dist, overlap weighted; rates disabled = the reference's
  compute_rate=0 configuration).
- r0 = (sum recrf) / (sum recrf + sum mc_dep_dist) per frame
  (svt_aom_generate_r0beta with rate term zero), and CRF qindex via the
  qstep-ratio rule qstep_ratio = sqrt(r0) * weight{0.75 key, 0.9 base, 1.0}
  (rc_process.c:759-860 svt_av1_get_q_index_from_qstep_ratio).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import me_jax
from ..ops import quantize as quant_ops
from ..ops import transforms_jax as TJ
from ..constants.av1 import TxType

TPL_B = 16  # dispenser block size


@functools.lru_cache(maxsize=8)
def _tpl_frame_jit(H: int, W: int, bd: int):
    """One TPL dispenser step with up to two references:
    (src, ref0_src, ref0_rec, ref1_src, ref1_rec, dqv, have0, have1) ->
    (intra_cost, inter_cost, srcrf, recrf, mv, ref_pick, recon).

    All (H/16, W/16) grids + the frame's TPL recon plane. ref_pick: 0/1 for
    the chosen reference, -1 where intra wins."""
    R, C = H // TPL_B, W // TPL_B
    B = R * C
    sbr, sbc = H // 64, W // 64

    @jax.jit
    def run(src8, r0src8, r0rec8, r1src8, r1rec8, dqv, have0, have1):
        src = src8.astype(jnp.int32)
        dq = (dqv[0], dqv[1])
        base = 1 << (bd - 1)

        # --- intra probe (open-loop: source neighbors), DC/V/H/SMOOTH/PAETH
        from .device_decide import _grid_neighbors
        from .intra_device import _predict_modes

        r_idx = jnp.repeat(jnp.arange(R), C)
        c_idx = jnp.tile(jnp.arange(C), R)
        ha, hl = r_idx > 0, c_idx > 0
        above, left, tl = _grid_neighbors(src[None], TPL_B, R, C)
        left_fill = jnp.where(ha, above[:, 0], base + 1)
        above_fill = jnp.where(hl, left[:, 0], base - 1)
        above = jnp.where(ha[:, None], above, above_fill[:, None])
        left = jnp.where(hl[:, None], left, left_fill[:, None])
        tl = jnp.where(ha & hl, tl,
                       jnp.where(ha, above[:, 0], jnp.where(hl, left[:, 0], base)))
        preds = _predict_modes(above, left, tl, ha, hl, TPL_B)  # (B, 13, 16, 16)
        srcb = src.reshape(R, TPL_B, C, TPL_B).transpose(0, 2, 1, 3).reshape(B, TPL_B, TPL_B)
        # SATD-proxy cost: sum |DCT(resid)| (reference uses svt_aom_satd on
        # the residual — a Hadamard; any orthogonal-transform L1 is the same
        # block-energy-compaction measure)
        PROBE = (0, 1, 2, 3, 9)  # DC, V, H, SMOOTH, PAETH (MODES order)
        probe = preds[:, PROBE]
        co = TJ.fwd_txfm2d_j(srcb[:, None] - probe, int(TxType.DCT_DCT), bd)
        satd = jnp.sum(jnp.abs(co), axis=(-2, -1)) >> 2
        intra_cost = jnp.min(satd, axis=1)
        intra_pick = jnp.argmin(satd, axis=1)
        intra_pred = probe[jnp.arange(B), intra_pick]

        # --- inter per reference: full-pel ME on source + subpel, MC from
        # that ref's TPL recon (the true ref list walk)
        def ref_cost(ref_src8, ref_rec8, have):
            ref_src = ref_src8.astype(jnp.int32)
            ref_rec = ref_rec8.astype(jnp.int32)
            mv16_fp, _sb = me_jax.me_fullpel_frame(src, ref_src, sbr, sbc)
            fp = mv16_fp[16][:R, :C].reshape(B, 2)
            mv8 = me_jax.subpel_refine_lanes(srcb, ref_src, r_idx * TPL_B,
                                             c_idx * TPL_B, fp, 0, bd)
            pred_rec = me_jax.mc_lanes(ref_rec, r_idx * TPL_B, c_idx * TPL_B,
                                       mv8[:, 0] * 2, mv8[:, 1] * 2, TPL_B, TPL_B, 0, bd)
            pred_src = me_jax.mc_lanes(ref_src, r_idx * TPL_B, c_idx * TPL_B,
                                       mv8[:, 0] * 2, mv8[:, 1] * 2, TPL_B, TPL_B, 0, bd)
            co_i = TJ.fwd_txfm2d_j(srcb - pred_rec, int(TxType.DCT_DCT), bd)
            cost = jnp.sum(jnp.abs(co_i), axis=(-2, -1)) >> 2
            return jnp.where(have, cost, jnp.int32(1 << 30)), mv8, pred_rec, pred_src

        c0, mv0, prec0, psrc0 = ref_cost(r0src8, r0rec8, have0)
        c1, mv1, prec1, psrc1 = ref_cost(r1src8, r1rec8, have1)
        pick1 = c1 < c0
        inter_cost = jnp.minimum(c0, c1)
        mv8 = jnp.where(pick1[:, None], mv1, mv0)
        pred_rec = jnp.where(pick1[:, None, None], prec1, prec0)
        pred_src = jnp.where(pick1[:, None, None], psrc1, psrc0)
        use_inter = inter_cost < intra_cost
        ref_pick = jnp.where(use_inter, pick1.astype(jnp.int32), -1)

        def recon_err(pred):
            """transform-domain quant error + dequant recon (per block)."""
            ls = quant_ops.tx_scale(TPL_B, TPL_B)
            co = TJ.fwd_txfm2d_j(srcb - pred, int(TxType.DCT_DCT), bd)
            lv = jnp.clip(TJ.quantize_j(co, dq[0], dq[1], ls), -32767, 32767)
            dqc = TJ.dequantize_j(lv, dq[0], dq[1], ls, bd)
            err = jnp.sum(((co - dqc) >> 2).astype(jnp.float32) ** 2, axis=(-2, -1))
            rec = TJ.inv_txfm2d_add_j(dqc, pred, int(TxType.DCT_DCT), bd)
            return err, rec

        best_pred = jnp.where(use_inter[:, None, None], pred_rec, intra_pred)
        recrf, rec_blocks = recon_err(best_pred)
        best_pred_src = jnp.where(use_inter[:, None, None], pred_src, intra_pred)
        srcrf, _ = recon_err(best_pred_src)
        srcrf = jnp.maximum(1.0, srcrf)
        recrf = jnp.maximum(srcrf, jnp.maximum(1.0, recrf))  # :1191 clamp
        srcrf = jnp.where(use_inter, srcrf, recrf)  # intra: no propagation gain

        recon = rec_blocks.reshape(R, C, TPL_B, TPL_B).transpose(0, 2, 1, 3).reshape(H, W)
        return (intra_cost.astype(jnp.float32).reshape(R, C),
                jnp.minimum(inter_cost, intra_cost).astype(jnp.float32).reshape(R, C),
                srcrf.reshape(R, C), recrf.reshape(R, C),
                mv8.reshape(R, C, 2), ref_pick.reshape(R, C),
                recon.astype(jnp.uint8 if bd == 8 else jnp.int16))

    return run


def window_schedule(n_frames: int, minigop: int) -> list:
    """Coding-order TPL schedule for a window whose frame 0 is the intra
    seed (anchor): [(cur, ref_past, ref_future|None), ...] in window-local
    indices — the display chain when minigop == 1, the dyadic mini-GoP
    structure otherwise (pd_process.c set_mini_gop_structure analog)."""
    from . import gop

    sched = [(0, None, None)]
    anchor = 0
    while anchor < n_frames - 1:
        avail = n_frames - 1 - anchor
        size = 1
        while size * 2 <= avail and size * 2 <= minigop:
            size *= 2
        for f in gop.schedule_minigop(anchor, size):
            sched.append((f.disp_idx, f.past_idx, f.future_idx))
        anchor += size
    return sched


def tpl_window(frames_y: list, qindex: int, bd: int = 8, minigop: int = 1):
    """Run the dispenser over a window (frame 0 = intra seed) following the
    CODING prediction structure (minigop > 1: dyadic hierarchy; each coded
    frame MEs against its true past/future anchors and their TPL recons).

    frames_y: list of aligned (H, W) int source luma planes (multiples of
    64). Returns per-frame stats dicts (window order) with numpy grids."""
    H, W = frames_y[0].shape
    run = _tpl_frame_jit(H, W, bd)
    from .device_decide import qparams_np

    dqv, _lam = qparams_np(qindex, bd)
    dt = np.uint8 if bd == 8 else np.int16
    zeros = jax.device_put(np.zeros((H, W), dt))
    srcs = {}
    recs = {}
    stats = [None] * len(frames_y)
    sched = window_schedule(len(frames_y), minigop)
    for (cur, rp, rf) in sched:
        src = jax.device_put(np.asarray(frames_y[cur], dt))
        srcs[cur] = src
        r0s = srcs.get(rp, zeros)
        r0r = recs.get(rp, zeros)
        r1s = srcs.get(rf, zeros)
        r1r = recs.get(rf, zeros)
        ic, xc, sd, rd, mv, rp_map, rec = run(
            src, r0s, r0r, r1s, r1r, dqv,
            np.bool_(rp is not None), np.bool_(rf is not None))
        stats[cur] = dict(intra_cost=np.asarray(ic, np.float64),
                          inter_cost=np.asarray(xc, np.float64),
                          srcrf=np.asarray(sd, np.float64),
                          recrf=np.asarray(rd, np.float64),
                          mv=np.asarray(mv), ref_pick=np.asarray(rp_map),
                          ref0=rp if rp is not None else -1,
                          ref1=rf if rf is not None else -1)
        recs[cur] = rec
    # propagation runs in reverse CODING order
    for s in stats:
        s["_sched"] = sched
    return stats


def synthesize(stats: list) -> np.ndarray:
    """Backward propagation (tpl_model_update_b math, rates off).

    Each block's dependency mass flows to its CHOSEN reference (the coded
    prediction structure): prop = (recrf - srcrf + mc_dep *
    (recrf - srcrf)/recrf) * overlap/pix. Returns r0 per frame."""
    n = len(stats)
    sched = stats[0].get("_sched") or [(t, t - 1 if t else None, None)
                                       for t in range(n)]
    mc_dep = [np.zeros_like(s["recrf"]) for s in stats]
    for (t, _rp, _rf) in reversed(sched):
        s = stats[t]
        refs = (s.get("ref0", -1), s.get("ref1", -1))
        if refs[0] < 0 and refs[1] < 0:
            continue
        R, C = s["recrf"].shape
        cur_all = (s["recrf"] - s["srcrf"]) \
            + mc_dep[t] * (s["recrf"] - s["srcrf"]) / s["recrf"]
        fy = (np.arange(R)[:, None] * TPL_B + (s["mv"][..., 0] >> 3)).astype(np.int64)
        fx = (np.arange(C)[None, :] * TPL_B + (s["mv"][..., 1] >> 3)).astype(np.int64)
        g0y = np.floor_divide(fy, TPL_B)
        g0x = np.floor_divide(fx, TPL_B)
        oy = fy - g0y * TPL_B  # in [0, 16)
        ox = fx - g0x * TPL_B
        for which in (0, 1):
            ref = refs[which]
            if ref < 0:
                continue
            sel = s["ref_pick"] == which
            if not sel.any():
                continue
            cur = np.where(sel, cur_all, 0.0)
            dep = mc_dep[ref]
            Rr, Cr = dep.shape
            for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                gy = g0y + dy
                gx = g0x + dx
                wy = np.where(dy == 0, TPL_B - oy, oy)
                wx = np.where(dx == 0, TPL_B - ox, ox)
                w = (wy * wx).astype(np.float64) / (TPL_B * TPL_B)
                ok = (gy >= 0) & (gy < Rr) & (gx >= 0) & (gx < Cr) & (w > 0) & sel
                np.add.at(dep, (gy[ok], gx[ok]), (cur * w)[ok])
    r0 = np.ones(n)
    for t, s in enumerate(stats):
        rec_sum = float(s["recrf"].sum())
        dep_sum = float(mc_dep[t].sum())
        if rec_sum + dep_sum > 0:
            r0[t] = rec_sum / (rec_sum + dep_sum)
    return r0


def qindex_from_qstep_ratio(leaf_qindex: int, qstep_ratio: float, bd: int = 8) -> int:
    """rc_process.c svt_av1_get_q_index_from_qstep_ratio."""
    target = quant_ops.dc_q(leaf_qindex, bd) * qstep_ratio
    if qstep_ratio < 1.0:
        q = leaf_qindex
        while q > 0 and quant_ops.dc_q(q, bd) > target:
            q -= 1
        return q
    q = leaf_qindex
    while q < 255 and quant_ops.dc_q(q, bd) < target:
        q += 1
    return q


# GOP-structure r0 scaling (rc_process.c tpl_hl_islice_div_factor /
# tpl_hl_base_frame_div_factor analogs, indexed by hierarchical levels)
_ISLICE_DIV = {0: 1.0, 1: 1.2, 2: 1.6, 3: 2.0, 4: 2.5}
_BASE_DIV = {0: 1.0, 1: 1.0, 2: 1.2, 3: 1.4, 4: 1.6}
R0_WEIGHT = (0.75, 0.9, 1.0)  # I, BASE, NON-BASE (rc_process.c:779)


def crf_qindex(cq_level: int, r0: float, is_key: bool, layer: int,
               hierarchical_levels: int, bd: int = 8) -> int:
    """Per-frame CRF qindex from r0 (crf_qindex_calc qstep-ratio path)."""
    hl = min(hierarchical_levels, 4)
    if is_key:
        r0 = r0 / _ISLICE_DIV[hl]
        w = R0_WEIGHT[0]
    elif layer == 0:
        r0 = r0 / _BASE_DIV[hl]
        w = R0_WEIGHT[1]
    else:
        # non-base: interpolate toward cq by layer (the reference's
        # arf_q/w1-w2 ladder); approximate with the qstep rule + blend
        w = R0_WEIGHT[2]
    q = qindex_from_qstep_ratio(cq_level, np.sqrt(max(r0, 1e-6)) * w, bd)
    q = int(np.clip(q, 1, cq_level))
    if not is_key and layer > 0:
        # blend toward the leaf q for higher layers (non_base_qindex_weight)
        t = min(layer, 3) / 3.0
        q = int(round((1 - t) * q + t * cq_level))
    return max(1, min(255, q))
