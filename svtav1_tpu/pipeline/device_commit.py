"""Device (JAX) commit pass: conformant reconstruction of the decided plan.

The decide pass (device_decide.py) chose modes/partitions open-loop; this
pass produces the final quantized coefficients + recon that the decoder will
bit-exactly reproduce. Intra prediction needs final neighbor recon, which is
the one true sequential dependence in AV1 — re-expressed TPU-style:

- one `lax.fori_loop` over mi8 anti-diagonal waves (w = r8 + c8 + n8 - 1,
  8-px units). Scheduling at that wave index is dependency-safe for any
  legal quadtree (the above-row/left-col/topleft providers of a block always
  complete at strictly smaller waves — see proof sketch in NOTES below);
- all blocks of a wave are batched, bucketed by size (static shapes; host
  builds per-size schedules sorted by wave, so device reads are contiguous
  `dynamic_slice`s and output writes are contiguous `dynamic_update_slice`s
  — no large scatters);
- neighbor pixels live in *frontier maps*, not the recon plane:
  `bottom_rows[r8, x]` = recon row (r8+1)*8-1, `right_cols[c8, y]` = recon
  col (c8+1)*8-1. Each (band, pixel) cell has a unique writer, so reads are
  race-free and the big recon plane never round-trips through the loop.

The reference's analog is the EncDec segment wavefront
(enc_dec_process.c:3270, enc_dec_segments.h dependency maps) fused with the
final conformant encode pass (coding_loop.c:1682 svt_aom_encode_decode).

NOTES (wave-safety): for an above-row provider A of block B, A's bottom row
is exactly B.top-1 (blocks are disjoint), so w(A) = A.bottom + A.left <=
(B.top - 1) + (B.left + B.n - 1) = w(B) - 1; symmetrically for left-col
providers; same-column frontier writers are ordered bottom-last because a
lower block's (bottom + left) exceeds an upper one's by at least 1.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.tile_codec import (BlockDecision, FrameParams, Plan, chroma_tx_type,
                                chroma_tx_type_inter, max_uv_txsize)
from ..constants.av1 import MAX_TXSIZE_RECT, PredMode, RefFrame, TxType
from ..ops import quantize as quant_ops
from ..ops import transforms_jax as TJ
from .device_decide import MODES, SIZES, TX_SEARCH
from .intra_device import BSIZE_BY_N, _predict_modes


def _next_pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << (x - 1).bit_length()


_SENTINEL = np.int32(1 << 20)  # pad-lane coord: gathers clamp, scatters drop


def _build_schedule(leaves_per_frame, dec_per_frame, region):
    """Split each size's leaves into an INTER segment (no neighbor
    dependence — committed in one batched step before the wavefront) and an
    INTRA segment sorted by anti-diagonal wave. Returns per-size host arrays
    laid out [inter (NI) | intra by wave (NW)] plus segment counts.

    `region` = (x0, y0, w, h) pixels; coords are (f, REGION-LOCAL r8, c8).
    Independent intra frames share one wavefront schedule — lanes from every
    frame batch together at each wave. Returns {n: dict(coords (N,3),
    mode (N,), tx (N,), uv_tx (N,), ref (N,), mv (N,2), offsets (W+1,)
    INTRA-relative, NI, NW, kmax)} and W.

    Wave safety with the split: an intra block's above/left/topleft
    providers are written either in the inter phase (before any wave) or at
    a strictly smaller wave (see module NOTES) — so removing inter lanes
    from the wavefront preserves the dependence order while collapsing the
    serial wave count of P/B frames to the (few) waves that contain intra
    blocks. Fully vectorized (numpy lexsort + fancy gathers)."""
    x0, y0, rw, rh = region
    R8, C8 = rh // 8, rw // 8
    W = R8 + C8 + 7  # max wave = (R8-1) + (C8-1) + 8 - 1 => W-1
    out = {}
    leaf_arr = [np.asarray(lv, np.int32).reshape(-1, 3) for lv in leaves_per_frame]
    for n in SIZES:
        n8 = n // 8
        fs_l, r8_l, c8_l = [], [], []
        for f, la in enumerate(leaf_arr):
            if not len(la):
                continue
            sel = la[:, 2] == n
            if not sel.any():
                continue
            fs_l.append(np.full(int(sel.sum()), f, np.int32))
            r8_l.append(la[sel, 0] // 2 - y0 // 8)
            c8_l.append(la[sel, 1] // 2 - x0 // 8)
        if not fs_l:
            # emit an empty entry so the set of sizes (and the commit
            # program's static cfg) never depends on content
            if rh >= n and rw >= n:
                out[n] = dict(coords=np.zeros((0, 3), np.int32),
                              mode=np.zeros(0, np.int32), tx=np.zeros(0, np.int32),
                              uv_tx=np.zeros(0, np.int32), ref=np.zeros(0, np.int32),
                              mv=np.zeros((0, 2), np.int32),
                              ref2=np.zeros(0, np.int32), mv2=np.zeros((0, 2), np.int32),
                              offsets=np.zeros(W + 1, np.int32), NI=0, NW=0, kmax=0)
            continue
        fs = np.concatenate(fs_l)
        r8 = np.concatenate(r8_l)
        c8 = np.concatenate(c8_l)
        N = len(fs)
        rs, cs = r8 * 8 // n, c8 * 8 // n
        has_inter = "ref" in dec_per_frame[0][n]

        def gather(key):
            outv = np.empty(N, np.int32)
            for f in range(len(dec_per_frame)):
                m = fs == f
                if m.any():
                    outv[m] = dec_per_frame[f][n][key][rs[m], cs[m]]
            return outv

        mode = gather("mode")
        tx = gather("tx")
        if has_inter:
            ref = gather("ref")
            mv = np.stack([gather("mvy"), gather("mvx")], axis=1)
            if "ref2" in dec_per_frame[0][n]:
                ref2 = gather("ref2")
                mv2 = np.stack([gather("mv2y"), gather("mv2x")], axis=1)
            else:
                ref2 = np.full(N, -1, np.int32)
                mv2 = np.zeros((N, 2), np.int32)
        else:
            ref = np.full(N, -1, np.int32)
            mv = np.zeros((N, 2), np.int32)
            ref2 = np.full(N, -1, np.int32)
            mv2 = np.zeros((N, 2), np.int32)
        tx_uv_size = int(max_uv_txsize(BSIZE_BY_N[n]))
        intra_map = np.array([TX_SEARCH.index(chroma_tx_type(m, tx_uv_size))
                              for m in MODES], np.int32)
        inter_map = np.array([TX_SEARCH.index(chroma_tx_type_inter(t, tx_uv_size))
                              for t in TX_SEARCH], np.int32)
        # inter uv tx assumes nonzero luma; the device swaps to DCT when the
        # quantized luma comes out all-zero (tile_codec._chroma_tx_type rule)
        uv_tx = np.where(ref >= 0, inter_map[tx], intra_map[np.where(ref >= 0, 0, mode)])
        mode = np.where(ref >= 0, 0, mode)

        is_int = ref >= 0
        wave = r8 + c8 + (n8 - 1)
        # order: inter first (raster), then intra by (wave, f, r8, c8)
        seg = is_int.astype(np.int32) * -1 + 1  # inter -> 0, intra -> 1
        order = np.lexsort((c8, r8, fs, np.where(is_int, 0, wave), seg))
        fs, r8, c8 = fs[order], r8[order], c8[order]
        mode, tx, uv_tx = mode[order], tx[order], uv_tx[order]
        ref, mv, wave = ref[order], mv[order], wave[order]
        ref2, mv2 = ref2[order], mv2[order]
        NI = int(is_int.sum())
        NW = N - NI
        counts = np.bincount(wave[NI:], minlength=W).astype(np.int64)
        offsets = np.zeros(W + 1, np.int32)
        np.cumsum(counts, out=offsets[1:])
        coords = np.stack([fs, r8, c8], axis=1).astype(np.int32)
        out[n] = dict(coords=coords, mode=mode, tx=tx, uv_tx=uv_tx, ref=ref,
                      mv=mv, ref2=ref2, mv2=mv2, offsets=offsets, NI=NI, NW=NW,
                      kmax=int(counts.max()) if NW else 0)
    return out, W


def finish_levels(aux: dict) -> None:
    """Complete the commit's level fetch: pull the packed int16 buffer off
    device (if still a future), expand to the int32 view + per-size slab
    offsets + per-block skip flags the op-stream builder needs. Idempotent
    on the host side; call once per commit."""
    from ..utils import profiler

    if "levels_raw" in aux:
        levels_packed = aux.pop("levels_raw")
    else:
        with profiler.stage("levels_d2h"):
            levels_packed = np.asarray(aux.pop("levels_dev"))
    _t_unpack = time.perf_counter()
    levels_i32 = levels_packed.astype(np.int32)
    level_base = {}
    off = 0
    for n, s in aux["sched"].items():
        N = len(s["coords"])
        adj, nc = min(n, 32), n // 2
        bY, bU, bV = off, off + N * adj * adj, off + N * (adj * adj + nc * nc)
        level_base[n] = (bY, bU, bV)
        off += N * (adj * adj + 2 * nc * nc)
        ya = np.abs(levels_i32[bY:bU].reshape(N, adj * adj)).sum(1)
        ua = np.abs(levels_i32[bU:bV].reshape(N, nc * nc)).sum(1)
        va = np.abs(levels_i32[bV : bV + N * nc * nc].reshape(N, nc * nc)).sum(1)
        s["skip"] = (ya + ua + va) == 0
    aux["levels_i32"] = levels_i32
    aux["level_base"] = level_base
    profiler.add("commit/unpack_plan", time.perf_counter() - _t_unpack)


_RDOQ_FN_CACHE: dict = {}


def _rdoq_fns(qctx: int, n: int):
    """(luma_fn, chroma_fn) batched RDOQ per block size, keyed on the
    coefficient-CDF qindex bucket (same scheme as device_decide._rate_fns)."""
    key = (qctx, n)
    if key not in _RDOQ_FN_CACHE:
        from ..codec import rate_jax
        from .device_decide import fc_for_qctx

        fc = fc_for_qctx(qctx)
        bsize = BSIZE_BY_N[n]
        _RDOQ_FN_CACHE[key] = (
            rate_jax.make_rdoq_fn(fc, int(MAX_TXSIZE_RECT[bsize]), 0),
            rate_jax.make_rdoq_fn(fc, int(max_uv_txsize(bsize)), 1,
                                  txb_skip_ctx=7),
        )
    return _RDOQ_FN_CACHE[key]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _commit_device(src_y8, src_u8, src_v8, refs_y8, refs_u8, refs_v8, sched_flat,
                   dqv, lam, cfg):
    """Two-phase commit. `sched_flat` is ONE packed int32 vector (all
    per-size schedules — single h2d transfer); `dqv` = (2,) int32 [dq_dc,
    dq_ac] runtime operands (qindex as data — no per-qindex recompiles);
    `cfg` a hashable static tuple:
    (F, W, W_eff, R8, C8, bd, nref, which, y0, x0, qctx, rdoq, has_comp,
    ((n, NI_pad, NW_pad, kmax), ...)) — only POW2 BUCKETS of the segment
    sizes are static, so leaf-count drift between frames rarely recompiles.

    Phase A commits every INTER lane of every size in one batched step
    (precomputed normative MC, no neighbor dependence) and writes their
    recon into the frontier maps. Phase B runs the wavefront fori_loop over
    the W_eff compacted waves that contain INTRA work only — for a typical
    P/B frame that collapses the serial wave count from R8+C8 to a handful.
    Pad lanes carry sentinel coords (gathers clamp, scatters drop). Returns
    (levels_i16_packed, recon planes, skip map)."""
    (F, W, W_eff, R8, C8, bd, nref, which, y0, x0, qctx, rdoq, has_comp,
     tx_ntypes, size_cfgs) = cfg
    AW, AH = C8 * 8, R8 * 8
    base = 1 << (bd - 1)
    src_y = src_y8.astype(jnp.int32)
    src_u = src_u8.astype(jnp.int32)
    src_v = src_v8.astype(jnp.int32)

    # unpack the schedule at static offsets (offsets have W+2 entries so the
    # sentinel wave W reads cnt = 0)
    sched = {}
    pos = 0
    for n, NI_pad, NW_pad, kmax in size_cfgs:
        N_pad = NI_pad + NW_pad
        s = {}
        s["coords"] = sched_flat[pos : pos + N_pad * 3].reshape(N_pad, 3); pos += N_pad * 3
        s["mode"] = sched_flat[pos : pos + N_pad]; pos += N_pad
        s["tx"] = sched_flat[pos : pos + N_pad]; pos += N_pad
        s["uv_tx"] = sched_flat[pos : pos + N_pad]; pos += N_pad
        s["ref"] = sched_flat[pos : pos + N_pad]; pos += N_pad
        s["mv"] = sched_flat[pos : pos + N_pad * 2].reshape(N_pad, 2); pos += N_pad * 2
        s["ref2"] = sched_flat[pos : pos + N_pad]; pos += N_pad
        s["mv2"] = sched_flat[pos : pos + N_pad * 2].reshape(N_pad, 2); pos += N_pad * 2
        s["offsets"] = sched_flat[pos : pos + W + 2]; pos += W + 2
        sched[n] = s
    wave_list = sched_flat[pos : pos + W_eff]; pos += W_eff

    # precomputed inter predictions per size over the INTER segment only
    # (batched normative MC; F == 1 for inter frames — refs are frame-specific)
    inter_pred = {}
    if nref:
        from ..ops import me_jax

        refs_y = refs_y8.astype(jnp.int32)
        refs_u = refs_u8.astype(jnp.int32)
        refs_v = refs_v8.astype(jnp.int32)
        for n, NI_pad, NW_pad, kmax in size_cfgs:
            if not NI_pad:
                continue
            s = sched[n]
            nc = n // 2
            ridx = jnp.maximum(s["ref"][:NI_pad], 0)
            ys = y0 + jnp.minimum(s["coords"][:NI_pad, 1], R8) * 8
            xs = x0 + jnp.minimum(s["coords"][:NI_pad, 2], C8) * 8
            mvy, mvx = s["mv"][:NI_pad, 0], s["mv"][:NI_pad, 1]
            preds = [
                me_jax.mc_lanes(refs_y, ys, xs, mvy * 2, mvx * 2, n, n, which, bd,
                                ref_idx=ridx),
                me_jax.mc_lanes(refs_u, ys // 2, xs // 2, mvy, mvx, nc, nc, which,
                                bd, ref_idx=ridx),
                me_jax.mc_lanes(refs_v, ys // 2, xs // 2, mvy, mvx, nc, nc, which,
                                bd, ref_idx=ridx),
            ]
            if has_comp:
                # compound lanes: exact CONV_BUF average of the ref pair
                ridx2 = jnp.maximum(s["ref2"][:NI_pad], 0)
                is_cmp = (s["ref2"][:NI_pad] >= 0)[:, None, None]
                m2y, m2x = s["mv2"][:NI_pad, 0], s["mv2"][:NI_pad, 1]
                cy = me_jax.mc_lanes_compound(refs_y, ys, xs, mvy * 2, mvx * 2,
                                              m2y * 2, m2x * 2, n, n, which, bd,
                                              ridx, ridx2)
                cu = me_jax.mc_lanes_compound(refs_u, ys // 2, xs // 2, mvy, mvx,
                                              m2y, m2x, nc, nc, which, bd,
                                              ridx, ridx2)
                cv = me_jax.mc_lanes_compound(refs_v, ys // 2, xs // 2, mvy, mvx,
                                              m2y, m2x, nc, nc, which, bd,
                                              ridx, ridx2)
                preds = [jnp.where(is_cmp, cy, preds[0]),
                         jnp.where(is_cmp, cu, preds[1]),
                         jnp.where(is_cmp, cv, preds[2])]
            inter_pred[n] = tuple(preds)

    dq_dc, dq_ac = dqv[0], dqv[1]

    def _quant_rdoq(coeff, ls, rdoq_fn):
        """Dead-zone quant + (optionally) batched RDOQ on the adjusted-size
        coefficient region (64-pt txs code only the top-left 32x32)."""
        lv = jnp.clip(TJ.quantize_j(coeff, dq_dc, dq_ac, ls), -32767, 32767)
        if rdoq_fn is None:
            return lv
        m = lv.shape[-1]
        if m > 32:
            sub = rdoq_fn(lv[..., :32, :32], coeff[..., :32, :32],
                          dq_dc, dq_ac, lam)
            return jnp.zeros_like(lv).at[..., :32, :32].set(sub)
        return rdoq_fn(lv, coeff, dq_dc, dq_ac, lam)

    def select_txfm(resid, pred, tx_idx, n, ntypes, rdoq_fn=None):
        """Per-lane 2-D tx among TX_SEARCH via composed DCT/ADST selection
        (2 one-D passes per direction instead of one 2-D network per type)."""
        ls = quant_ops.tx_scale(n, n)
        if ntypes == 1:
            coeff = TJ.fwd_txfm2d_j(resid, int(TxType.DCT_DCT), bd)
            lv = _quant_rdoq(coeff, ls, rdoq_fn)
            dqc = TJ.dequantize_j(lv, dq_dc, dq_ac, ls, bd)
            return lv, TJ.inv_txfm2d_add_j(dqc, pred, int(TxType.DCT_DCT), bd)
        # TX_SEARCH order: DCT_DCT, ADST_ADST, ADST_DCT, DCT_ADST
        v_adst = (tx_idx == 1) | (tx_idx == 2)
        h_adst = (tx_idx == 1) | (tx_idx == 3)
        coeff = TJ.fwd_txfm2d_sel_j(resid, v_adst, h_adst, bd)
        lv = _quant_rdoq(coeff, ls, rdoq_fn)
        dqc = TJ.dequantize_j(lv, dq_dc, dq_ac, ls, bd)
        return lv, TJ.inv_txfm2d_add_sel_j(dqc, pred, v_adst, h_adst, bd)

    # initial state: frontier maps + per-size outputs
    state = dict(
        by=jnp.zeros((F, R8, AW), jnp.int32), ry=jnp.zeros((F, C8, AH), jnp.int32),
        bu=jnp.zeros((F, R8, AW // 2), jnp.int32), ru=jnp.zeros((F, C8, AH // 2), jnp.int32),
        bv=jnp.zeros((F, R8, AW // 2), jnp.int32), rv=jnp.zeros((F, C8, AH // 2), jnp.int32),
        # per-cell bottom-right corner maps: the topleft neighbor pixel's
        # covering block may extend BELOW row y-1 (upper-left diagonal), so
        # bottom_rows can miss it; corners[r8, c8] always holds
        # recon[(r8+1)*8-1, (c8+1)*8-1] once the covering block completes
        cy=jnp.zeros((F, R8, C8), jnp.int32),
        cu=jnp.zeros((F, R8, C8), jnp.int32),
        cv=jnp.zeros((F, R8, C8), jnp.int32),
    )
    for n, NI_pad, NW_pad, kmax in size_cfgs:
        N_pad = NI_pad + NW_pad
        adj, nc = min(n, 32), n // 2
        state[f"ly{n}"] = jnp.zeros((N_pad, adj, adj), jnp.int32)
        state[f"lu{n}"] = jnp.zeros((N_pad, nc, nc), jnp.int32)
        state[f"lv{n}"] = jnp.zeros((N_pad, nc, nc), jnp.int32)
        state[f"ry{n}"] = jnp.zeros((N_pad, n, n), jnp.int32)
        state[f"ru{n}"] = jnp.zeros((N_pad, nc, nc), jnp.int32)
        state[f"rv{n}"] = jnp.zeros((N_pad, nc, nc), jnp.int32)

    def frontier_write(st, fidx, r8, c8, x, y, n, rec_y, rec_u, rec_v):
        """Masked frontier + corner updates for one lane batch (pad lanes
        carry sentinel coords -> every scatter drops them)."""
        n8, nc = n // 8, n // 2
        xc, yc = c8 * 4, r8 * 4
        rb = r8 + n8 - 1
        cb = c8 + n8 - 1
        fi = fidx[:, None]
        st["by"] = st["by"].at[fi, rb[:, None], x[:, None] + jnp.arange(n)[None, :]] \
            .set(rec_y[:, -1, :], mode="drop")
        st["ry"] = st["ry"].at[fi, cb[:, None], y[:, None] + jnp.arange(n)[None, :]] \
            .set(rec_y[:, :, -1], mode="drop")
        st["bu"] = st["bu"].at[fi, rb[:, None], xc[:, None] + jnp.arange(nc)[None, :]] \
            .set(rec_u[:, -1, :], mode="drop")
        st["ru"] = st["ru"].at[fi, cb[:, None], yc[:, None] + jnp.arange(nc)[None, :]] \
            .set(rec_u[:, :, -1], mode="drop")
        st["bv"] = st["bv"].at[fi, rb[:, None], xc[:, None] + jnp.arange(nc)[None, :]] \
            .set(rec_v[:, -1, :], mode="drop")
        st["rv"] = st["rv"].at[fi, cb[:, None], yc[:, None] + jnp.arange(nc)[None, :]] \
            .set(rec_v[:, :, -1], mode="drop")
        # corner maps: this block's per-cell bottom-right pixels
        rr8 = r8[:, None, None] + jnp.arange(n8)[None, :, None]
        cc8 = c8[:, None, None] + jnp.arange(n8)[None, None, :]
        fi3 = fidx[:, None, None]
        st["cy"] = st["cy"].at[fi3, rr8, cc8].set(rec_y[:, 7::8, 7::8], mode="drop")
        st["cu"] = st["cu"].at[fi3, rr8, cc8].set(rec_u[:, 3::4, 3::4], mode="drop")
        st["cv"] = st["cv"].at[fi3, rr8, cc8].set(rec_v[:, 3::4, 3::4], mode="drop")
        return st

    def src_blocks_of(plane, fidx, xx, yy, m):
        return plane[fidx[:, None, None],
                     yy[:, None, None] + jnp.arange(m)[None, :, None],
                     xx[:, None, None] + jnp.arange(m)[None, None, :]]

    def inter_step_size(st, n, NI_pad):
        """Phase A: commit this size's inter lanes in one batched step."""
        s = sched[n]
        nc = n // 2
        rc = s["coords"][:NI_pad]
        fidx, r8, c8 = rc[:, 0], rc[:, 1], rc[:, 2]
        tx_idx = s["tx"][:NI_pad]
        uv_tx_idx = s["uv_tx"][:NI_pad]
        x, y = jnp.minimum(c8, C8) * 8, jnp.minimum(r8, R8) * 8
        pred, pred_u, pred_v = inter_pred[n]
        sb = src_blocks_of(src_y, fidx, x, y, n)
        rq_y, rq_uv = _rdoq_fns(qctx, n) if rdoq else (None, None)
        lv_y, rec_y = select_txfm(sb - pred, pred, tx_idx, n,
                                  tx_ntypes if n <= 16 else 1, rdoq_fn=rq_y)
        # inter chroma tx follows the EFFECTIVE luma type: DCT when the
        # quantized luma is all-zero (tile_codec._chroma_tx_type)
        luma_zero = jnp.sum(jnp.abs(lv_y), axis=(-2, -1)) == 0
        uv_tx_idx = jnp.where(luma_zero, 0, uv_tx_idx)
        xc, yc = x // 2, y // 2
        suv = jnp.concatenate([src_blocks_of(src_u, fidx, xc, yc, nc),
                               src_blocks_of(src_v, fidx, xc, yc, nc)])
        puv = jnp.concatenate([pred_u, pred_v])
        lv_uv, rec_uv = select_txfm(suv - puv, puv,
                                    jnp.concatenate([uv_tx_idx, uv_tx_idx]),
                                    nc, 4 if nc <= 16 else 1, rdoq_fn=rq_uv)
        lv_u, lv_v = lv_uv[:NI_pad], lv_uv[NI_pad:]
        rec_u, rec_v = rec_uv[:NI_pad], rec_uv[NI_pad:]
        adj = min(n, 32)
        st[f"ly{n}"] = st[f"ly{n}"].at[:NI_pad].set(lv_y[:, :adj, :adj])
        st[f"lu{n}"] = st[f"lu{n}"].at[:NI_pad].set(lv_u)
        st[f"lv{n}"] = st[f"lv{n}"].at[:NI_pad].set(lv_v)
        st[f"ry{n}"] = st[f"ry{n}"].at[:NI_pad].set(rec_y)
        st[f"ru{n}"] = st[f"ru{n}"].at[:NI_pad].set(rec_u)
        st[f"rv{n}"] = st[f"rv{n}"].at[:NI_pad].set(rec_v)
        return frontier_write(st, fidx, r8, c8, x, y, n, rec_y, rec_u, rec_v)

    def wave_step_size(w, st, n, N_pad, kmax):
        s = sched[n]
        n8 = n // 8
        nc = n // 2
        off = s["offsets"][w]
        cnt = s["offsets"][w + 1] - off
        lane = jnp.arange(kmax)
        valid = lane < cnt

        def dsl(arr):
            return jax.lax.dynamic_slice(arr, (off,) + (0,) * (arr.ndim - 1),
                                         (kmax,) + arr.shape[1:])

        rc = dsl(s["coords"])
        fidx, r8, c8 = rc[:, 0], rc[:, 1], rc[:, 2]
        mode = dsl(s["mode"])
        tx_idx = dsl(s["tx"])
        uv_tx_idx = dsl(s["uv_tx"])
        x, y = jnp.minimum(c8, C8) * 8, jnp.minimum(r8, R8) * 8
        ha, hl = r8 > 0, c8 > 0

        def edges_from(bmap, rmap, cmap, xx, yy, m):
            ar = bmap[fidx[:, None], jnp.maximum(r8 - 1, 0)[:, None],
                      xx[:, None] + jnp.arange(m)[None, :]]
            lc = rmap[fidx[:, None], jnp.maximum(c8 - 1, 0)[:, None],
                      yy[:, None] + jnp.arange(m)[None, :]]
            tl = cmap[fidx, jnp.maximum(r8 - 1, 0), jnp.maximum(c8 - 1, 0)]
            left_fill = jnp.where(ha, ar[:, 0], base + 1)
            above_fill = jnp.where(hl, lc[:, 0], base - 1)
            ar = jnp.where(ha[:, None], ar, above_fill[:, None])
            lc = jnp.where(hl[:, None], lc, left_fill[:, None])
            tl = jnp.where(ha & hl, tl,
                           jnp.where(ha, ar[:, 0], jnp.where(hl, lc[:, 0], base)))
            return ar, lc, tl

        def src_blocks(plane, xx, yy, m):
            return plane[fidx[:, None, None],
                         yy[:, None, None] + jnp.arange(m)[None, :, None],
                         xx[:, None, None] + jnp.arange(m)[None, None, :]]

        bi = jnp.arange(kmax)
        # luma (wavefront lanes are intra-only: inter lanes committed in
        # phase A feed the frontier maps these reads see)
        ar, lc, tl = edges_from(st["by"], st["ry"], st["cy"], x, y, n)
        pred = _predict_modes(ar, lc, tl, ha, hl, n)[bi, mode]
        sb = src_blocks(src_y, x, y, n)
        rq_y, rq_uv = _rdoq_fns(qctx, n) if rdoq else (None, None)
        lv_y, rec_y = select_txfm(sb - pred, pred, tx_idx, n,
                                  tx_ntypes if n <= 16 else 1, rdoq_fn=rq_y)
        # chroma (uv_mode = y mode; tx type derived per mode) — u and v are
        # stacked into one 2K-lane batch so every op runs once
        xc, yc = x // 2, y // 2
        aru, lcu, tlu = edges_from(st["bu"], st["ru"], st["cu"], xc, yc, nc)
        arv, lcv, tlv = edges_from(st["bv"], st["rv"], st["cv"], xc, yc, nc)
        ac = jnp.concatenate([aru, arv])
        lcc = jnp.concatenate([lcu, lcv])
        tlc = jnp.concatenate([tlu, tlv])
        ha2, hl2 = jnp.concatenate([ha, ha]), jnp.concatenate([hl, hl])
        mode2 = jnp.concatenate([mode, mode])
        puv = _predict_modes(ac, lcc, tlc, ha2, hl2, nc)[jnp.arange(2 * kmax), mode2]
        suv = jnp.concatenate([src_blocks(src_u, xc, yc, nc),
                               src_blocks(src_v, xc, yc, nc)])
        lv_uv, rec_uv = select_txfm(suv - puv, puv, jnp.concatenate([uv_tx_idx, uv_tx_idx]),
                                    nc, 4 if nc <= 16 else 1, rdoq_fn=rq_uv)
        lv_u, lv_v = lv_uv[:kmax], lv_uv[kmax:]
        rec_u, rec_v = rec_uv[:kmax], rec_uv[kmax:]

        # write outputs (contiguous slabs; masked-lane garbage is overwritten
        # by later waves / lives in the padded tail)
        def put(name, val):
            st[name] = jax.lax.dynamic_update_slice(
                st[name], val, (off,) + (0,) * (val.ndim - 1))

        put(f"ly{n}", lv_y[:, : min(n, 32), : min(n, 32)])
        put(f"lu{n}", lv_u)
        put(f"lv{n}", lv_v)
        put(f"ry{n}", rec_y)
        put(f"ru{n}", rec_u)
        put(f"rv{n}", rec_v)

        # frontier updates (masked scatters; OOB rows dropped)
        oob = jnp.int32(1 << 20)
        rb = jnp.where(valid, r8 + n8 - 1, oob)
        cb = jnp.where(valid, c8 + n8 - 1, oob)
        fi = fidx[:, None]
        st["by"] = st["by"].at[fi, rb[:, None], x[:, None] + jnp.arange(n)[None, :]] \
            .set(rec_y[:, -1, :], mode="drop")
        st["ry"] = st["ry"].at[fi, cb[:, None], y[:, None] + jnp.arange(n)[None, :]] \
            .set(rec_y[:, :, -1], mode="drop")
        st["bu"] = st["bu"].at[fi, rb[:, None], xc[:, None] + jnp.arange(nc)[None, :]] \
            .set(rec_u[:, -1, :], mode="drop")
        st["ru"] = st["ru"].at[fi, cb[:, None], yc[:, None] + jnp.arange(nc)[None, :]] \
            .set(rec_u[:, :, -1], mode="drop")
        st["bv"] = st["bv"].at[fi, rb[:, None], xc[:, None] + jnp.arange(nc)[None, :]] \
            .set(rec_v[:, -1, :], mode="drop")
        st["rv"] = st["rv"].at[fi, cb[:, None], yc[:, None] + jnp.arange(nc)[None, :]] \
            .set(rec_v[:, :, -1], mode="drop")
        # corner maps: this block's per-cell bottom-right pixels
        rr8 = jnp.where(valid, r8, oob)[:, None, None] + jnp.arange(n8)[None, :, None]
        cc8 = c8[:, None, None] + jnp.arange(n8)[None, None, :]
        fi3 = fidx[:, None, None]
        st["cy"] = st["cy"].at[fi3, rr8, cc8].set(rec_y[:, 7::8, 7::8], mode="drop")
        st["cu"] = st["cu"].at[fi3, rr8, cc8].set(rec_u[:, 3::4, 3::4], mode="drop")
        st["cv"] = st["cv"].at[fi3, rr8, cc8].set(rec_v[:, 3::4, 3::4], mode="drop")
        return st

    # phase A: all inter lanes, one batched step per size
    st = state
    for n, NI_pad, NW_pad, kmax in size_cfgs:
        if NI_pad:
            st = inter_step_size(st, n, NI_pad)

    # phase B: wavefront over the waves that contain intra work
    if any(NW_pad for _n, _ni, NW_pad, _k in size_cfgs):
        def body(i, st):
            w = wave_list[i]
            for n, NI_pad, NW_pad, kmax in size_cfgs:
                if NW_pad:
                    st = wave_step_size(w, st, n, NI_pad + NW_pad, kmax)
            return st

        st = jax.lax.fori_loop(0, W_eff, body, st)

    # assemble recon planes on device (one scatter per size/plane; sentinel
    # pad-lane coords drop) and pack every output into two transfer buffers
    ry = jnp.zeros((F, AH, AW), jnp.int32)
    ru = jnp.zeros((F, AH // 2, AW // 2), jnp.int32)
    rv = jnp.zeros((F, AH // 2, AW // 2), jnp.int32)
    levels_parts = []
    for n, NI_pad, NW_pad, kmax in size_cfgs:
        nc = n // 2
        coords = sched[n]["coords"]
        fi, r8, c8 = coords[:, 0, None, None], coords[:, 1], coords[:, 2]
        yy = (r8 * 8)[:, None, None] + jnp.arange(n)[None, :, None]
        xx = (c8 * 8)[:, None, None] + jnp.arange(n)[None, None, :]
        ry = ry.at[fi, yy, xx].set(st[f"ry{n}"], mode="drop")
        yyc = (r8 * 4)[:, None, None] + jnp.arange(nc)[None, :, None]
        xxc = (c8 * 4)[:, None, None] + jnp.arange(nc)[None, None, :]
        ru = ru.at[fi, yyc, xxc].set(st[f"ru{n}"], mode="drop")
        rv = rv.at[fi, yyc, xxc].set(st[f"rv{n}"], mode="drop")
        levels_parts += [st[f"ly{n}"].astype(jnp.int16).ravel(),
                         st[f"lu{n}"].astype(jnp.int16).ravel(),
                         st[f"lv{n}"].astype(jnp.int16).ravel()]
    levels_packed = jnp.concatenate(levels_parts) if levels_parts else jnp.zeros(0, jnp.int16)

    # per-8px-cell skip map (all planes' levels zero) for CDEF unit selection
    skip8 = jnp.zeros((F, R8, C8), bool)
    for n, NI_pad, NW_pad, kmax in size_cfgs:
        n8 = n // 8
        N_pad = NI_pad + NW_pad
        coords = sched[n]["coords"]
        blk_skip = ((jnp.sum(jnp.abs(st[f"ly{n}"]), axis=(1, 2))
                     + jnp.sum(jnp.abs(st[f"lu{n}"]), axis=(1, 2))
                     + jnp.sum(jnp.abs(st[f"lv{n}"]), axis=(1, 2))) == 0)
        fi = coords[:, 0, None, None]
        rr = coords[:, 1, None, None] + jnp.arange(n8)[None, :, None]
        cc = coords[:, 2, None, None] + jnp.arange(n8)[None, None, :]
        skip8 = skip8.at[fi, rr, cc].set(
            jnp.broadcast_to(blk_skip[:, None, None], (N_pad, n8, n8)), mode="drop")
    return levels_packed, ry, ru, rv, skip8


def commit_regions(src_dev, params: FrameParams, leaves, dec, plans: list, region,
                   refs_dev=None, ref_ids=None, which: int = 0, array_out: bool = False,
                   fetch_levels: bool = True, ref_origin=None):
    """Commit the decided leaves of one region: fills plans in place and
    returns the region's DEVICE recon planes + skip map (ry, ru, rv, skip8).

    `src_dev` are put_frames() (F, H, W) device planes; `leaves`/`dec`/
    `plans` are per-frame lists. For inter frames pass `refs_dev` =
    (refs_y, refs_u, refs_v) stacked (NREF, ...) device planes and
    `ref_ids` mapping stack index -> RefFrame id. One packed h2d (schedule)
    + one d2h transfer (levels int16) for the WHOLE batch; recon stays on
    device for the filter stage."""
    from ..constants.av1 import InterMode
    from ..utils import profiler

    p = params
    x0, y0, rw, rh = region
    F = src_dev[0].shape[0]
    with profiler.stage("commit/schedule"):
        sched_np, W = _build_schedule(leaves, dec, region)
    R8, C8 = rh // 8, rw // 8

    size_cfgs = []
    flat_parts = []
    wave_used = np.zeros(W, bool)
    nref_frame = refs_dev is not None
    for n, s in sched_np.items():
        NI, NW = s["NI"], s["NW"]
        # geometry-static paddings (compile once per geometry): inter
        # frames budget the full grid for the batched inter phase and 1/8
        # of it for the intra wavefront; content only escalates the bucket
        # (rare recompile) — never shrinks it (VERDICT r3: per-frame
        # leaf-count drift recompiled the commit program every frame)
        Rn, Cn = rh // n, rw // n
        grid = max(Rn * Cn * F, 1)
        diag = max(min(Rn, Cn) * F, 1)
        if nref_frame:
            kfloor, wfloor = max(diag // 8, 8), max(grid // 8, 64)
        else:
            kfloor, wfloor = diag, grid
        kmax = _next_pow2(max(s["kmax"], kfloor))
        # inter phase A: exact pow2 bucket with a grid/8 floor — sizes with
        # few chosen leaves pin at the floor (no recompiles), only the
        # frame's dominant size steps between pow2 buckets; compute follows
        # the true lane count instead of a fixed half-grid
        ifloor = max(_next_pow2(grid) // 8, 64)
        NI_pad = max(_next_pow2(max(NI, 1)), ifloor) if nref_frame else 0
        NW_pad = _next_pow2(max(NW, wfloor)) + kmax
        N_pad = NI_pad + NW_pad
        size_cfgs.append((n, NI_pad, NW_pad, kmax))

        def pad_seg(a, fill=0):
            """[inter NI | pad→NI_pad | intra NW | pad→N_pad] layout."""
            outv = np.full((N_pad,) + a.shape[1:], fill, a.dtype)
            outv[:NI] = a[:NI]
            outv[NI_pad : NI_pad + NW] = a[NI:]
            return outv

        s["coords"] = pad_seg(s["coords"], fill=_SENTINEL)
        s["mode"] = pad_seg(s["mode"])
        s["tx"] = pad_seg(s["tx"])
        s["uv_tx"] = pad_seg(s["uv_tx"])
        s["ref"] = pad_seg(s["ref"], fill=-1)
        s["mv"] = pad_seg(s["mv"])
        s["ref2"] = pad_seg(s["ref2"], fill=-1)
        s["mv2"] = pad_seg(s["mv2"])
        s["NI_pad"], s["NW_pad"] = NI_pad, NW_pad
        offs = NI_pad + np.concatenate([s["offsets"], s["offsets"][-1:]])
        wave_used |= np.diff(s["offsets"]) > 0
        flat_parts += [s["coords"].ravel(), s["mode"], s["tx"], s["uv_tx"],
                       s["ref"], s["mv"].ravel(), s["ref2"], s["mv2"].ravel(),
                       offs.astype(np.int32)]
    waves = np.nonzero(wave_used)[0].astype(np.int32)
    # intra frames touch nearly every wave -> fix W_eff = W (static); inter
    # frames compact to a pow2 bucket with a floor of 32
    wefloor = 32 if nref_frame else W
    W_eff = min(_next_pow2(max(len(waves), wefloor)), W)
    wave_list = np.full(W_eff, W, np.int32)  # pad with the empty sentinel wave
    wave_list[: min(len(waves), W_eff)] = waves[:W_eff]
    if len(waves) > W_eff:  # only possible when W_eff == W: identity schedule
        wave_list = np.arange(W, dtype=np.int32)
        W_eff = W
    flat_parts.append(wave_list)
    sched_flat = jnp.asarray(np.concatenate([f.astype(np.int32) for f in flat_parts]))
    nref = 0 if refs_dev is None else int(refs_dev[0].shape[0])
    from ..constants.cdf import get_q_ctx as _gqc

    # ref_origin: plane coords of the region origin INSIDE refs_dev (tile
    # sharding passes halo-cropped per-tile refs; defaults to the region
    # origin for full-frame refs)
    ry0, rx0 = (y0, x0) if ref_origin is None else ref_origin
    cfg = (F, W, W_eff, R8, C8, p.bd, nref, which, ry0, rx0, _gqc(p.qindex),
           bool(p.enable_rdoq), bool(p.reference_select), int(p.sf_tx_ntypes),
           tuple(size_cfgs))
    sy = src_dev[0][:, y0 : y0 + rh, x0 : x0 + rw]
    su = src_dev[1][:, y0 // 2 : (y0 + rh) // 2, x0 // 2 : (x0 + rw) // 2]
    sv = src_dev[2][:, y0 // 2 : (y0 + rh) // 2, x0 // 2 : (x0 + rw) // 2]
    if refs_dev is None:
        dummy = jnp.zeros((1, 8, 8), jnp.uint8 if p.bd == 8 else jnp.int16)
        refs_dev = (dummy, dummy, dummy)
    from .device_decide import qparams_np

    dqv, lam = qparams_np(p.qindex, p.bd)
    with profiler.stage("commit/device"):
        levels_packed, ry, ru, rv, skip8 = _commit_device(
            sy, su, sv, refs_dev[0], refs_dev[1], refs_dev[2], sched_flat, dqv,
            lam, cfg)
        if fetch_levels or not array_out:
            levels_packed = np.asarray(levels_packed)

    if array_out:
        # vectorized path: the op stream is built later by
        # codec/array_plan.build_tile_ops from the aux dict. With
        # fetch_levels=False the d2h stays a device future (`levels_dev`)
        # so the pipelined caller can overlap the fetch with the next
        # frame's device work (finish_levels completes it).
        aux = dict(sched=sched_np, ref_ids=ref_ids)
        if fetch_levels:
            aux["levels_raw"] = levels_packed
            finish_levels(aux)
        else:
            aux["levels_dev"] = levels_packed
        return ry, ru, rv, skip8, aux
    _t_unpack = time.perf_counter()
    off = 0
    for n, s in sched_np.items():
        N = len(s["coords"])
        adj, nc = min(n, 32), n // 2
        ly = levels_packed[off : off + N * adj * adj].reshape(N, adj, adj).astype(np.int32)
        off += N * adj * adj
        lu = levels_packed[off : off + N * nc * nc].reshape(N, nc, nc).astype(np.int32)
        off += N * nc * nc
        lvv = levels_packed[off : off + N * nc * nc].reshape(N, nc, nc).astype(np.int32)
        off += N * nc * nc
        fs, r8, c8 = s["coords"][:, 0], s["coords"][:, 1], s["coords"][:, 2]
        skip = ((np.abs(ly).sum((1, 2)) + np.abs(lu).sum((1, 2)) + np.abs(lvv).sum((1, 2))) == 0)
        for i in range(N):
            if fs[i] >= F:
                continue  # sentinel pad lane
            mi_row = (y0 // 8 + int(r8[i])) * 2
            mi_col = (x0 // 8 + int(c8[i])) * 2
            sk = bool(skip[i])
            ri = int(s["ref"][i])
            if ri >= 0:
                mv = (int(s["mv"][i, 0]), int(s["mv"][i, 1]))
                ri2 = int(s["ref2"][i]) if p.reference_select else -1
                if ri2 >= 0:
                    mode = int(InterMode.NEW_NEWMV)
                    rf1 = int(ref_ids[ri2])
                    mv1 = (int(s["mv2"][i, 0]), int(s["mv2"][i, 1]))
                else:
                    gmv = tuple(p.gm_mvs[int(ref_ids[ri])])
                    mode = int(InterMode.GLOBALMV) if mv == gmv else int(InterMode.NEWMV)
                    rf1, mv1 = int(RefFrame.NONE), (0, 0)
                d = BlockDecision(
                    y_mode=mode, ref_frame=int(ref_ids[ri]), ref_frame1=rf1,
                    mv=mv, mv1=mv1, ref_mv_idx=0,
                    skip=int(sk), tx_type=TX_SEARCH[int(s["tx"][i])],
                    levels_y=None if sk else ly[i], levels_u=None if sk else lu[i],
                    levels_v=None if sk else lvv[i])
            else:
                m = MODES[int(s["mode"][i])]
                d = BlockDecision(
                    y_mode=m, uv_mode=m, skip=int(sk),
                    tx_type=TX_SEARCH[int(s["tx"][i])],
                    levels_y=None if sk else ly[i], levels_u=None if sk else lu[i],
                    levels_v=None if sk else lvv[i])
            plans[int(fs[i])].blocks[(mi_row, mi_col, BSIZE_BY_N[n])] = d
    profiler.add("commit/unpack_plan", time.perf_counter() - _t_unpack)
    return ry, ru, rv, skip8


@functools.partial(jax.jit, static_argnames=("levels", "sharpness", "bd", "damping",
                                             "enable_cdef", "flen_shapes", "disp_dims",
                                             "cdef_cands", "lf_search"))
def _filter_device(ry, ru, rv, src_y8, skip8, flen_flat,
                   levels, sharpness, bd, damping, enable_cdef, flen_shapes,
                   disp_dims=None, cdef_cands=0, lf_search=()):
    """In-loop filters on device: DLF then CDEF search+apply.
    flen_flat packs the six DLF filter-length maps (shapes static); `damping`
    is the CDEF damping (the only qindex-derived static — 4 values).
    disp_dims=(width, height): overwrite mi-alignment padding with replicated
    display-edge pixels (spec 7.11.3.4 MC clamp; encoder.replicate_display_edges
    twin) so the output can enter a device-resident DPB directly.
    lf_search: candidate luma filter LEVELS (static ints, ascending) — the
    frame-level filter search (svt_av1_pick_filter_level analog,
    deblocking_filter.c:1036): every candidate is applied and the one with
    the least luma SSE vs the source wins (ties -> smaller level). Empty =
    no search, apply levels[0]/levels[1] as-is.
    Returns (packed recon, stats (F, 5) = [cdef y_pri, y_sec, uv_pri,
    uv_sec, lf_pick] with lf_pick the chosen lf_search index (-1 if
    unsearched), [y, u, v] planes)."""
    from ..filters import cdef_jax, dlf_jax

    F = ry.shape[0]
    planes = [ry, ru, rv]
    lf_pick = jnp.full((F,), -1, jnp.int32)
    if any(levels) or lf_search:
        flens = []
        pos = 0
        for shp in flen_shapes:
            sz = int(np.prod(shp))
            flens.append(flen_flat[pos : pos + sz].reshape(shp))
            pos += sz

        def dlf_plane(pl, fi, lvl_v, lvl_h):
            if lvl_v:
                lim, blim, thr = dlf_jax._limits(lvl_v, sharpness)
                pl = dlf_jax.filter_vertical_edges_j(pl, flens[fi], lim, blim, thr, bd)
            if lvl_h:
                lim, blim, thr = dlf_jax._limits(lvl_h, sharpness)
                plT = jnp.swapaxes(pl, 1, 2)
                plT = dlf_jax.filter_vertical_edges_j(plT, flens[fi + 1], lim, blim, thr, bd)
                pl = jnp.swapaxes(plT, 1, 2)
            return pl

        if lf_search:
            src_y = src_y8.astype(jnp.int32)
            cands = [dlf_plane(planes[0], 0, lvl, lvl) for lvl in lf_search]
            sses = jnp.stack(
                [jnp.sum((c - src_y).astype(jnp.float32) ** 2, axis=(1, 2))
                 for c in cands])  # (K, F)
            lf_pick = jnp.argmin(sses, axis=0).astype(jnp.int32)
            y_out = cands[0]
            for k in range(1, len(lf_search)):
                y_out = jnp.where((lf_pick == k)[:, None, None], cands[k], y_out)
        else:
            y_out = dlf_plane(planes[0], 0, levels[0], levels[1])
        planes = [y_out,
                  dlf_plane(planes[1], 2, levels[2], levels[2]),
                  dlf_plane(planes[2], 4, levels[3], levels[3])]
    if enable_cdef:
        planes, strengths, _damping = cdef_jax.cdef_frames_j(
            planes, src_y8.astype(jnp.int32), ~skip8, damping=damping, bd=bd,
            n_cand=cdef_cands)
    else:
        strengths = jnp.zeros((F, 4), jnp.int32)
    if disp_dims is not None:
        w, h = disp_dims
        out = []
        for pi, pl in enumerate(planes):
            pw, ph = (w, h) if pi == 0 else (w >> 1, h >> 1)
            if pw < pl.shape[2]:
                pl = pl.at[:, :, pw:].set(pl[:, :, pw - 1 : pw])
            if ph < pl.shape[1]:
                pl = pl.at[:, ph:, :].set(pl[:, ph - 1 : ph, :])
            out.append(pl)
        planes = out
    odt = jnp.uint8 if bd == 8 else jnp.int16
    planes = [pl.astype(odt) for pl in planes]
    packed = jnp.concatenate([planes[0].ravel(), planes[1].ravel(),
                              planes[2].ravel()])
    return packed, jnp.concatenate([strengths, lf_pick[:, None]], axis=1), planes


def _lf_candidates(base: int) -> tuple:
    """Frame-level DLF luma candidate ladder around the by-q guess
    (svt_av1_pick_filter_level search neighborhood at honest scale)."""
    if base <= 0:
        return ()
    return tuple(sorted({0, base // 2, base, min(63, base + max(base // 2, 2))}))


def _size_maps(leaves, F: int, R8: int, C8: int) -> np.ndarray:
    """(F, R8, C8) luma block size per 8px cell from the leaf lists."""
    sm = np.zeros((F, R8, C8), np.int32)
    for f, lv in enumerate(leaves):
        for (mi_row, mi_col, n) in lv:
            r8, c8, n8 = mi_row // 2, mi_col // 2, n // 8
            sm[f, r8 : r8 + n8, c8 : c8 + n8] = n
    return sm


def encode_intra_frames(src_frames: list, params: FrameParams,
                        apply_filters: bool = False, enable_dlf: bool = True,
                        enable_cdef: bool = True, sharpness: int = 0,
                        use_arrays: bool | None = None,
                        walk_fcs: list | None = None):
    """Unified device intra encoder over a BATCH of independent frames:
    batched open-loop decide at all sizes, host partition DP per frame,
    shared wavefront commit — per tile (tiles are prediction boundaries,
    so each region runs independently). Batching amortizes the wavefront's
    serial latency and every host<->device transfer across F frames.

    Returns [(plan, recon, filt, payloads), ...] per frame: filt =
    dict(lf_levels, cdef=(y_pri, y_sec, uv_pri, uv_sec, damping)) when
    apply_filters else None (host applies filters); payloads = per-tile
    entropy payload bytes built by the vectorized array-plan path (None when
    the native walker is unavailable — the caller then walks the Plan).

    src_frames: list of [y, u, v] plane lists."""
    from ..constants.cdf import FrameContext
    from ..filters import cdef as cdef_mod
    from ..filters import dlf as dlf_mod
    from ..filters import dlf_jax
    from . import device_decide
    from .intra_md import rd_lambda

    from ..codec import array_plan
    from ..codec.tile_walk_native import run_tile_ops
    from ..entropy import native
    from .device_decide import MODES as DEC_MODES

    p = params
    F = len(src_frames)
    fc = FrameContext(p.qindex)
    lam = float(rd_lambda(p.qindex, p.bd))
    aw, ah = p.aligned_width, p.aligned_height
    src_dev = device_decide.put_frames(src_frames, p.bd)
    if use_arrays is None:
        use_arrays = native.available() and not p.enable_filter_intra
    plans = [Plan() for _ in range(F)]
    payloads = [[] for _ in range(F)] if use_arrays else None
    # per-frame walk contexts: tile 0 adapts the caller's objects in place
    # (their end state is the stored frame context); later tiles restart
    # from the frame-initial state per spec
    if walk_fcs is None:
        walk_fcs = [FrameContext(p.qindex) for _ in range(F)]
    ntiles = len(p.tiles())
    fc_inits = [w.clone() for w in walk_fcs] if ntiles > 1 else None
    regions = []
    all_leaves = [[] for _ in range(F)]
    for ti, (r0, r1, c0, c1) in enumerate(p.tiles()):
        x0, y0 = c0 * 64, r0 * 64
        region = (x0, y0, min(c1 * 64, aw) - x0, min(r1 * 64, ah) - y0)
        decs = device_decide.decide_intra_frames(src_dev, p, fc, lam, region)
        leaves = []
        trees = []
        for f in range(F):
            partitions, lv, tree = device_decide.partition_dp(decs[f], p, fc, lam, region)
            plans[f].partitions.update(partitions)
            leaves.append(lv)
            trees.append(tree)
            all_leaves[f].extend(lv)
        out = commit_regions(src_dev, p, leaves, decs, plans, region,
                             array_out=use_arrays)
        if use_arrays:
            ry, ru, rv, skip8, aux = out
            from ..utils import profiler

            with profiler.stage("entropy_walk"):
                for f in range(F):
                    ops, _k = array_plan.build_tile_ops(
                        p, trees[f], aux["sched"], aux["level_base"], f, region,
                        (r0, r1, c0, c1), None, TX_SEARCH, DEC_MODES)
                    fc_t = walk_fcs[f] if ti == 0 else fc_inits[f].clone()
                    payloads[f].append(run_tile_ops(
                        p, fc_t, ops, aux["levels_i32"],
                        (r0, r1, c0, c1)))
        else:
            ry, ru, rv, skip8 = out
        regions.append((region, ry, ru, rv, skip8))

    # assemble the full-frame device recon (single-region fast path)
    if len(regions) == 1:
        (_, ry, ru, rv, skip8) = regions[0]
    else:
        ry = jnp.zeros((F, ah, aw), jnp.int32)
        ru = jnp.zeros((F, ah // 2, aw // 2), jnp.int32)
        rv = jnp.zeros((F, ah // 2, aw // 2), jnp.int32)
        skip8 = jnp.zeros((F, ah // 8, aw // 8), bool)
        for (x0, y0, rw, rh), a, b, c, s8 in regions:
            ry = ry.at[:, y0 : y0 + rh, x0 : x0 + rw].set(a)
            ru = ru.at[:, y0 // 2 : (y0 + rh) // 2, x0 // 2 : (x0 + rw) // 2].set(b)
            rv = rv.at[:, y0 // 2 : (y0 + rh) // 2, x0 // 2 : (x0 + rw) // 2].set(c)
            skip8 = skip8.at[:, y0 // 8 : (y0 + rh) // 8, x0 // 8 : (x0 + rw) // 8].set(s8)

    filt = None
    if apply_filters:
        levels = (dlf_mod.pick_filter_levels(p.qindex, p.bd, True, p.height)
                  if enable_dlf else (0, 0, 0, 0))
        sm = _size_maps(all_leaves, F, ah // 8, aw // 8)
        flens = []
        for plane in range(3):
            flens.append(dlf_jax.flen_maps_from_sizes(sm, plane, False))
            flens.append(dlf_jax.flen_maps_from_sizes(sm, plane, True))
        flen_shapes = tuple(x.shape for x in flens)
        flen_flat = jnp.asarray(np.concatenate([x.ravel() for x in flens]))
        damping = cdef_mod.pick_damping(p.qindex)
        lf_search = _lf_candidates(levels[0]) if p.sf_dlf_search else ()
        packed, stats, _pl = _filter_device(ry, ru, rv, src_dev[0], skip8, flen_flat,
                                            tuple(levels), sharpness, p.bd, damping,
                                            enable_cdef, flen_shapes,
                                            cdef_cands=4 if p.sf_cdef_fast else 0,
                                            lf_search=lf_search)
        stats = np.asarray(stats)
        filt = []
        for f in range(F):
            ylvl = lf_search[int(stats[f, 4])] if lf_search else levels[0]
            filt.append(dict(lf_levels=(ylvl, ylvl, levels[2], levels[3]),
                             cdef=(int(stats[f, 0]), int(stats[f, 1]),
                                   int(stats[f, 2]), int(stats[f, 3]), damping)))
    else:
        odt = jnp.uint8 if p.bd == 8 else jnp.int16
        packed = jnp.concatenate([ry.astype(odt).ravel(),
                                  ru.astype(odt).ravel(),
                                  rv.astype(odt).ravel()])
    packed = np.asarray(packed)

    ysz, csz = ah * aw, (ah // 2) * (aw // 2)
    yy = packed[: F * ysz].reshape(F, ah, aw).astype(np.int32)
    uu = packed[F * ysz : F * (ysz + csz)].reshape(F, ah // 2, aw // 2).astype(np.int32)
    vv = packed[F * (ysz + csz) :].reshape(F, ah // 2, aw // 2).astype(np.int32)
    recons = [[yy[f], uu[f], vv[f]] for f in range(F)]
    if filt is None:
        filt = [None] * F
    if payloads is None:
        payloads = [None] * F
    return [(plans[f], recons[f], filt[f], payloads[f]) for f in range(F)]


def encode_intra_frame(src_planes: list, params: FrameParams) -> tuple[Plan, list]:
    """Single-frame wrapper over encode_intra_frames (unfiltered recon,
    BlockDecision plan — the introspectable form used by tests/tools; the
    production encoder path uses the array plan + prebuilt payloads)."""
    plan, recon, _filt, _payloads = encode_intra_frames([src_planes], params,
                                                        use_arrays=False)[0]
    return plan, recon
