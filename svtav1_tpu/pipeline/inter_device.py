"""Device (JAX) inter frame pipeline: batched ME + MC + mode decision.

TPU-first re-architecture of the reference's inter EncDec path
(product_coding_loop.c:8982 md_encode_block inter classes,
motion_estimation.c:3146 open-loop ME): ONE jitted decide program per frame
computes, for every square block of every size 8..64,

  - hierarchical full-pel ME + per-size SAD-tree aggregation + subpel
    refinement against each reference (ops/me_jax),
  - batched normative MC (8-tap subpel, per-lane phases) and full
    open-loop RD (transform/quant/recon + exact CDF txb rates) for the
    NEWMV / GLOBALMV candidates per reference,
  - the full intra candidate evaluation (reusing device_decide),
  - per-block winner (intra vs inter) with CDF-based mode/mv rates.

Mode-rate contexts use the neighbor-free approximation (ctx 0 / empty
neighbor ref counts) — the same class of trade the reference makes for its
parallel per-SB CDF snapshots (enc_dec_process.c:3330-3352). Coded inter
modes are NEWMV (or GLOBALMV at zero MV); the normative MVP stack is built
by the tile walk at write time (codec/mvp.py), which also yields exact DRL
contexts — the decide pass only needs a cost ordering.

Partition RD + the conformant wavefront commit are shared with the intra
pipeline (device_decide.partition_dp / device_commit.commit_regions: inter
lanes take precomputed MC predictions instead of frontier intra edges).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codec import rate as rate_np
from ..codec import rate_jax
from ..codec.tile_codec import FrameParams
from ..constants.av1 import InterMode, RefFrame, TxType
from ..ops import me_jax
from ..ops import quantize as quant_ops
from ..ops import transforms_jax as TJ
from . import device_decide
from .device_decide import SIZES, TX_SEARCH, _blocks_of, _eval_txfm, _rate_fns

MAX_MV_ABS = 4094  # 1/8-pel component clamp (within spec MV range, even)


def single_ref_tree_bits(fc, ref_id: int) -> float:
    """single-ref tree signaling bits for one RefFrame id, with the
    empty-neighbor-count context approximation (every _ref_ctx() = 1 —
    tile_codec._ref_ctx with zero counts)."""
    sb = rate_np.symbol_bits
    bits = 0.0
    bit0 = ref_id >= int(RefFrame.BWDREF_FRAME)
    bits += sb(fc["single_ref"][1][0], int(bit0), 2)
    if bit0:
        b = ref_id == int(RefFrame.ALTREF_FRAME)
        bits += sb(fc["single_ref"][1][1], int(b), 2)
        if not b:
            bits += sb(fc["single_ref"][1][5], int(ref_id == int(RefFrame.ALTREF2_FRAME)), 2)
    else:
        b = ref_id in (int(RefFrame.LAST3_FRAME), int(RefFrame.GOLDEN_FRAME))
        bits += sb(fc["single_ref"][1][2], int(b), 2)
        if b:
            bits += sb(fc["single_ref"][1][4], int(ref_id == int(RefFrame.GOLDEN_FRAME)), 2)
        else:
            bits += sb(fc["single_ref"][1][3], int(ref_id == int(RefFrame.LAST2_FRAME)), 2)
    return bits


def inter_cand_cost_const(fc, ref_ids, ref_select: bool = False,
                          comp_pair=None) -> dict:
    """Mode-signaling bit constants for the decide pass (ctx-0 / empty
    neighbor-ref-count approximations; exact contexts are applied by the
    tile walk): is_inter flag + single-ref tree per ref + {new,glob} mode
    flags. ref_ids: the RefFrame id per stacked ref index. With
    reference_select, single candidates pay the comp_inter=0 bit and
    `comp` carries the compound NEW_NEWMV signaling constant (comp_inter=1
    + BIDIR ref pair + inter_compound_mode symbol)."""
    sb = rate_np.symbol_bits
    is_inter_b = sb(fc["intra_inter"][0], 1, 2)
    single_b = sb(fc["comp_inter"][1], 0, 2) if ref_select else 0.0
    b_new = sb(fc["newmv"][0], 0, 2)
    b_glob = sb(fc["newmv"][0], 1, 2) + sb(fc["zeromv"][0], 0, 2)
    ref_bits = [single_ref_tree_bits(fc, int(r)) for r in ref_ids]
    comp = None
    if comp_pair is not None:
        cb = sb(fc["comp_inter"][1], 1, 2)
        cb += sb(fc["comp_ref_type"][2], 1, 2)  # BIDIR
        cb += sb(fc["comp_ref"][1][0], 0, 2)  # fwd group {LAST, LAST2}
        cb += sb(fc["comp_ref"][1][1], 0, 2)  # LAST
        cb += sb(fc["comp_bwdref"][1][0], 1, 2)  # ALTREF
        cb += sb(fc["inter_compound_mode"][0], 7, 8)  # NEW_NEWMV
        comp = is_inter_b + cb
    return dict(
        new=[is_inter_b + single_b + rb + b_new for rb in ref_bits],
        glob=is_inter_b + single_b + ref_bits[0] + b_glob,
        comp=comp,
    )


def inter_txtype_cost_const(fc, n: int) -> np.ndarray:
    """(len(TX_SEARCH),) inter tx-type signaling bits (inter_ext_tx cdf)."""
    from ..codec.tile_codec import (AV1_EXT_TX_IND, AV1_EXT_TX_USED, AV1_NUM_EXT_TX_SET,
                                    EXT_TX_SET_DCTONLY, EXT_TX_SET_INDEX_INTER,
                                    ext_tx_set_type_inter)
    from ..constants.av1 import MAX_TXSIZE_RECT, TX_SIZE_SQR
    from .intra_device import BSIZE_BY_N

    tx_size = int(MAX_TXSIZE_RECT[BSIZE_BY_N[n]])
    set_type = ext_tx_set_type_inter(tx_size)
    out = np.zeros(len(TX_SEARCH), np.float32)
    for j, t in enumerate(TX_SEARCH):
        if set_type == EXT_TX_SET_DCTONLY:
            out[j] = 0.0 if t == int(TxType.DCT_DCT) else 1e9
        elif not AV1_EXT_TX_USED[set_type][t]:
            out[j] = 1e9
        else:
            eset = EXT_TX_SET_INDEX_INTER[set_type]
            nsyms = AV1_NUM_EXT_TX_SET[set_type]
            sqr = int(TX_SIZE_SQR[tx_size])
            out[j] = rate_np.symbol_bits(fc["inter_ext_tx"][eset][sqr],
                                         int(AV1_EXT_TX_IND[set_type][t]), nsyms)
    return out


def _mv_rate(mv, pred, joint, comp):
    """(B, 2) 1/8-pel MVs + predictors -> (B,) signaling bits via the exact
    NMV LUTs (codec/rate_jax.mv_component_cost_lut)."""
    d = jnp.clip(mv - pred, -MAX_MV_ABS, MAX_MV_ABS)
    ady = jnp.abs(d[:, 0])
    adx = jnp.abs(d[:, 1])
    return (joint[(ady != 0).astype(jnp.int32), (adx != 0).astype(jnp.int32)]
            + comp[0, ady] + comp[1, adx])


def _decide_inter_size(src_y, src_u, src_v, refs_y, refs_u, refs_v,
                       mv_by_ref, pred_by_ref, intra_out, consts,
                       n: int, qctx: int, dq, bd: int, R: int, C: int, lam,
                       which: int, mc_by_ref=None, comp_pair=None,
                       tx_ntypes: int = 4, ref_off_x: int = 0, gm8=None):
    """Inter candidate evaluation for the (R, C) grid at size n, merged with
    the intra decision `intra_out` = (cost, mode, tx) from device_decide.

    mv_by_ref: list of (B, 2) subpel MVs per reference; pred_by_ref: list of
    (B, 2) MV-rate predictors (SB-level MV proxy); mc_by_ref: matching
    (B, n, n) normative predictions from the subpel search (gather-free
    reuse — me_jax.subpel_pred_lanes). Returns (cost, is_inter, mode, tx,
    ref, mvy, mvx) flattened (R*C,) arrays."""
    B = R * C
    nc = n // 2
    r_idx = jnp.repeat(jnp.arange(R), C)
    c_idx = jnp.tile(jnp.arange(C), R)
    ys, xs = r_idx * n, c_idx * n
    ysc, xsc = r_idx * nc, c_idx * nc
    srcb = _blocks_of(src_y[None], n, R, C)
    rate_fns = _rate_fns(qctx, n)
    joint, comp, cand_bits, txt_cost = consts

    # candidates: NEWMV per ref + GLOBALMV on ref 0 (+ compound NEW_NEWMV on
    # the fwd/bwd pair), folded into the lane axis (one transform chain for
    # ALL candidates). NEWMV predictions are reused from the subpel search;
    # GLOBALMV (zero MV) is a static block copy; the compound lane blends
    # the two single predictions ((a + b + 1) >> 1 — decide-side
    # approximation of the CONV_BUF average; commit redoes it exactly).
    # GLOBALMV lane MV: the frame's global MV for ref 0 (runtime operand;
    # identity gm keeps the zero-MV static-copy fast path below)
    glob_mv = (jnp.zeros((B, 2), jnp.int32) if gm8 is None
               else jnp.broadcast_to(gm8[None, :], (B, 2)).astype(jnp.int32))
    cand_mv = jnp.concatenate([*mv_by_ref, glob_mv])  # (NC*B, 2)
    cand_ref = jnp.concatenate(
        [jnp.full(B, ri, jnp.int32) for ri in range(len(mv_by_ref))] + [jnp.zeros(B, jnp.int32)])
    bits_list = [cand_bits["new"][ri] + _mv_rate(mv, pred_by_ref[ri], joint, comp)
                 for ri, mv in enumerate(mv_by_ref)]
    bits_list.append(jnp.full(B, cand_bits["glob"], jnp.float32))
    NC = len(mv_by_ref) + 1
    cand_ref2 = [jnp.full(NC * B, -1, jnp.int32)]
    cand_mv2 = [jnp.zeros((NC * B, 2), jnp.int32)]
    if comp_pair is not None:
        ri0, ri1 = comp_pair
        cand_mv = jnp.concatenate([cand_mv, mv_by_ref[ri0]])
        cand_ref = jnp.concatenate([cand_ref, jnp.full(B, ri0, jnp.int32)])
        cand_ref2.append(jnp.full(B, ri1, jnp.int32))
        cand_mv2.append(mv_by_ref[ri1])
        bits_list.append(cand_bits["comp"]
                         + _mv_rate(mv_by_ref[ri0], pred_by_ref[ri0], joint, comp)
                         + _mv_rate(mv_by_ref[ri1], pred_by_ref[ri1], joint, comp))
        NC += 1
    cand_mbits = jnp.concatenate(bits_list)
    cand_ref2 = jnp.concatenate(cand_ref2)
    cand_mv2 = jnp.concatenate(cand_mv2)

    if mc_by_ref is not None:
        if gm8 is None:
            glob_pred = _blocks_of(refs_y[0][None, :, ref_off_x:], n, R, C)
        else:
            glob_pred = me_jax.mc_lanes(refs_y, ys, xs + ref_off_x,
                                        glob_mv[:, 0] * 2, glob_mv[:, 1] * 2,
                                        n, n, which, bd,
                                        ref_idx=jnp.zeros(B, jnp.int32))
        pred = jnp.concatenate([*mc_by_ref, glob_pred])
    else:
        pred = me_jax.mc_lanes(refs_y, jnp.tile(ys, NC), jnp.tile(xs, NC),
                               cand_mv[:, 0] * 2, cand_mv[:, 1] * 2, n, n,
                               which, bd, ref_idx=cand_ref)
    if comp_pair is not None:
        ri0, ri1 = comp_pair
        pred = jnp.concatenate([pred, (mc_by_ref[ri0] + mc_by_ref[ri1] + 1) >> 1])
    src_nc = jnp.tile(srcb, (NC, 1, 1))
    lv, dqc, rate = _eval_txfm(src_nc - pred, int(TxType.DCT_DCT), dq, bd, n,
                               rate_fns["y"][0])
    rec = TJ.inv_txfm2d_add_j(dqc, pred, int(TxType.DCT_DCT), bd)
    dist = jnp.sum((rec - src_nc).astype(jnp.float32) ** 2, axis=(-2, -1))
    cost_nc = (dist + lam * (rate + cand_mbits)).reshape(NC, B)
    pick = jnp.argmin(cost_nc, axis=0)
    cost_i = jnp.take_along_axis(cost_nc, pick[None], axis=0)[0]
    mv_i = jnp.take_along_axis(cand_mv.reshape(NC, B, 2), pick[None, :, None], axis=0)[0]
    ref_i = jnp.take_along_axis(cand_ref.reshape(NC, B), pick[None], axis=0)[0]
    ref2_i = jnp.take_along_axis(cand_ref2.reshape(NC, B), pick[None], axis=0)[0]
    mv2_i = jnp.take_along_axis(cand_mv2.reshape(NC, B, 2), pick[None, :, None], axis=0)[0]
    mbits_i = jnp.take_along_axis(cand_mbits.reshape(NC, B), pick[None], axis=0)[0]
    pred_i = jnp.take_along_axis(pred.reshape(NC, B, n, n),
                                 pick[None, :, None, None], axis=0)[0]

    # luma tx-type search on the inter winner (sizes with a non-DCT set)
    tx_i = jnp.zeros(B, jnp.int32)
    if n <= 16 and tx_ntypes > 1:
        resid = srcb - pred_i
        for j in range(1, tx_ntypes):
            lvj, dqcj, ratej = _eval_txfm(resid, TX_SEARCH[j], dq, bd, n,
                                          rate_fns["y"][j])
            recj = TJ.inv_txfm2d_add_j(dqcj, pred_i, TX_SEARCH[j], bd)
            dj = jnp.sum((recj - srcb).astype(jnp.float32) ** 2, axis=(-2, -1))
            cj = dj + lam * (ratej + mbits_i + txt_cost[j])
            take = cj < cost_i
            cost_i = jnp.where(take, cj, cost_i)
            tx_i = jnp.where(take, j, tx_i)

    # chroma at the winner's MV (DCT approximation, as the intra decide does)
    for srcc, refc in ((src_u, refs_u), (src_v, refs_v)):
        sb = _blocks_of(srcc[None], nc, R, C)
        pc = me_jax.mc_lanes(refc, ysc, xsc + ref_off_x // 2, mv_i[:, 0], mv_i[:, 1],
                             nc, nc, which, bd, ref_idx=ref_i)
        lvc, dqcc, ratec = _eval_txfm(sb - pc, int(TxType.DCT_DCT), dq, bd, nc,
                                      rate_fns["uv"])
        recc = TJ.inv_txfm2d_add_j(dqcc, pc, int(TxType.DCT_DCT), bd)
        cost_i = cost_i + jnp.sum((recc - sb).astype(jnp.float32) ** 2, axis=(-2, -1)) \
            + lam * ratec
    cost_i = cost_i + lam * 1.0  # skip flag

    # merge with intra
    cost_a, mode_a, tx_a = intra_out
    ca = cost_a.reshape(B)
    take_inter = cost_i < ca
    return (jnp.where(take_inter, cost_i, ca),
            take_inter.astype(jnp.int32),
            jnp.where(take_inter, 0, mode_a.reshape(B)),
            jnp.where(take_inter, tx_i, tx_a.reshape(B)),
            jnp.where(take_inter, ref_i, -1),
            jnp.where(take_inter, mv_i[:, 0], 0),
            jnp.where(take_inter, mv_i[:, 1], 0),
            jnp.where(take_inter, ref2_i, -1),
            jnp.where(take_inter, mv2_i[:, 0], 0),
            jnp.where(take_inter, mv2_i[:, 1], 0))


@functools.lru_cache(maxsize=32)
def _decide_inter_jit(width: int, height: int, qctx: int, bd: int, nref: int,
                      which: int, ref_ids: tuple = (1, 7), ref_select: bool = False,
                      sf: tuple = (7, 4, 0), use_gm: bool = False):
    """Whole-frame inter decide program: ME + subpel + per-size inter/intra
    RD. Per-frame CDF constants are baked in per qctx BUCKET; qindex enters
    as runtime operands (dqv, lam) so hierarchical layer offsets do not
    recompile the program."""
    from .device_decide import (QCTX_REP, _decide_intra_size, _penalty_grid_np,
                                fc_for_qctx, intra_mode_cost_const,
                                intra_txtype_cost_const)

    p = FrameParams(width=width, height=height, qindex=QCTX_REP[qctx], bd=bd,
                    frame_is_intra=False)
    fc = fc_for_qctx(qctx)
    aw, ah = p.aligned_width, p.aligned_height
    region = (0, 0, aw, ah)
    mi_end = (p.mi_rows, p.mi_cols)
    sizes = [n for n in SIZES if ah // n and aw // n]
    intra_consts = {n: (_penalty_grid_np(p, 0, 0, ah // n, aw // n, n, (0, 0), mi_end),
                        intra_mode_cost_const(fc, n, False),
                        intra_txtype_cost_const(fc, n)) for n in sizes}
    # compound pair: (LAST, ALTREF) stack indices when both present
    comp_pair = None
    ids = list(ref_ids[:nref])
    if ref_select and int(RefFrame.LAST_FRAME) in ids and int(RefFrame.ALTREF_FRAME) in ids:
        comp_pair = (ids.index(int(RefFrame.LAST_FRAME)),
                     ids.index(int(RefFrame.ALTREF_FRAME)))
    cand_bits = inter_cand_cost_const(fc, ref_ids[:nref], ref_select=ref_select,
                                      comp_pair=comp_pair)
    inter_txt = {n: inter_txtype_cost_const(fc, n) for n in sizes}
    joint = jnp.asarray(rate_jax.mv_joint_cost(fc))
    comp = jnp.asarray(rate_jax.mv_component_cost_lut(fc, MAX_MV_ABS))
    # ME padding to SB multiples
    sbr, sbc = -(-ah // 64), -(-aw // 64)
    pad_h, pad_w = sbr * 64 - ah, sbc * 64 - aw
    layout = [(n, ah // n, aw // n) for n in sizes]

    @jax.jit
    def run(sy8, su8, sv8, refs_y8, refs_u8, refs_v8, dqv, lam, gm8):
        dq = (dqv[0], dqv[1])
        sy = sy8.astype(jnp.int32)
        su = su8.astype(jnp.int32)
        sv = sv8.astype(jnp.int32)
        refs_y = refs_y8.astype(jnp.int32)
        refs_u = refs_u8.astype(jnp.int32)
        refs_v = refs_v8.astype(jnp.int32)
        sy_me = jnp.pad(sy[0], ((0, pad_h), (0, pad_w)), mode="edge")

        # per-ref ME: full-pel per size + subpel refinement (the refinement
        # also yields each winner's normative prediction for RD reuse)
        mv_by_ref = {n: [] for n in sizes}
        mc_by_ref = {n: [] for n in sizes}
        sb_pred = []
        for ri in range(nref):
            ref_me = jnp.pad(refs_y[ri], ((0, pad_h), (0, pad_w)), mode="edge")
            mvs_fp, mv_sb = me_jax.me_fullpel_frame(sy_me, ref_me, sbr, sbc)
            sb_pred.append(mv_sb.reshape(sbr, sbc, 2) * 8)
            for n, R, C in layout:
                fp = mvs_fp[n][:R, :C].reshape(R * C, 2)
                r_idx = jnp.repeat(jnp.arange(R), C)
                c_idx = jnp.tile(jnp.arange(C), R)
                srcb = _blocks_of(sy, n, R, C)
                mv8, mc8 = me_jax.subpel_pred_lanes(srcb, refs_y[ri], r_idx * n,
                                                    c_idx * n, fp, which, bd,
                                                    fast=bool(sf[2]))
                mv_by_ref[n].append(jnp.clip(mv8, -MAX_MV_ABS, MAX_MV_ABS))
                mc_by_ref[n].append(mc8)

        packed = []
        for n, R, C in sizes and layout:
            pen, mode_cost, txt_cost = intra_consts[n]
            # reduced intra class in inter frames: the 7 non-directional
            # modes (the reference likewise restricts intra injection in
            # inter frames — mode_decision.c intra candidate classes)
            intra_out = _decide_intra_size(
                sy, su, sv, jnp.asarray(pen),
                jnp.asarray(mode_cost), jnp.asarray(txt_cost), n, qctx, dq, bd,
                False, R, C, lam, nmodes=sf[0], tx_ntypes=sf[1])
            # MV-rate predictor proxy: the SB-level MV over each block
            k = 64 // n
            preds = []
            for ri in range(nref):
                pr = jnp.repeat(jnp.repeat(sb_pred[ri], k, axis=0), k, axis=1)
                preds.append(pr[:R, :C].reshape(R * C, 2))
            consts = (joint, comp, cand_bits, jnp.asarray(inter_txt[n]))
            cost, is_inter, mode, tx, ref, mvy, mvx, ref2, mv2y, mv2x = \
                _decide_inter_size(
                    sy[0], su[0], sv[0], refs_y, refs_u, refs_v,
                    mv_by_ref[n], preds, intra_out, consts, n, qctx, dq, bd, R, C,
                    lam, which, mc_by_ref=mc_by_ref[n], comp_pair=comp_pair,
                    tx_ntypes=sf[1], gm8=gm8 if use_gm else None)
            packed += [cost, is_inter.astype(jnp.float32), mode.astype(jnp.float32),
                       tx.astype(jnp.float32), ref.astype(jnp.float32),
                       mvy.astype(jnp.float32), mvx.astype(jnp.float32),
                       ref2.astype(jnp.float32), mv2y.astype(jnp.float32),
                       mv2x.astype(jnp.float32)]
        return jnp.concatenate(packed)

    return run, layout


def _flen_maps_from_mi(mi, levels, aw: int, ah: int):
    """Six (1, rows, K) DLF filter-length maps (plane-major [vert, horiz])
    from the frame's mi state — the normative inter mask incl. skip/PU-edge
    rules (filters/dlf._edge_maps_vertical)."""
    from ..filters.dlf import _edge_maps_vertical, _transposed_mi

    miT = _transposed_mi(mi)
    maps = []
    for plane in range(3):
        ss = 0 if plane == 0 else 1
        pw, ph = aw >> ss, ah >> ss
        lvl_v = levels[0] if plane == 0 else levels[plane + 1]
        lvl_h = levels[1] if plane == 0 else levels[plane + 1]
        maps.append(_edge_maps_vertical(mi, plane, pw, ph, lvl_v)[None].astype(np.int8))
        maps.append(_edge_maps_vertical(miT, plane, ph, pw, lvl_h)[None].astype(np.int8))
    return maps


def encode_inter_frame_device(src_planes: list, params: FrameParams, refs: dict,
                              enable_dlf: bool = True, enable_cdef: bool = True,
                              sharpness: int = 0, use_arrays: bool | None = None,
                              walk_fc=None, apply_filters: bool = True):
    """Unified device inter encoder for one frame: jitted decide (ME + MC +
    RD), host partition DP, wavefront commit with precomputed MC lanes,
    device in-loop filters, vectorized op-stream build + native C walk.
    Returns (plan, recon_planes, filt_dict, payloads) — payloads is the list
    of per-tile entropy payload bytes (None entries fall back to the plan
    walk; the plan carries partitions either way)."""
    from ..constants.cdf import FrameContext
    from ..codec import array_plan
    from ..codec.tile_codec import Plan
    from ..codec.tile_walk_native import run_tile_ops
    from ..entropy import native
    from ..filters import cdef as cdef_mod
    from . import device_commit
    from .encoder import mi_from_plan
    from .intra_md import rd_lambda

    from ..utils import profiler

    p = params
    which = p.interp_filter
    fc = FrameContext(p.qindex)
    lam = float(rd_lambda(p.qindex, p.bd))
    aw, ah = p.aligned_width, p.aligned_height
    region = (0, 0, aw, ah)
    with profiler.stage("h2d"):
        src_dev = device_decide.put_frames([src_planes], p.bd)
        ref_ids = sorted(refs.keys())  # LAST first, then ALTREF
        dt = np.uint8 if p.bd == 8 else np.int16
        refs_dev = tuple(jax.device_put(np.stack([np.asarray(refs[r][pl], dt)
                                                  for r in ref_ids]))
                         for pl in range(3))

    with profiler.stage("decide"):
        dec = decide_inter_frame(src_dev, refs_dev, p, which, ref_ids=ref_ids)
    with profiler.stage("partition_dp"):
        partitions, leaves, tree = device_decide.partition_dp(dec, p, fc, lam, region)
    plan = Plan()
    plan.partitions.update(partitions)
    if use_arrays is None:
        use_arrays = native.available() and not p.enable_filter_intra
    payloads = None
    with profiler.stage("commit"):
        out = device_commit.commit_regions(
            src_dev, p, [leaves], [dec], [plan], region,
            refs_dev=refs_dev, ref_ids=ref_ids, which=which, array_out=use_arrays)
        if use_arrays:
            ry, ru, rv, skip8, aux = out
        else:
            ry, ru, rv, skip8 = out

    if use_arrays:
        with profiler.stage("entropy_walk"):
            (r0, r1, c0, c1) = p.tiles()[0]
            ops, _keys = array_plan.build_tile_ops(
                p, tree, aux["sched"], aux["level_base"], 0, region,
                (r0, r1, c0, c1), ref_ids, TX_SEARCH, device_decide.MODES)
            payloads = [run_tile_ops(p, walk_fc if walk_fc is not None
                                     else FrameContext(p.qindex), ops,
                                     aux["levels_i32"], (r0, r1, c0, c1))]

    if not apply_filters:
        # caller runs host filters (e.g. loop-restoration configs need the
        # deblocked intermediate); return the raw device recon
        recon = [np.asarray(ry[0] if ry.ndim == 3 else ry).astype(np.int32),
                 np.asarray(ru[0] if ru.ndim == 3 else ru).astype(np.int32),
                 np.asarray(rv[0] if rv.ndim == 3 else rv).astype(np.int32)]
        return plan, recon, None, payloads

    # in-loop filters on device (DLF edge maps from the final mi state —
    # inter rules need skip/ref/PU edges, unlike the all-intra size maps)
    with profiler.stage("dlf_maps"):
        levels = p.lf_levels if enable_dlf else (0, 0, 0, 0)
        if use_arrays:
            frame_mi = array_plan.mi_from_sched(p, aux["sched"], 0, region, ref_ids,
                                                device_decide.MODES)
        else:
            frame_mi = mi_from_plan(plan, p)
        flens = _flen_maps_from_mi(frame_mi, levels, aw, ah)
        flen_shapes = tuple(x.shape for x in flens)
        flen_flat = jnp.asarray(np.concatenate([x.ravel() for x in flens]).astype(np.int32))
    with profiler.stage("filters"):
        damping = cdef_mod.pick_damping(p.qindex)
        lf_search = (device_commit._lf_candidates(levels[0])
                     if p.sf_dlf_search else ())
        packed, stats, _pl = device_commit._filter_device(
            ry, ru, rv, src_dev[0], skip8, flen_flat, tuple(levels), sharpness,
            p.bd, damping, enable_cdef, flen_shapes,
            cdef_cands=4 if p.sf_cdef_fast else 0, lf_search=lf_search)
        stats = np.asarray(stats)
        packed = np.asarray(packed)
    ysz, csz = ah * aw, (ah // 2) * (aw // 2)
    recon = [packed[:ysz].reshape(ah, aw).astype(np.int32),
             packed[ysz : ysz + csz].reshape(ah // 2, aw // 2).astype(np.int32),
             packed[ysz + csz :].reshape(ah // 2, aw // 2).astype(np.int32)]
    ylvl = lf_search[int(stats[0, 4])] if lf_search else levels[0]
    filt = dict(lf_levels=(ylvl, ylvl, levels[2], levels[3]),
                cdef=(int(stats[0, 0]), int(stats[0, 1]),
                      int(stats[0, 2]), int(stats[0, 3]),
                      cdef_mod.pick_damping(p.qindex)))
    return plan, recon, filt, payloads


def _unpack_decide(flat: np.ndarray, layout) -> dict:
    out = {}
    off = 0
    for n, R, C in layout:
        sz = R * C
        g = {}
        for kname in ("cost", "is_inter", "mode", "tx", "ref", "mvy", "mvx",
                      "ref2", "mv2y", "mv2x"):
            arr = flat[off : off + sz].reshape(R, C)
            g[kname] = arr.astype(np.float64) if kname == "cost" else arr.astype(np.int32)
            off += sz
        out[n] = g
    return out


def decide_inter_frame(src_dev, refs_dev, params: FrameParams, which: int,
                       ref_ids=(1, 7)) -> dict:
    """Run the jitted decide; returns {n: dict(cost, mode, tx, is_inter, ref,
    mvy, mvx)} numpy grids over the full aligned frame."""
    from ..constants.cdf import get_q_ctx

    p = params
    gm8 = np.asarray(p.gm_mvs[int(ref_ids[0])], np.int32)
    run, layout = _decide_inter_jit(p.width, p.height, get_q_ctx(p.qindex), p.bd,
                                    refs_dev[0].shape[0], which,
                                    ref_ids=tuple(int(r) for r in ref_ids),
                                    ref_select=bool(p.reference_select),
                                    sf=(int(p.sf_nmodes_inter), int(p.sf_tx_ntypes),
                                        int(p.sf_fast_subpel)),
                                    use_gm=bool(p.enable_gm))
    dqv, lam_op = device_decide.qparams_np(p.qindex, p.bd)
    flat = np.asarray(run(src_dev[0], src_dev[1], src_dev[2], *refs_dev, dqv,
                          lam_op, gm8))
    return _unpack_decide(flat, layout)


# --------------------------------------------------------------- pipelined
# Three-phase inter frame for the overlapped host/device pipeline (the
# throughput half of the reference's System Resource Manager design,
# Docs/svt-av1-encoder-design.md:135-142 "process/picture parallelism"):
#
#   start_decide  — h2d source + DISPATCH the decide program, no host sync.
#                   Runs while the host still walks the PREVIOUS frame.
#   start_commit  — fetch decide (the frame's one mandatory sync), host
#                   partition DP, dispatch commit + in-loop filters. The
#                   filtered, display-edge-replicated recon planes stay ON
#                   DEVICE (.dpb_planes) so the next frame's ME/MC chains
#                   on them with zero host round trips.
#   finish        — pull levels (overlapped d2h), build the op stream, run
#                   the native C walk, fetch the recon for the packet.


class PendingInter:
    """Mutable carrier of one in-flight frame's device futures + host aux."""


def inter_start_decide(src_planes, params: FrameParams, refs_dev, which: int,
                       ref_ids) -> PendingInter:
    from ..constants.cdf import get_q_ctx
    from ..utils import profiler

    p = params
    pend = PendingInter()
    with profiler.stage("h2d"):
        pend.src_dev = device_decide.put_frames([src_planes], p.bd)
    gm8 = np.asarray(p.gm_mvs[int(ref_ids[0])], np.int32)
    run, layout = _decide_inter_jit(p.width, p.height, get_q_ctx(p.qindex), p.bd,
                                    int(refs_dev[0].shape[0]), which,
                                    ref_ids=tuple(int(r) for r in ref_ids),
                                    ref_select=bool(p.reference_select),
                                    sf=(int(p.sf_nmodes_inter), int(p.sf_tx_ntypes),
                                        int(p.sf_fast_subpel)),
                                    use_gm=bool(p.enable_gm))
    dqv, lam_op = device_decide.qparams_np(p.qindex, p.bd)
    pend.flat = run(pend.src_dev[0], pend.src_dev[1], pend.src_dev[2],
                    *refs_dev, dqv, lam_op, gm8)
    pend.layout = layout
    pend.p = p
    pend.refs_dev = refs_dev
    pend.which = which
    pend.ref_ids = [int(r) for r in ref_ids]
    return pend


def inter_start_commit(pend: PendingInter, enable_dlf: bool = True,
                       enable_cdef: bool = True, sharpness: int = 0) -> PendingInter:
    from ..codec.tile_codec import Plan
    from ..constants.cdf import FrameContext
    from ..filters import cdef as cdef_mod
    from ..filters import dlf_jax
    from . import device_commit
    from .intra_md import rd_lambda
    from ..utils import profiler

    p = pend.p
    fc = FrameContext(p.qindex)
    lam = float(rd_lambda(p.qindex, p.bd))
    aw, ah = p.aligned_width, p.aligned_height
    region = (0, 0, aw, ah)
    with profiler.stage("decide"):
        flat = np.asarray(pend.flat)
    del pend.flat
    dec = _unpack_decide(flat, pend.layout)
    with profiler.stage("partition_dp"):
        partitions, leaves, tree = device_decide.partition_dp(dec, p, fc, lam, region)
    plan = Plan()
    plan.partitions.update(partitions)
    with profiler.stage("commit"):
        ry, ru, rv, skip8, aux = device_commit.commit_regions(
            pend.src_dev, p, [leaves], [dec], [plan], region,
            refs_dev=pend.refs_dev, ref_ids=pend.ref_ids, which=pend.which,
            array_out=True, fetch_levels=False)
    # DLF filter-length maps from the leaf size map alone: with
    # TX_MODE_LARGEST every filtered edge is a prediction-block edge, so the
    # skip/ref terms of the normative mask (deblocking_filter.c
    # set_lpf_parameters) never suppress an edge — the size-map builder is
    # exact for this stream family and needs no device sync.
    with profiler.stage("dlf_maps"):
        levels = p.lf_levels if (enable_dlf and any(p.lf_levels)) else (0, 0, 0, 0)
        sm = device_commit._size_maps([leaves], 1, ah // 8, aw // 8)
        flens = []
        for plane in range(3):
            flens.append(dlf_jax.flen_maps_from_sizes(sm, plane, False))
            flens.append(dlf_jax.flen_maps_from_sizes(sm, plane, True))
        flen_shapes = tuple(x.shape for x in flens)
        flen_flat = jnp.asarray(np.concatenate([x.astype(np.int32).ravel() for x in flens]))
    with profiler.stage("filters_dispatch"):
        damping = cdef_mod.pick_damping(p.qindex)
        lf_search = (device_commit._lf_candidates(levels[0])
                     if p.sf_dlf_search else ())
        packed, stats, planes = device_commit._filter_device(
            ry, ru, rv, pend.src_dev[0], skip8, flen_flat, tuple(levels),
            sharpness, p.bd, damping, enable_cdef, flen_shapes,
            disp_dims=(p.width, p.height),
            cdef_cands=4 if p.sf_cdef_fast else 0, lf_search=lf_search)
    pend.plan, pend.tree, pend.aux = plan, tree, aux
    pend.region = region
    pend.lf_levels = tuple(levels)
    pend.lf_search = lf_search
    pend.damping = damping
    pend.packed, pend.strengths = packed, stats
    pend.dpb_planes = [pl[0] for pl in planes]  # device odt planes, F == 1
    pend.src_dev = None
    pend.refs_dev = None
    return pend


def inter_finish(pend: PendingInter, walk_fc) -> tuple:
    """Complete one pipelined frame: levels d2h + op-stream build + native C
    walk + recon fetch. Returns (plan, recon_int32_planes, filt, payloads)."""
    from ..codec import array_plan
    from ..codec.tile_walk_native import run_tile_ops
    from . import device_commit
    from ..utils import profiler

    p = pend.p
    device_commit.finish_levels(pend.aux)
    with profiler.stage("entropy_walk"):
        (r0, r1, c0, c1) = p.tiles()[0]
        ops, _keys = array_plan.build_tile_ops(
            p, pend.tree, pend.aux["sched"], pend.aux["level_base"], 0,
            pend.region, (r0, r1, c0, c1), pend.aux["ref_ids"], TX_SEARCH,
            device_decide.MODES)
        payloads = [run_tile_ops(p, walk_fc, ops, pend.aux["levels_i32"],
                                 (r0, r1, c0, c1))]
    with profiler.stage("recon_d2h"):
        packed = np.asarray(pend.packed)
        stats = np.asarray(pend.strengths)
    aw, ah = p.aligned_width, p.aligned_height
    ysz, csz = ah * aw, (ah // 2) * (aw // 2)
    recon = [packed[:ysz].reshape(ah, aw).astype(np.int32),
             packed[ysz : ysz + csz].reshape(ah // 2, aw // 2).astype(np.int32),
             packed[ysz + csz :].reshape(ah // 2, aw // 2).astype(np.int32)]
    lf = pend.lf_levels
    if pend.lf_search:
        ylvl = pend.lf_search[int(stats[0, 4])]
        lf = (ylvl, ylvl, lf[2], lf[3])
    filt = dict(lf_levels=lf,
                cdef=(int(stats[0, 0]), int(stats[0, 1]),
                      int(stats[0, 2]), int(stats[0, 3]), pend.damping))
    return pend.plan, recon, filt, payloads
