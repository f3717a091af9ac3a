"""Compound prediction (BIDIR average, reference_select=1): syntax + MC.

Covers the compound MVP stack (codec/mvp.find_mv_stack with ref_frame1),
the comp_inter/comp_ref_type/comp_ref/comp_bwdref/inter_compound_mode
syntax (tile_codec), the normative compound-average MC (ops/convolve
CONV_BUF round_1=7 path), and the NEW_NEWMV -> NEAREST_NEARESTMV /
NEWMV -> NEARESTMV rate downgrades. Reference behavior:
enc_inter_prediction.c:4070 (compound average), adaptive_mv_pred.c
setup_ref_mv_list (compound branches), entropy_coding.c write_ref_frames.
"""
from __future__ import annotations

import numpy as np
import pytest

from svtav1_tpu.codec.tile_codec import BlockDecision, FrameParams, Plan, TileCodec
from svtav1_tpu.constants.av1 import BlockSize, InterMode, RefFrame
from svtav1_tpu.constants.cdf import FrameContext
from svtav1_tpu.ops import convolve as conv_ops
from svtav1_tpu.ops import quantize as quant_ops
from svtav1_tpu.ops import transforms as txfm_ops


def _mk_refs(rng, aw, ah):
    def planes():
        return [rng.integers(0, 255, (ah, aw)).astype(np.int32),
                rng.integers(0, 255, (ah // 2, aw // 2)).astype(np.int32),
                rng.integers(0, 255, (ah // 2, aw // 2)).astype(np.int32)]

    return {int(RefFrame.LAST_FRAME): planes(), int(RefFrame.ALTREF_FRAME): planes()}


def _compound_pred(refs, ref0, ref1, mv, mv1, px, py, pw, ph, plane, bd=8):
    ss = 0 if plane == 0 else 1
    s = 2 if ss == 0 else 1
    c0 = conv_ops.convolve_2d_scalar_compound(refs[ref0][plane], px, py, pw, ph,
                                              mv[1] * s, mv[0] * s, bd=bd)
    c1 = conv_ops.convolve_2d_scalar_compound(refs[ref1][plane], px, py, pw, ph,
                                              mv1[1] * s, mv1[0] * s, bd=bd)
    return conv_ops.compound_average(c0, c1, bd).astype(np.int32)


def _encode_block_levels(src, pred, qindex, bd=8):
    resid = (src - pred).astype(np.int32)
    n = resid.shape[0]
    coeff = txfm_ops.fwd_txfm2d_np(resid[None], 0, bd)[0]
    ls = quant_ops.tx_scale(n, n)
    lv = quant_ops.quantize_np(coeff[None], qindex, n, n, bd)[0]
    adj = min(n, 32)
    return lv[:adj, :adj]


def _round_trip(params, plan, refs, aw, ah):
    fc = FrameContext(params.qindex)
    tc = TileCodec(params, fc, refs=refs)
    payload = tc.encode(plan, use_native=False)
    recon = [np.zeros((ah, aw), np.int32), np.zeros((ah // 2, aw // 2), np.int32),
             np.zeros((ah // 2, aw // 2), np.int32)]
    fc2 = FrameContext(params.qindex)
    td = TileCodec(params, fc2, refs=refs)
    td.decode(payload, recon)
    return payload, recon, td


def test_compound_avg_roundtrip():
    """A frame of compound NEW_NEWMV blocks decodes to the exact compound
    average prediction (+ residual), through the full syntax path."""
    rng = np.random.default_rng(3)
    w = h = 64
    p = FrameParams(width=w, height=h, qindex=100, frame_is_intra=False,
                    reference_select=1, ref_hints=(0, 1, 1, 1, 1, 9, 9, 9),
                    order_hint=5)
    aw, ah = p.aligned_width, p.aligned_height
    refs = _mk_refs(rng, aw, ah)
    plan = Plan()
    plan.partitions[(0, 0, int(BlockSize.BLOCK_64X64))] = 3  # SPLIT
    mvs = [((4, -6), (2, 8)), ((0, 2), (-2, 0)), ((8, 8), (-8, -8)), ((2, 2), (6, 4))]
    src = {pl: np.zeros_like(refs[1][pl]) for pl in range(3)}
    for i, (mi_row, mi_col) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
        mv, mv1 = mvs[i]
        d = BlockDecision(y_mode=int(InterMode.NEW_NEWMV),
                          ref_frame=int(RefFrame.LAST_FRAME),
                          ref_frame1=int(RefFrame.ALTREF_FRAME), mv=mv, mv1=mv1,
                          skip=1)
        plan.partitions[(mi_row, mi_col, int(BlockSize.BLOCK_32X32))] = 0
        plan.blocks[(mi_row, mi_col, int(BlockSize.BLOCK_32X32))] = d
    payload, recon, _ = _round_trip(p, plan, refs, aw, ah)
    for i, (mi_row, mi_col) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
        mv, mv1 = mvs[i]
        for plane in range(3):
            ss = 0 if plane == 0 else 1
            px, py, n = (mi_col * 4) >> ss, (mi_row * 4) >> ss, 32 >> ss
            want = _compound_pred(refs, 1, 7, mv, mv1, px, py, n, n, plane)
            got = recon[plane][py : py + n, px : px + n]
            assert np.array_equal(got, want), (i, plane)


def test_compound_with_residual_and_single_mix():
    """Compound + single-ref + intra blocks in one tile; residuals coded."""
    rng = np.random.default_rng(7)
    w = h = 64
    p = FrameParams(width=w, height=h, qindex=80, frame_is_intra=False,
                    reference_select=1, ref_hints=(0, 1, 1, 1, 1, 9, 9, 9),
                    order_hint=5)
    aw, ah = p.aligned_width, p.aligned_height
    refs = _mk_refs(rng, aw, ah)
    plan = Plan()
    plan.partitions[(0, 0, int(BlockSize.BLOCK_64X64))] = 3
    # blocks: compound with residual, single NEWMV, compound skip, single skip
    specs = [
        ((0, 0), dict(y_mode=int(InterMode.NEW_NEWMV), ref_frame=1, ref_frame1=7,
                      mv=(2, 4), mv1=(-2, 6))),
        ((0, 8), dict(y_mode=int(InterMode.NEWMV), ref_frame=1, mv=(4, 4))),
        ((8, 0), dict(y_mode=int(InterMode.NEW_NEWMV), ref_frame=1, ref_frame1=7,
                      mv=(0, 0), mv1=(2, 2), skip=1)),
        ((8, 8), dict(y_mode=int(InterMode.NEWMV), ref_frame=1, mv=(-4, 8), skip=1)),
    ]
    # residual for the first two blocks on luma
    for (mi_row, mi_col), kw in specs:
        d = BlockDecision(**kw)
        if not d.skip:
            px, py = mi_col * 4, mi_row * 4
            if d.ref_frame1 > 0:
                pred = _compound_pred(refs, 1, 7, d.mv, d.mv1, px, py, 32, 32, 0)
            else:
                pred = conv_ops.convolve_2d_scalar(refs[1][0], px, py, 32, 32,
                                                   d.mv[1] * 2, d.mv[0] * 2)
            target = np.clip(pred + rng.integers(-20, 20, (32, 32)), 0, 255)
            d.levels_y = _encode_block_levels(target, pred, p.qindex)
            d.levels_u = np.zeros((16, 16), np.int32)
            d.levels_v = np.zeros((16, 16), np.int32)
        plan.partitions[(mi_row, mi_col, int(BlockSize.BLOCK_32X32))] = 0
        plan.blocks[(mi_row, mi_col, int(BlockSize.BLOCK_32X32))] = d
    payload, recon, td = _round_trip(p, plan, refs, aw, ah)
    # decode side agrees on modes/refs via the mi grid
    assert int(td.mi.ref1[0, 0]) == int(RefFrame.ALTREF_FRAME)
    assert int(td.mi.ref1[0, 8]) == int(RefFrame.NONE)
    # skip compound block reconstructs to the exact compound average
    for plane in range(3):
        ss = 0 if plane == 0 else 1
        px, py, n = 0, (8 * 4) >> ss, 32 >> ss
        want = _compound_pred(refs, 1, 7, (0, 0), (2, 2), px, py, n, n, plane)
        assert np.array_equal(recon[plane][py : py + n, px : px + n], want), plane


def test_native_walker_compound_parity():
    """The C walker produces byte-identical payloads for compound tiles."""
    from svtav1_tpu.entropy import native

    if not native.available():
        pytest.skip("native entropy lib unavailable")
    rng = np.random.default_rng(5)
    w = h = 64
    p = FrameParams(width=w, height=h, qindex=90, frame_is_intra=False,
                    reference_select=1, ref_hints=(0, 1, 1, 1, 1, 9, 9, 9),
                    order_hint=5)
    aw, ah = p.aligned_width, p.aligned_height
    refs = _mk_refs(rng, aw, ah)
    plan = Plan()
    plan.partitions[(0, 0, int(BlockSize.BLOCK_64X64))] = 3
    specs = [
        ((0, 0), dict(y_mode=int(InterMode.NEW_NEWMV), ref_frame=1, ref_frame1=7,
                      mv=(2, 4), mv1=(-2, 6), skip=1)),
        ((0, 8), dict(y_mode=int(InterMode.NEWMV), ref_frame=1, mv=(4, 4), skip=1)),
        # repeats the (0,0) pair -> NEAREST_NEARESTMV downgrade in BOTH walkers
        ((8, 0), dict(y_mode=int(InterMode.NEW_NEWMV), ref_frame=1, ref_frame1=7,
                      mv=(2, 4), mv1=(-2, 6), skip=1)),
        ((8, 8), dict(y_mode=int(InterMode.NEW_NEWMV), ref_frame=1, ref_frame1=7,
                      mv=(8, -8), mv1=(4, 4), skip=1)),
    ]
    for (mi_row, mi_col), kw in specs:
        plan.partitions[(mi_row, mi_col, int(BlockSize.BLOCK_32X32))] = 0
        plan.blocks[(mi_row, mi_col, int(BlockSize.BLOCK_32X32))] = BlockDecision(**kw)
    fc = FrameContext(p.qindex)
    py_payload = TileCodec(p, fc.clone(), refs=refs).encode(plan, use_native=False)
    nat_payload = TileCodec(p, fc.clone(), refs=refs).encode(plan, use_native=True)
    assert py_payload == nat_payload
    # and it still decodes bit-consistently
    recon = [np.zeros((ah, aw), np.int32), np.zeros((ah // 2, aw // 2), np.int32),
             np.zeros((ah // 2, aw // 2), np.int32)]
    td = TileCodec(p, fc.clone(), refs=refs)
    td.decode(nat_payload, recon)
    assert int(td.mi.mode[8, 0]) == int(InterMode.NEAREST_NEARESTMV)


def test_nearest_downgrades():
    """NEWMV / NEW_NEWMV whose MVs equal stack[0] code as NEAREST* (smaller
    payload, identical prediction) — decode returns NEAREST* modes."""
    rng = np.random.default_rng(11)
    w = h = 64
    p = FrameParams(width=w, height=h, qindex=100, frame_is_intra=False,
                    reference_select=1, ref_hints=(0, 1, 1, 1, 1, 9, 9, 9),
                    order_hint=5)
    aw, ah = p.aligned_width, p.aligned_height
    refs = _mk_refs(rng, aw, ah)
    plan = Plan()
    plan.partitions[(0, 0, int(BlockSize.BLOCK_64X64))] = 3
    # first two blocks establish neighbor MVs; the bottom blocks repeat them
    specs = [
        ((0, 0), dict(y_mode=int(InterMode.NEWMV), ref_frame=1, mv=(4, -8), skip=1)),
        ((0, 8), dict(y_mode=int(InterMode.NEW_NEWMV), ref_frame=1, ref_frame1=7,
                      mv=(2, 6), mv1=(-4, 2), skip=1)),
        ((8, 0), dict(y_mode=int(InterMode.NEWMV), ref_frame=1, mv=(4, -8), skip=1)),
        ((8, 8), dict(y_mode=int(InterMode.NEW_NEWMV), ref_frame=1, ref_frame1=7,
                      mv=(2, 6), mv1=(-4, 2), skip=1)),
    ]
    for (mi_row, mi_col), kw in specs:
        plan.partitions[(mi_row, mi_col, int(BlockSize.BLOCK_32X32))] = 0
        plan.blocks[(mi_row, mi_col, int(BlockSize.BLOCK_32X32))] = BlockDecision(**kw)
    payload, recon, td = _round_trip(p, plan, refs, aw, ah)
    assert int(td.mi.mode[8, 0]) == int(InterMode.NEARESTMV)
    assert int(td.mi.mode[8, 8]) == int(InterMode.NEAREST_NEARESTMV)
    # identical predictions regardless of the downgrade
    for plane in range(3):
        ss = 0 if plane == 0 else 1
        n = 32 >> ss
        want = _compound_pred(refs, 1, 7, (2, 6), (-4, 2), (8 * 4) >> ss,
                              (8 * 4) >> ss, n, n, plane)
        got = recon[plane][(8 * 4) >> ss : ((8 * 4) >> ss) + n,
                           (8 * 4) >> ss : ((8 * 4) >> ss) + n]
        assert np.array_equal(got, want), plane
