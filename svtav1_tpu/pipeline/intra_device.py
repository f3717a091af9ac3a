"""Device (JAX/TPU) intra encoder: batched wavefront over 32x32 blocks.

TPU-first re-architecture of the reference's wavefront EncDec
(enc_dec_process.c:3270 + enc_dec_segments.h dependency maps): instead of
worker threads claiming segments, the whole frame is encoded by one XLA
program that runs a `lax.fori_loop` over block anti-diagonals; every block on
a diagonal is processed in parallel (batched edges -> 7 intra predictions ->
integer transform/quant/recon -> RD select), and recon is scattered back for
the next diagonal. All shapes static; masked lanes handle ragged diagonals.

v1 profile: uniform 32x32 luma blocks (16x16 chroma, DC chroma mode).
Frame strips not divisible by 32 fall back to the numpy MD for the edge
blocks only (interior stays on device).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.tile_codec import BlockDecision, FrameParams, Plan
from ..constants.av1 import BlockSize, Partition, PredMode, TxType
from ..ops import quantize as quant_ops
from ..ops import transforms_jax as TJ
from . import intra_md

MODES = [int(m) for m in intra_md.MODES]  # DC,V,H,SMOOTH,SMOOTH_V,SMOOTH_H,PAETH
B64, B32, B16 = int(BlockSize.BLOCK_64X64), int(BlockSize.BLOCK_32X32), int(BlockSize.BLOCK_16X16)


def _smooth_weights(n: int) -> np.ndarray:
    from ..ops.intra import SM_WEIGHTS

    return SM_WEIGHTS[n]


def _predict_modes(above, left, topleft, have_above, have_left, n: int):
    """above (B, n), left (B, n), topleft (B,), have_* (B,) bool ->
    (B, 7, n, n) predictions for MODES order. Edges are already filled per
    the availability rules; DC still needs the flags for its average."""
    B = above.shape[0]
    ha = have_above.astype(jnp.int32)
    hl = have_left.astype(jnp.int32)
    sa = jnp.sum(above, axis=1)
    sl = jnp.sum(left, axis=1)
    log2n = int(math.log2(n))
    dc_both = (sa + sl + n) >> (log2n + 1)
    dc_a = (sa + (n >> 1)) >> log2n
    dc_l = (sl + (n >> 1)) >> log2n
    dc = jnp.where(ha & hl, dc_both, jnp.where(ha, dc_a, jnp.where(hl, dc_l, 128)))
    dc_pred = jnp.broadcast_to(dc[:, None, None], (B, n, n))

    t = above[:, None, :]
    l = left[:, :, None]
    tl = topleft[:, None, None]
    v_pred = jnp.broadcast_to(t, (B, n, n))
    h_pred = jnp.broadcast_to(l, (B, n, n))

    base = t + l - tl
    pt, pl_, ptl = jnp.abs(base - t), jnp.abs(base - l), jnp.abs(base - tl)
    use_l = (pl_ <= pt) & (pl_ <= ptl)
    use_t = pt <= ptl
    paeth = jnp.where(use_l, l + 0 * pt, jnp.where(use_t, t + 0 * pl_, tl + 0 * pt))

    wn = jnp.asarray(_smooth_weights(n), jnp.int32)
    wh = wn[None, :, None]
    ww = wn[None, None, :]
    below = left[:, -1, None, None]
    right = above[:, -1, None, None]
    smooth = (wh * t + (256 - wh) * below + ww * l + (256 - ww) * right + 256) >> 9
    smooth_v = jnp.broadcast_to((wh * t + (256 - wh) * below + 128) >> 8, (B, n, n))
    smooth_h = jnp.broadcast_to((ww * l + (256 - ww) * right + 128) >> 8, (B, n, n))

    return jnp.stack([dc_pred, v_pred, h_pred, smooth, smooth_v, smooth_h, paeth], axis=1)


def _gather_edges(plane, ys, xs, n: int, bd: int):
    """Batched edge construction from the recon plane.

    ys/xs: (B,) pixel origins (clamped valid). Returns above (B,n), left
    (B,n), topleft (B,), have_above, have_left. Interior blocks only (no
    frame-right replication needed)."""
    base = 1 << (bd - 1)
    have_above = ys > 0
    have_left = xs > 0

    def one(y, x):
        arow = jax.lax.dynamic_slice(plane, (jnp.maximum(y - 1, 0), x), (1, n))[0]
        lcol = jax.lax.dynamic_slice(plane, (y, jnp.maximum(x - 1, 0)), (n, 1))[:, 0]
        tl = jax.lax.dynamic_slice(plane, (jnp.maximum(y - 1, 0), jnp.maximum(x - 1, 0)), (1, 1))[0, 0]
        return arow, lcol, tl

    above, left, tl = jax.vmap(one)(ys, xs)
    # availability fills (reference enc_intra_prediction.c:124-183)
    left_fill = jnp.where(have_above, above[:, 0], base + 1)
    above_fill = jnp.where(have_left, left[:, 0], base - 1)
    above = jnp.where(have_above[:, None], above, above_fill[:, None])
    left = jnp.where(have_left[:, None], left, left_fill[:, None])
    tl = jnp.where(have_above & have_left, tl,
                   jnp.where(have_above, above[:, 0], jnp.where(have_left, left[:, 0], base)))
    return above, left, tl, have_above, have_left


def _rate_proxy(levels):
    """Crude bit estimate matching intra_md's (nz*3 + 2*log2(1+|sum|))."""
    nz = jnp.sum((levels != 0).astype(jnp.float32), axis=(-2, -1))
    mag = jnp.sum(jnp.abs(levels).astype(jnp.float32), axis=(-2, -1))
    return 2.0 + nz * 3.0 + 2.0 * jnp.log2(1.0 + mag)


@functools.partial(jax.jit, static_argnames=("R", "C", "qindex", "bd", "lam"))
def _encode32_device(src_y, src_u, src_v, R: int, C: int, qindex: int, bd: int, lam: float):
    """Wavefront encode of the (R x C) grid of 32x32 blocks.

    Returns (recon_y, recon_u, recon_v, modes (R,C), skip (R,C),
    levels_y (R,C,32,32), levels_u, levels_v)."""
    dq_dc, dq_ac = quant_ops.dc_q(qindex, bd), quant_ops.ac_q(qindex, bd)
    BMAX = min(R, C)
    n_diag = R + C - 1

    def block_batch(d, recon, n, src, dq_scale_ls, lam_, fixed_dc):
        """Process diagonal d for one plane size n (32 luma / 16 chroma)."""
        # block indices along the diagonal
        k = jnp.arange(BMAX)
        r = jnp.minimum(d, R - 1) - k
        c = d - r
        valid = (r >= 0) & (r < R) & (c >= 0) & (c < C)
        rs = jnp.clip(r, 0, R - 1)
        cs = jnp.clip(c, 0, C - 1)
        ys, xs = rs * n, cs * n
        above, left, tl, ha, hl = _gather_edges(recon, ys, xs, n, bd)
        preds = _predict_modes(above, left, tl, ha, hl, n)  # (B,7,n,n)
        if fixed_dc:
            preds = preds[:, :1]
        src_blk = jax.vmap(lambda y, x: jax.lax.dynamic_slice(src, (y, x), (n, n)))(ys, xs)
        resid = src_blk[:, None] - preds  # (B,M,n,n)
        coeff = TJ.fwd_txfm2d_j(resid, int(TxType.DCT_DCT), bd)
        lv = TJ.quantize_j(coeff, dq_dc, dq_ac, dq_scale_ls)
        dqc = TJ.dequantize_j(lv, dq_dc, dq_ac, dq_scale_ls, bd)
        rec = TJ.inv_txfm2d_add_j(dqc, preds, int(TxType.DCT_DCT), bd)
        sse = jnp.sum((rec - src_blk[:, None]).astype(jnp.float32) ** 2, axis=(-2, -1))
        cost = sse + lam_ * _rate_proxy(lv)
        best = jnp.argmin(cost, axis=1)  # (B,)
        bi = jnp.arange(BMAX)
        best_lv = lv[bi, best]
        best_rec = rec[bi, best]
        # scatter recon; masked lanes get an out-of-bounds row (-1 would WRAP
        # under numpy semantics) so mode="drop" discards them
        oob = recon.shape[0]
        row_idx = jnp.where(valid[:, None, None], ys[:, None, None] + jnp.arange(n)[None, :, None], oob)
        col_idx = xs[:, None, None] + jnp.arange(n)[None, None, :]
        recon = recon.at[row_idx, col_idx].set(best_rec, mode="drop")
        return recon, best, best_lv, rs, cs, valid

    def body(d, carry):
        recon_y, recon_u, recon_v, modes, skip, ly, lu, lvv = carry
        recon_y, best, blv, rs, cs, valid = block_batch(d, recon_y, 32, src_y, 1, lam, False)
        modes = modes.at[rs, cs].set(jnp.where(valid, best, modes[rs, cs]), mode="drop")
        ly = ly.at[rs, cs].set(jnp.where(valid[:, None, None], blv, ly[rs, cs]), mode="drop")
        recon_u, _, ulv, _, _, _ = block_batch(d, recon_u, 16, src_u, 0, lam, True)
        recon_v, _, vlv, _, _, _ = block_batch(d, recon_v, 16, src_v, 0, lam, True)
        lu = lu.at[rs, cs].set(jnp.where(valid[:, None, None], ulv, lu[rs, cs]), mode="drop")
        lvv = lvv.at[rs, cs].set(jnp.where(valid[:, None, None], vlv, lvv[rs, cs]), mode="drop")
        nz = (jnp.sum(jnp.abs(blv), (-2, -1)) + jnp.sum(jnp.abs(ulv), (-2, -1)) + jnp.sum(jnp.abs(vlv), (-2, -1))) == 0
        skip = skip.at[rs, cs].set(jnp.where(valid, nz.astype(jnp.int32), skip[rs, cs]), mode="drop")
        return recon_y, recon_u, recon_v, modes, skip, ly, lu, lvv

    # derive zeros from the input so the carry keeps the input's device-varying
    # type under shard_map (replicated literals would break the scan carry)
    z = src_y[0, 0] * 0
    carry = (
        src_y * 0, src_u * 0, src_v * 0,
        jnp.zeros((R, C), jnp.int32) + z, jnp.zeros((R, C), jnp.int32) + z,
        jnp.zeros((R, C, 32, 32), jnp.int32) + z, jnp.zeros((R, C, 16, 16), jnp.int32) + z,
        jnp.zeros((R, C, 16, 16), jnp.int32) + z,
    )
    return jax.lax.fori_loop(0, n_diag, body, carry)


def encode_intra_frame(src_planes: list, params: FrameParams) -> tuple[Plan, list]:
    """Device MD for the 32-aligned interior; numpy MD for edge strips."""
    p = params
    aw, ah = p.aligned_width, p.aligned_height
    C, R = aw // 32, ah // 32
    assert R >= 1 and C >= 1, "frame too small for device path"
    lam = intra_md.rd_lambda(p.qindex, p.bd)

    sy = jnp.asarray(src_planes[0])
    su = jnp.asarray(src_planes[1])
    sv = jnp.asarray(src_planes[2])
    # device operates on the 32-aligned interior region
    iw, ih = C * 32, R * 32
    out = _encode32_device(sy[:ih, :iw], su[: ih // 2, : iw // 2], sv[: ih // 2, : iw // 2],
                           R, C, p.qindex, p.bd, float(lam))
    recon_y, recon_u, recon_v, modes, skip, ly, lu, lv = (np.asarray(x) for x in out)

    recon = [np.zeros_like(pl) for pl in src_planes]
    recon[0][:ih, :iw] = recon_y
    recon[1][: ih // 2, : iw // 2] = recon_u
    recon[2][: ih // 2, : iw // 2] = recon_v

    plan = Plan()
    # assemble partition tree: every 64x64 node splits to 32x32 NONE leaves
    for sb_y in range(0, ah, 64):
        for sb_x in range(0, aw, 64):
            plan.partitions[(sb_y // 4, sb_x // 4, B64)] = int(Partition.PARTITION_SPLIT)
    for r in range(R):
        for c in range(C):
            mi_row, mi_col = r * 8, c * 8
            sk = int(skip[r, c])
            plan.partitions[(mi_row, mi_col, B32)] = int(Partition.PARTITION_NONE)
            plan.blocks[(mi_row, mi_col, B32)] = BlockDecision(
                y_mode=MODES[int(modes[r, c])], uv_mode=int(PredMode.DC_PRED), skip=sk,
                tx_type=int(TxType.DCT_DCT),
                levels_y=None if sk else ly[r, c].copy(),
                levels_u=None if sk else lu[r, c].copy(),
                levels_v=None if sk else lv[r, c].copy(),
            )

    # edge strips (if dims not 32-divisible): numpy MD continues on the same
    # recon state, coding 32-blocks that overhang via recursive splits
    if iw < aw or ih < ah:
        ctx = intra_md._Ctx(params=p, src=src_planes, recon=recon, plan=plan, lam=lam)
        for y in range(0, ih, 32):  # right strip
            for x in range(iw, aw, 32):
                intra_md._code_square(ctx, x, y, 32)
        for y in range(ih, ah, 32):  # bottom strip (full width)
            for x in range(0, aw, 32):
                intra_md._code_square(ctx, x, y, 32)
    return plan, recon
