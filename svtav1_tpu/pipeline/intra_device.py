"""Device (JAX/TPU) intra encoder: batched wavefront over fixed block grids.

TPU-first re-architecture of the reference's wavefront EncDec
(enc_dec_process.c:3270 + enc_dec_segments.h dependency maps): instead of
worker threads claiming segments, a whole block grid is encoded by one XLA
program running `lax.fori_loop` over block anti-diagonals; every block on a
diagonal is processed in parallel (batched edge gather -> 7 intra predictions
-> integer transform/quant/recon -> RD select), and recon is scattered back
for the next diagonal. All shapes static; masked lanes handle ragged
diagonals.

A frame = interior grid of 32x32 blocks + (if dims aren't 32-divisible)
right/bottom strips of 8x8 blocks, each strip encoded by the same device
kernel with an external border apron carrying neighbor recon pixels.
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
B64, B32, B16, B8 = (int(BlockSize.BLOCK_64X64), int(BlockSize.BLOCK_32X32),
                     int(BlockSize.BLOCK_16X16), int(BlockSize.BLOCK_8X8))
BSIZE_BY_N = {8: B8, 16: B16, 32: B32, 64: B64}


def _smooth_weights(n: int) -> np.ndarray:
    from ..ops.intra import SM_WEIGHTS

    return SM_WEIGHTS[n]


def _predict_modes(above, left, topleft, have_above, have_left, n: int, dc_only: bool = False):
    """above/left (B, n), topleft (B,) -> (B, 13|1, n, n) in MODES order."""
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
    if dc_only:
        return dc_pred[:, None]

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

    out = [dc_pred, v_pred, h_pred, smooth, smooth_v, smooth_h, paeth]
    # true-directional modes D45,D135,D113,D157,D203,D67 with REPLICATED
    # extensions (offered only where has_tr/has_bl are false, so the decoder
    # reproduces the same replicated edges)
    from ..ops.intra import MODE_ANGLE, dr_pred
    from ..constants.av1 import PredMode as _PM

    above_ext = jnp.concatenate([above, jnp.broadcast_to(above[:, -1:], (B, n))], axis=1)
    left_ext = jnp.concatenate([left, jnp.broadcast_to(left[:, -1:], (B, n))], axis=1)
    for m in (_PM.D45_PRED, _PM.D135_PRED, _PM.D113_PRED, _PM.D157_PRED, _PM.D203_PRED, _PM.D67_PRED):
        out.append(dr_pred(above_ext, left_ext, topleft, MODE_ANGLE[int(m)], n, n, xp=jnp))
    return jnp.stack(out, axis=1)


def _rate_proxy(levels):
    nz = jnp.sum((levels != 0).astype(jnp.float32), axis=(-2, -1))
    mag = jnp.sum(jnp.abs(levels).astype(jnp.float32), axis=(-2, -1))
    return 2.0 + nz * 3.0 + 2.0 * jnp.log2(1.0 + mag)


@functools.partial(jax.jit, static_argnames=("R", "C", "n", "qindex", "bd", "lam", "ext_top", "ext_left"))
def _encode_grid_device(src_y, src_u, src_v, top_y, top_u, top_v, left_y, left_u, left_v,
                        mode_penalty,
                        R: int, C: int, n: int, qindex: int, bd: int, lam: float,
                        ext_top: bool, ext_left: bool):
    """Wavefront encode of an (R x C) grid of n x n luma blocks.

    src_*: source planes (R*n x C*n luma; half-size chroma).
    top_* / left_*: external neighbor recon borders (used when ext_top /
    ext_left) of lengths C*n (+1 corner at left_*[0]... corner unused here).
    Returns (recon_y, recon_u, recon_v, modes, skip, levels_y, levels_u,
    levels_v)."""
    dq_dc, dq_ac = quant_ops.dc_q(qindex, bd), quant_ops.ac_q(qindex, bd)
    nc = n // 2
    ls_l = quant_ops.tx_scale(n, n)
    ls_c = quant_ops.tx_scale(nc, nc)
    BMAX = min(R, C)
    n_diag = R + C - 1

    def make_plane(src, top, left, m):
        """(1 + R*m, 1 + C*m) apron plane; apron row/col from external borders."""
        p = jnp.zeros((1 + R * m, 1 + C * m), jnp.int32) + src[0, 0] * 0
        p = p.at[0, 1:].set(top)
        p = p.at[1:, 0].set(left)
        return p

    def block_batch(d, recon, m, src, ls, lam_, fixed_dc, mode_penalty=None):
        k = jnp.arange(BMAX)
        r = jnp.minimum(d, R - 1) - k
        c = d - r
        valid = (r >= 0) & (r < R) & (c >= 0) & (c < C)
        rs = jnp.clip(r, 0, R - 1)
        cs = jnp.clip(c, 0, C - 1)
        ys, xs = 1 + rs * m, 1 + cs * m  # apron offset
        have_above = (rs > 0) | bool(ext_top)
        have_left = (cs > 0) | bool(ext_left)

        def one(y, x):
            arow = jax.lax.dynamic_slice(recon, (y - 1, x), (1, m))[0]
            lcol = jax.lax.dynamic_slice(recon, (y, x - 1), (m, 1))[:, 0]
            tl = jax.lax.dynamic_slice(recon, (y - 1, x - 1), (1, 1))[0, 0]
            return arow, lcol, tl

        above, left, tl = jax.vmap(one)(ys, xs)
        base = 1 << (bd - 1)
        left_fill = jnp.where(have_above, above[:, 0], base + 1)
        above_fill = jnp.where(have_left, left[:, 0], base - 1)
        above = jnp.where(have_above[:, None], above, above_fill[:, None])
        left = jnp.where(have_left[:, None], left, left_fill[:, None])
        tl = jnp.where(have_above & have_left, tl,
                       jnp.where(have_above, above[:, 0], jnp.where(have_left, left[:, 0], base)))

        preds = _predict_modes(above, left, tl, have_above, have_left, m, dc_only=bool(fixed_dc))
        src_blk = jax.vmap(lambda y, x: jax.lax.dynamic_slice(src, (y, x), (m, m)))(ys - 1, xs - 1)
        resid = src_blk[:, None] - preds
        coeff = TJ.fwd_txfm2d_j(resid, int(TxType.DCT_DCT), bd)
        lv = TJ.quantize_j(coeff, dq_dc, dq_ac, ls)
        lv = jnp.clip(lv, -32767, 32767)  # int16 transport; recon uses clamped
        dqc = TJ.dequantize_j(lv, dq_dc, dq_ac, ls, bd)
        rec = TJ.inv_txfm2d_add_j(dqc, preds, int(TxType.DCT_DCT), bd)
        sse = jnp.sum((rec - src_blk[:, None]).astype(jnp.float32) ** 2, axis=(-2, -1))
        cost = sse + lam_ * _rate_proxy(lv)
        if mode_penalty is not None:
            cost = cost + mode_penalty[rs, cs]
        best = jnp.argmin(cost, axis=1)
        bi = jnp.arange(BMAX)
        best_lv = lv[bi, best]
        best_rec = rec[bi, best]
        # masked lanes get an out-of-bounds row (-1 would wrap) -> dropped
        oob = recon.shape[0]
        row_idx = jnp.where(valid[:, None, None], ys[:, None, None] + jnp.arange(m)[None, :, None], oob)
        col_idx = xs[:, None, None] + jnp.arange(m)[None, None, :]
        recon = recon.at[row_idx, col_idx].set(best_rec, mode="drop")
        return recon, best, best_lv, rs, cs, valid

    def body(d, carry):
        recon_y, recon_u, recon_v, modes, skip, ly, lu, lvv = carry
        recon_y, best, blv, rs, cs, valid = block_batch(d, recon_y, n, src_y, ls_l, lam, False,
                                                        mode_penalty=mode_penalty)
        modes = modes.at[rs, cs].set(jnp.where(valid, best, modes[rs, cs]))
        ly = ly.at[rs, cs].set(jnp.where(valid[:, None, None], blv.astype(jnp.int16), ly[rs, cs]))
        recon_u, _, ulv, _, _, _ = block_batch(d, recon_u, nc, src_u, ls_c, lam, True)
        recon_v, _, vlv, _, _, _ = block_batch(d, recon_v, nc, src_v, ls_c, lam, True)
        lu = lu.at[rs, cs].set(jnp.where(valid[:, None, None], ulv.astype(jnp.int16), lu[rs, cs]))
        lvv = lvv.at[rs, cs].set(jnp.where(valid[:, None, None], vlv.astype(jnp.int16), lvv[rs, cs]))
        nz = (jnp.sum(jnp.abs(blv), (-2, -1)) + jnp.sum(jnp.abs(ulv), (-2, -1)) + jnp.sum(jnp.abs(vlv), (-2, -1))) == 0
        skip = skip.at[rs, cs].set(jnp.where(valid, nz.astype(jnp.int32), skip[rs, cs]))
        return recon_y, recon_u, recon_v, modes, skip, ly, lu, lvv

    # derive zeros from the input so the carry keeps the input's
    # device-varying type under shard_map
    z = src_y[0, 0] * 0
    carry = (
        make_plane(src_y, top_y, left_y, n),
        make_plane(src_u, top_u, left_u, nc),
        make_plane(src_v, top_v, left_v, nc),
        jnp.zeros((R, C), jnp.int32) + z, jnp.zeros((R, C), jnp.int32) + z,
        jnp.zeros((R, C, n, n), jnp.int16) + z.astype(jnp.int16),
        jnp.zeros((R, C, nc, nc), jnp.int16) + z.astype(jnp.int16),
        jnp.zeros((R, C, nc, nc), jnp.int16) + z.astype(jnp.int16),
    )
    out = jax.lax.fori_loop(0, n_diag, body, carry)
    # strip the apron off the recon planes
    return (out[0][1:, 1:], out[1][1:, 1:], out[2][1:, 1:]) + out[3:]


def _mode_penalty_grid(p, y0, x0, R, C, n, region, region_mi_end):
    """(R, C, 13) float32: +inf-like penalty for directional modes whose
    edge extensions the wavefront cannot provide (has_tr / has_bl true per
    spec -> decoder would read real pixels we don't schedule)."""
    from ..ops.intra import intra_has_bottom_left, intra_has_top_right

    bsize = BSIZE_BY_N[n]
    n4 = n // 4
    pen = np.zeros((R, C, 13), np.float32)
    BIG = 1e18
    for r in range(R):
        mi_row = (y0 + r * n) // 4
        ha = r > 0 or y0 > region[1]
        yd = p.mi_rows * 4 - (y0 + r * n + n)
        for c in range(C):
            mi_col = (x0 + c * n) // 4
            hl = c > 0 or x0 > region[0]
            right_av = (mi_col + n4) < region_mi_end[1]
            bottom_av = yd > 0 and (mi_row + n4) < region_mi_end[0]
            if intra_has_top_right(bsize, mi_row, mi_col, ha, right_av):
                pen[r, c, 7] = BIG   # D45
                pen[r, c, 12] = BIG  # D67
            if intra_has_bottom_left(bsize, mi_row, mi_col, bottom_av, hl):
                pen[r, c, 11] = BIG  # D203
    return pen


def _run_grid(src, recon, plan, p, y0: int, x0: int, R: int, C: int, n: int, lam: float,
              region=(0, 0), region_mi_end=None):
    """Encode one grid region on device and merge results into recon + plan.
    `region` is the enclosing tile's pixel origin: borders never cross it."""
    nc = n // 2
    iw, ih = C * n, R * n
    ext_top, ext_left = y0 > region[1], x0 > region[0]
    if region_mi_end is None:
        region_mi_end = (p.mi_rows, p.mi_cols)
    mode_penalty = jnp.asarray(_mode_penalty_grid(p, y0, x0, R, C, n, region, region_mi_end))
    sy = jnp.asarray(src[0][y0 : y0 + ih, x0 : x0 + iw])
    su = jnp.asarray(src[1][y0 // 2 : (y0 + ih) // 2, x0 // 2 : (x0 + iw) // 2])
    sv = jnp.asarray(src[2][y0 // 2 : (y0 + ih) // 2, x0 // 2 : (x0 + iw) // 2])

    def border_top(plane, yy0, xx0, w):
        if yy0 > 0:
            return jnp.asarray(plane[yy0 - 1, xx0 : xx0 + w])
        return jnp.zeros((w,), jnp.int32)

    def border_left(plane, yy0, xx0, h):
        if xx0 > 0:
            return jnp.asarray(plane[yy0 : yy0 + h, xx0 - 1])
        return jnp.zeros((h,), jnp.int32)

    ty = border_top(recon[0], y0, x0, iw)
    tu = border_top(recon[1], y0 // 2, x0 // 2, iw // 2)
    tv = border_top(recon[2], y0 // 2, x0 // 2, iw // 2)
    lyb = border_left(recon[0], y0, x0, ih)
    lub = border_left(recon[1], y0 // 2, x0 // 2, ih // 2)
    lvb = border_left(recon[2], y0 // 2, x0 // 2, ih // 2)

    out = _encode_grid_device(sy, su, sv, ty, tu, tv, lyb, lub, lvb, mode_penalty,
                              R, C, n, p.qindex, p.bd, lam, ext_top, ext_left)
    recon_y, recon_u, recon_v, modes, skip, ly, lu, lv = (np.asarray(x) for x in out)
    recon[0][y0 : y0 + ih, x0 : x0 + iw] = recon_y
    recon[1][y0 // 2 : (y0 + ih) // 2, x0 // 2 : (x0 + iw) // 2] = recon_u
    recon[2][y0 // 2 : (y0 + ih) // 2, x0 // 2 : (x0 + iw) // 2] = recon_v

    bsize = BSIZE_BY_N[n]
    plan.grids.append(dict(y0=y0, x0=x0, n=n, bsize=bsize, modes=modes, skip=skip, ly=ly, lu=lu, lv=lv))
    rows = (y0 + np.arange(R) * n) // 4
    cols = (x0 + np.arange(C) * n) // 4
    plan.leaves.update((int(rr), int(cc), bsize) for rr in rows for cc in cols)


def _assemble_partitions(plan: Plan, p: FrameParams) -> None:
    """Derive the partition decision for every visited square node from the
    leaf-block set (node == leaf -> NONE, else SPLIT)."""

    leaves = plan.leaves | set(plan.blocks.keys())

    def walk(mi_row, mi_col, bsize):
        if mi_row >= p.mi_rows or mi_col >= p.mi_cols:
            return
        if (mi_row, mi_col, bsize) in leaves:
            plan.partitions[(mi_row, mi_col, bsize)] = int(Partition.PARTITION_NONE)
            return
        plan.partitions[(mi_row, mi_col, bsize)] = int(Partition.PARTITION_SPLIT)
        half = {B64: 8, B32: 4, B16: 2}[bsize]
        sub = {B64: B32, B32: B16, B16: B8}[bsize]
        for dy in (0, half):
            for dx in (0, half):
                walk(mi_row + dy, mi_col + dx, sub)

    for sb_row in range(p.sb_rows):
        for sb_col in range(p.sb_cols):
            walk(sb_row * 16, sb_col * 16, B64)


def _encode_region(src, recon, plan, p, x0, y0, w, h, lam):
    """Encode one tile region: 32x32 interior + 8x8 right/bottom strips.
    The region is a prediction boundary (no external borders at its
    top-left; strips take borders from within the region)."""
    C, R = w // 32, h // 32
    iw, ih = C * 32, R * 32
    mi_end = (min((y0 + h) // 4, p.mi_rows), min((x0 + w) // 4, p.mi_cols))
    if R > 0 and C > 0:
        _run_grid(src, recon, plan, p, y0, x0, R, C, 32, lam, region=(x0, y0), region_mi_end=mi_end)
    if w > iw and ih > 0:  # right strip (8x8)
        _run_grid(src, recon, plan, p, y0, x0 + iw, ih // 8, (w - iw) // 8, 8, lam,
                  region=(x0, y0), region_mi_end=mi_end)
    if h > ih:  # bottom strip (8x8, full region width)
        _run_grid(src, recon, plan, p, y0 + ih, x0, (h - ih) // 8, w // 8, 8, lam,
                  region=(x0, y0), region_mi_end=mi_end)


def encode_intra_frame(src_planes: list, params: FrameParams) -> tuple[Plan, list]:
    """Device MD per tile: 32x32 interior + 8x8 edge strips, all on device."""
    p = params
    aw, ah = p.aligned_width, p.aligned_height
    lam = float(intra_md.rd_lambda(p.qindex, p.bd))
    recon = [np.zeros_like(pl) for pl in src_planes]
    plan = Plan()
    for (r0, r1, c0, c1) in p.tiles():
        x0, y0 = c0 * 64, r0 * 64
        w = min(c1 * 64, aw) - x0
        h = min(r1 * 64, ah) - y0
        _encode_region(src_planes, recon, plan, p, x0, y0, w, h, lam)
    _assemble_partitions(plan, p)
    return plan, recon
