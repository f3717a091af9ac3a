"""Shared intra-prediction device kernels + mode tables.

Batched normative intra predictions for the unified device pipeline
(pipeline/device_decide + device_commit): one lane per block, all 13 modes
evaluated together (intra_prediction.c svt_av1_intra_prediction_cl analog,
batched). The r1 standalone grid encoder that used to live here was
superseded by the decide/commit pipeline and removed.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..constants.av1 import BlockSize, PredMode
from . import intra_md

MODES = [int(m) for m in intra_md.MODES]  # DC,V,H,SMOOTH,SMOOTH_V,SMOOTH_H,PAETH
B64, B32, B16, B8 = (int(BlockSize.BLOCK_64X64), int(BlockSize.BLOCK_32X32),
                     int(BlockSize.BLOCK_16X16), int(BlockSize.BLOCK_8X8))
BSIZE_BY_N = {8: B8, 16: B16, 32: B32, 64: B64}


def _smooth_weights(n: int) -> np.ndarray:
    from ..ops.intra import SM_WEIGHTS

    return SM_WEIGHTS[n]


def _predict_modes(above, left, topleft, have_above, have_left, n: int, dc_only: bool = False,
                   nmodes: int = 13):
    """above/left (B, n), topleft (B,) -> (B, nmodes|1, n, n) in MODES order.
    nmodes=7 stops before the directional modes (the inter decide's reduced
    intra candidate class — mirrors the reference's restricted intra
    injection in inter frames, mode_decision.c candidate classes)."""
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
    if nmodes > 7:
        # true-directional modes D45,D135,D113,D157,D203,D67 with REPLICATED
        # extensions (offered only where has_tr/has_bl are false, so the
        # decoder reproduces the same replicated edges)
        from ..ops.intra import MODE_ANGLE, dr_pred
        from ..constants.av1 import PredMode as _PM

        above_ext = jnp.concatenate([above, jnp.broadcast_to(above[:, -1:], (B, n))], axis=1)
        left_ext = jnp.concatenate([left, jnp.broadcast_to(left[:, -1:], (B, n))], axis=1)
        for m in (_PM.D45_PRED, _PM.D135_PRED, _PM.D113_PRED, _PM.D157_PRED,
                  _PM.D203_PRED, _PM.D67_PRED):
            out.append(dr_pred(above_ext, left_ext, topleft, MODE_ANGLE[int(m)], n, n, xp=jnp))
    return jnp.stack(out[:nmodes], axis=1)


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
