"""Device (JAX) twin of the deblocking loop filter (filters/dlf.py).

Bit-exact batched port of the vectorized numpy DLF: planes carry a leading
frame dimension (F, H, W) so a whole all-intra batch filters in one program.
Filter-length maps are built on host from per-8px-cell block-size maps (the
intra-frame specialization of dlf._edge_maps_vertical: no inter-skip
shortcut, so an edge filters iff it is a transform edge) and shipped as
small int8 tensors.

Write-order semantics mirror dlf._filter_vertical_edges exactly (same
offset-sorted column stores), so device and host recon stay bit-identical.
"""
from __future__ import annotations

import numpy as np

from ..constants.av1 import MAX_TXSIZE_RECT, TX_W
from .dlf import _limits, pick_filter_levels  # noqa: F401 (re-exported)


def size_map_tx_w(size_map: np.ndarray, plane: int) -> np.ndarray:
    """Per-8px-cell tx width in plane samples. size_map holds luma block
    sizes (8/16/32/64); luma tx = block size (TX_MODE_LARGEST), chroma tx
    width = clip(n/2, 4, 32)."""
    if plane == 0:
        return size_map.astype(np.int32)
    return np.clip(size_map.astype(np.int32) >> 1, 4, 32)


def flen_maps_from_sizes(size_map: np.ndarray, plane: int, transpose: bool) -> np.ndarray:
    """(F, mi4_rows, K) filter-length map for vertical edges (columns at
    x = 4(k+1) plane samples) of one plane, for ALL-INTRA frames.

    size_map: (F, R8, C8) luma block size per 8px cell. transpose=True
    builds the map for the horizontal pass (rows/cols swapped)."""
    sm = np.swapaxes(size_map, 1, 2) if transpose else size_map
    F, R8, C8 = sm.shape
    ss = 0 if plane == 0 else 1
    # plane dims in samples
    pw = C8 * (8 >> ss)
    ph = R8 * (8 >> ss)
    n_rows = ph // 4
    K = pw // 4 - 1
    tw = size_map_tx_w(sm, plane)  # (F, R8, C8) tx width per cell
    x = (np.arange(1, K + 1)) * 4  # edge columns (plane samples)
    cell = x // (8 >> ss)  # right cell (the current block)
    # 4/6-tap chroma edges can sit mid-cell only for 4-wide tx; luma tx >= 8
    # so mid-cell luma edges never filter. cell == x// for boundary edges.
    mid_cell = (x % (8 >> ss)) != 0
    prev_cell = np.where(mid_cell, cell, np.maximum(cell - 1, 0))
    tw_c = tw[:, :, cell]  # (F, R8, K)
    tw_p = tw[:, :, prev_cell]
    is_tx_edge = (x[None, None, :] % tw_c) == 0
    min_tw = np.minimum(tw_c, tw_p)
    if plane == 0:
        f = np.where(min_tw == 4, 4, np.where(min_tw == 8, 8, 14))
    else:
        f = np.where(min_tw == 4, 4, 6)
    flen_band = np.where(is_tx_edge, f, 0).astype(np.int8)  # per 8px row band
    reps = (8 >> ss) // 4  # band rows -> 4-sample rows
    return np.repeat(flen_band, reps, axis=1)[:, :n_rows]


def filter_vertical_edges_j(planes, flen4, lim: int, blim: int, thr: int, bd: int = 8):
    """jnp twin of dlf._filter_vertical_edges over (F, H, W) planes.

    flen4: (F, H//4, K) int filter lengths for edge columns x = 4(k+1).
    Returns the filtered planes (functional)."""
    import jax.numpy as jnp

    F, H, W = planes.shape
    K = flen4.shape[2]
    if K == 0:
        return planes
    sh = bd - 8
    lim, blim, thr = lim << sh, blim << sh, thr << sh
    half = 128 << sh
    fthr = 1 << sh

    def clip8(v):
        return jnp.clip(v, -half, half - 1)

    flen_s = jnp.repeat(flen4.astype(jnp.int32), 4, axis=1)[:, :H]  # (F, H, K)
    cols = (np.arange(K) + 1) * 4

    def col(off):
        return planes[:, :, np.clip(cols + off, 0, W - 1)].astype(jnp.int32)

    p = [col(-1 - i) for i in range(7)]
    q = [col(i) for i in range(7)]

    def narrow(mask):
        ps1, ps0 = p[1] - half, p[0] - half
        qs0, qs1 = q[0] - half, q[1] - half
        hev = (jnp.abs(p[1] - p[0]) > thr) | (jnp.abs(q[1] - q[0]) > thr)
        f = clip8(ps1 - qs1) * hev
        f = clip8(f + 3 * (qs0 - ps0)) * mask
        f1 = clip8(f + 4) >> 3
        f2 = clip8(f + 3) >> 3
        oq0 = clip8(qs0 - f1) + half
        op0 = clip8(ps0 + f2) + half
        t = ((f1 + 1) >> 1) * (~hev)
        oq1 = clip8(qs1 - t) + half
        op1 = clip8(ps1 + t) + half
        return op1, op0, oq0, oq1

    def fmask2():
        return ((jnp.abs(p[1] - p[0]) <= lim) & (jnp.abs(q[1] - q[0]) <= lim) &
                (jnp.abs(p[0] - q[0]) * 2 + jnp.abs(p[1] - q[1]) // 2 <= blim))

    def fmask3():
        return fmask2() & (jnp.abs(p[2] - p[1]) <= lim) & (jnp.abs(q[2] - q[1]) <= lim)

    def fmask_full():
        return fmask3() & (jnp.abs(p[3] - p[2]) <= lim) & (jnp.abs(q[3] - q[2]) <= lim)

    def flat_n(nn):
        m = (jnp.abs(p[1] - p[0]) <= fthr) & (jnp.abs(q[1] - q[0]) <= fthr)
        for i in range(2, nn):
            m &= (jnp.abs(p[i] - p[0]) <= fthr) & (jnp.abs(q[i] - q[0]) <= fthr)
        return m

    r2 = lambda v, s: (v + (1 << (s - 1))) >> s

    sel4 = flen_s == 4
    sel6 = flen_s == 6
    sel8 = flen_s == 8
    sel14 = flen_s == 14

    out = {}  # off -> (F, H, K) values to store (mirrors numpy `out`)

    def base(off):
        return p[-off - 1] if off < 0 else q[off]

    # class 4
    m4 = fmask2() & sel4
    n4 = narrow(m4)
    for off, v in zip((-2, -1, 0, 1), n4):
        out[off] = jnp.where(sel4, v, base(off))

    # class 6
    mask6 = fmask3() & sel6
    flat6 = flat_n(3) & mask6
    n6 = narrow(mask6 & ~flat6)
    l6 = {-2: r2(p[2] * 3 + p[1] * 2 + p[0] * 2 + q[0], 3),
          -1: r2(p[2] + p[1] * 2 + p[0] * 2 + q[0] * 2 + q[1], 3),
          0: r2(p[1] + p[0] * 2 + q[0] * 2 + q[1] * 2 + q[2], 3),
          1: r2(p[0] + q[0] * 2 + q[1] * 2 + q[2] * 3, 3)}
    for off, nar in zip((-2, -1, 0, 1), n6):
        prev = out.get(off, base(off))
        out[off] = jnp.where(sel6, jnp.where(flat6, l6[off], nar), prev)

    # class 8
    mask8 = fmask_full() & sel8
    flat8 = flat_n(4) & mask8
    n8 = dict(zip((-2, -1, 0, 1), narrow(mask8 & ~flat8)))
    l8 = {-3: r2(p[3] * 3 + p[2] * 2 + p[1] + p[0] + q[0], 3),
          -2: r2(p[3] * 2 + p[2] + p[1] * 2 + p[0] + q[0] + q[1], 3),
          -1: r2(p[3] + p[2] + p[1] + p[0] * 2 + q[0] + q[1] + q[2], 3),
          0: r2(p[2] + p[1] + p[0] + q[0] * 2 + q[1] + q[2] + q[3], 3),
          1: r2(p[1] + p[0] + q[0] + q[1] * 2 + q[2] + q[3] * 2, 3),
          2: r2(p[0] + q[0] + q[1] + q[2] * 2 + q[3] * 3, 3)}
    for off in range(-3, 3):
        v = jnp.where(flat8, l8[off], n8.get(off, base(off)))
        prev = out.get(off, base(off))
        out[off] = jnp.where(sel8, v, prev)

    # class 14
    mask14 = fmask_full() & sel14
    flat14 = flat_n(4) & mask14
    flat2 = ((jnp.abs(p[6] - p[0]) <= fthr) & (jnp.abs(p[5] - p[0]) <= fthr) &
             (jnp.abs(p[4] - p[0]) <= fthr) & (jnp.abs(q[4] - q[0]) <= fthr) &
             (jnp.abs(q[5] - q[0]) <= fthr) & (jnp.abs(q[6] - q[0]) <= fthr) &
             (jnp.abs(p[1] - p[0]) <= fthr) & (jnp.abs(q[1] - q[0]) <= fthr)) & flat14
    n14 = dict(zip((-2, -1, 0, 1), narrow(mask14 & ~flat14)))
    l8b = {-3: l8[-3], -2: l8[-2], -1: l8[-1], 0: l8[0], 1: l8[1], 2: l8[2]}
    l14 = {
        -6: r2(p[6] * 7 + p[5] * 2 + p[4] * 2 + p[3] + p[2] + p[1] + p[0] + q[0], 4),
        -5: r2(p[6] * 5 + p[5] * 2 + p[4] * 2 + p[3] * 2 + p[2] + p[1] + p[0] + q[0] + q[1], 4),
        -4: r2(p[6] * 4 + p[5] + p[4] * 2 + p[3] * 2 + p[2] * 2 + p[1] + p[0] + q[0] + q[1] + q[2], 4),
        -3: r2(p[6] * 3 + p[5] + p[4] + p[3] * 2 + p[2] * 2 + p[1] * 2 + p[0] + q[0] + q[1] + q[2] + q[3], 4),
        -2: r2(p[6] * 2 + p[5] + p[4] + p[3] + p[2] * 2 + p[1] * 2 + p[0] * 2 + q[0] + q[1] + q[2] + q[3] + q[4], 4),
        -1: r2(p[6] + p[5] + p[4] + p[3] + p[2] + p[1] * 2 + p[0] * 2 + q[0] * 2 + q[1] + q[2] + q[3] + q[4] + q[5], 4),
        0: r2(p[5] + p[4] + p[3] + p[2] + p[1] + p[0] * 2 + q[0] * 2 + q[1] * 2 + q[2] + q[3] + q[4] + q[5] + q[6], 4),
        1: r2(p[4] + p[3] + p[2] + p[1] + p[0] + q[0] * 2 + q[1] * 2 + q[2] * 2 + q[3] + q[4] + q[5] + q[6] * 2, 4),
        2: r2(p[3] + p[2] + p[1] + p[0] + q[0] + q[1] * 2 + q[2] * 2 + q[3] * 2 + q[4] + q[5] + q[6] * 3, 4),
        3: r2(p[2] + p[1] + p[0] + q[0] + q[1] + q[2] * 2 + q[3] * 2 + q[4] * 2 + q[5] + q[6] * 4, 4),
        4: r2(p[1] + p[0] + q[0] + q[1] + q[2] + q[3] * 2 + q[4] * 2 + q[5] * 2 + q[6] * 5, 4),
        5: r2(p[0] + q[0] + q[1] + q[2] + q[3] + q[4] * 2 + q[5] * 2 + q[6] * 7, 4),
    }
    for off in range(-6, 6):
        orig = base(off)
        v = jnp.where(flat2, l14[off], jnp.where(flat14, l8b.get(off, orig), n14.get(off, orig)))
        prev = out.get(off, orig)
        out[off] = jnp.where(sel14, v, prev)

    # masked-by-class stores (matches dlf._filter_vertical_edges: lanes not
    # belonging to a filter class never write their column)
    def classmask(off):
        m = sel14
        if -3 <= off <= 2:
            m = m | sel8
        if -2 <= off <= 1:
            m = m | sel4 | sel6
        return m

    for off in sorted(out):
        tcols = cols + off
        valid = (tcols >= 0) & (tcols < W)
        vals = jnp.where(classmask(off), out[off], planes[:, :, np.clip(tcols, 0, W - 1)])
        if not valid.all():
            planes = planes.at[:, :, tcols[valid]].set(vals[:, :, valid])
        else:
            planes = planes.at[:, :, tcols].set(vals)
    return planes


def loop_filter_frames_j(planes, size_map: np.ndarray, levels: tuple, sharpness: int,
                         bd: int = 8):
    """Device DLF over a batch: planes [y (F,H,W), u, v] jnp int32 arrays,
    size_map (F, R8, C8) numpy. Returns new [y, u, v] (functional)."""
    import jax.numpy as jnp

    out = []
    for plane in range(3):
        pl = planes[plane]
        lvl_v = levels[0] if plane == 0 else levels[plane + 1]
        lvl_h = levels[1] if plane == 0 else levels[plane + 1]
        if lvl_v:
            lim, blim, thr = _limits(lvl_v, sharpness)
            flen = jnp.asarray(flen_maps_from_sizes(size_map, plane, False))
            pl = filter_vertical_edges_j(pl, flen, lim, blim, thr, bd)
        if lvl_h:
            lim, blim, thr = _limits(lvl_h, sharpness)
            flen = jnp.asarray(flen_maps_from_sizes(size_map, plane, True))
            plT = jnp.swapaxes(pl, 1, 2)
            plT = filter_vertical_edges_j(plT, flen, lim, blim, thr, bd)
            pl = jnp.swapaxes(plT, 1, 2)
        out.append(pl)
    return out
