"""Device (JAX) CDEF: batched direction search, frame-strength search and
filter application over a whole all-intra batch (F frames in one program).

Bit-exact integer twin of filters/cdef.py's apply path (the decoder re-runs
the numpy cdef_frame with the signaled strengths and must reproduce the
device output sample-for-sample). The encoder-side strength SEARCH differs
from the numpy path only in sampling: the device evaluates the candidate
ladder on EVERY non-skip unit (TPU batching makes exhaustive evaluation
cheaper than subsampling), mirroring enc_cdef.c cdef_seg_search's full-frame
accumulation.
"""
from __future__ import annotations

import numpy as np

from .cdef import (CDEF_DIRS, CDEF_VERY_LARGE, PRI_TAPS, SEC_TAPS, _CWEIGHTS, _PMATS,
                   SEARCH_CANDIDATES, pick_damping)


def _msb_j(v):
    import jax.numpy as jnp

    return jnp.where(v > 0, jnp.floor(jnp.log2(jnp.maximum(v, 1))).astype(jnp.int32), 0)


def find_dir_j(cells):
    """cells: (..., 8, 8) int32 luma samples already >> coeff_shift.
    Returns (dirs, vars) int32 — EXACT twin of cdef.find_dir_batch.

    The per-direction costs exceed int32 (and TPUs have no int64), so each
    cost is kept as a split accumulator (hi, lo) with lo < 2^16-scaled terms;
    argmax and the variance subtraction are done on the exact pair."""
    import jax.numpy as jnp

    x = cells.reshape(cells.shape[:-2] + (64,)).astype(jnp.int32) - 128
    his, los = [], []
    for d in range(8):
        partial = x @ jnp.asarray(_PMATS[d], jnp.int32)  # |.| <= 1024
        t = partial * partial * jnp.asarray(_CWEIGHTS[d], jnp.int32)  # <= 881e6
        hi = jnp.sum(t >> 16, axis=-1)
        lo = jnp.sum(t & 0xFFFF, axis=-1)  # <= 15 * 65535 < 2^20
        hi = hi + (lo >> 16)
        lo = lo & 0xFFFF
        his.append(hi)
        los.append(lo)
    # first-index-wins argmax over the exact (hi, lo) pairs (np.argmax tie rule)
    best_d = jnp.zeros_like(his[0])
    best_hi, best_lo = his[0], los[0]
    for d in range(1, 8):
        take = (his[d] > best_hi) | ((his[d] == best_hi) & (los[d] > best_lo))
        best_d = jnp.where(take, d, best_d)
        best_hi = jnp.where(take, his[d], best_hi)
        best_lo = jnp.where(take, los[d], best_lo)
    hi_s = jnp.stack(his, axis=-1)
    lo_s = jnp.stack(los, axis=-1)
    od = ((best_d + 4) & 7)[..., None]
    opp_hi = jnp.take_along_axis(hi_s, od, axis=-1)[..., 0]
    opp_lo = jnp.take_along_axis(lo_s, od, axis=-1)[..., 0]
    d_hi = best_hi - opp_hi
    d_lo = best_lo - opp_lo
    borrow = (d_lo < 0).astype(jnp.int32)
    d_lo = d_lo + (borrow << 16)
    d_hi = d_hi - borrow
    var = (d_hi << 6) + (d_lo >> 10)  # exact (best - opp) >> 10
    return best_d.astype(jnp.int32), var.astype(jnp.int32)


def _adjust_strength_j(strength, var):
    import jax.numpy as jnp

    i = jnp.where((var >> 6) > 0, jnp.minimum(_msb_j(var >> 6), 12), 0)
    return jnp.where(var != 0, (strength * (4 + i) + 8) >> 4, 0)


def _filter_cells_j(plane, ys, xs, m, dirs, pri, sec, pri_damping, sec_damping,
                    coeff_shift: int = 0):
    """Unit filter over an (F, NU) grid of m x m cells of (F, H, W) `plane`.

    ys/xs: (NU,) cell origins (shared across frames); dirs/pri: (F, NU);
    sec: (F, 1) or scalar. Returns (F, NU, m, m) filtered cells. Bit-exact
    twin of cdef._apply_taps + _gather_taps."""
    import jax.numpy as jnp

    F = plane.shape[0]
    B = 2
    P = jnp.pad(plane, ((0, 0), (B, B), (B, B)), constant_values=CDEF_VERY_LARGE)
    ii = np.arange(m)[None, :, None]
    jj = np.arange(m)[None, None, :]
    Y = (ys[:, None, None] + ii + B)[None]  # (1, NU, m, m)
    X = (xs[:, None, None] + jj + B)[None]
    fi = jnp.arange(F)[:, None, None, None]
    x0 = P[fi, Y, X]
    d0 = jnp.asarray(CDEF_DIRS)[dirs]  # (F, NU, 2, 2)
    d_p2 = jnp.asarray(CDEF_DIRS)[(dirs + 2) & 7]
    d_m2 = jnp.asarray(CDEF_DIRS)[(dirs - 2) & 7]
    pri_b = pri[..., None, None]
    sec_b = jnp.asarray(sec, jnp.int32).reshape(-1, 1, 1, 1)

    def constrain(diff, s, damping):
        shift = jnp.maximum(0, damping - _msb_j(s))
        ad = jnp.abs(diff)
        mag = jnp.minimum(ad, jnp.maximum(0, s - (ad >> shift)))
        return jnp.sign(diff) * jnp.where(s > 0, mag, 0)

    taps_sel = (pri >> coeff_shift) & 1
    sum_ = jnp.zeros_like(x0)
    mx = x0
    mn = x0
    for k in range(2):
        ptap = jnp.asarray(PRI_TAPS)[taps_sel, k][..., None, None]
        stap = int(SEC_TAPS[0, k])
        for sgn in (1, -1):
            pv = P[fi, Y + sgn * d0[..., k, 0][..., None, None],
                   X + sgn * d0[..., k, 1][..., None, None]]
            sum_ = sum_ + ptap * constrain(pv - x0, pri_b, pri_damping)
            mx = jnp.maximum(mx, jnp.where(pv == CDEF_VERY_LARGE, mx, pv))
            mn = jnp.minimum(mn, pv)
        for dt in (d_p2, d_m2):
            for sgn in (1, -1):
                sv = P[fi, Y + sgn * dt[..., k, 0][..., None, None],
                       X + sgn * dt[..., k, 1][..., None, None]]
                sum_ = sum_ + stap * constrain(sv - x0, sec_b, sec_damping)
                mx = jnp.maximum(mx, jnp.where(sv == CDEF_VERY_LARGE, mx, sv))
                mn = jnp.minimum(mn, sv)
    y = x0 + ((8 + sum_ - (sum_ < 0)) >> 4)
    return jnp.clip(y, mn, mx)


def _tap_stack_j(plane, dirmap, m: int):
    """Gather-free tap extraction for a whole (F, H, W) plane whose every
    m x m cell has direction dirmap (F, H, W broadcast per cell, int32).

    The 12 CDEF tap positions come from a STATIC 8x2x2 offset table indexed
    by the per-cell direction — so the plane is shifted statically for all
    8 directions and each pixel selects its direction's value (TPU lowers
    dynamic 2-D gathers to a slow path; selects fuse on the VPU).
    Returns (x0, [(pv, kind)...]) with kind 'p'/'s' and tap index k."""
    import jax.numpy as jnp

    F, H, W = plane.shape
    B = 2
    P = jnp.pad(plane, ((0, 0), (B, B), (B, B)), constant_values=CDEF_VERY_LARGE)

    def shifted(dy, dx):
        return P[:, B + dy : B + dy + H, B + dx : B + dx + W]

    def select(dir_index_of):
        """per-pixel select of shifted planes: offsets[d] = table row of
        dir_index_of(d); one where-accumulate over the 8 directions."""
        outs = []
        for k in range(2):
            for sgn in (1, -1):
                acc = None
                for d in range(8):
                    dy, dx = (int(v) * sgn for v in CDEF_DIRS[dir_index_of(d)][k])
                    sp = shifted(dy, dx)
                    acc = sp if acc is None else jnp.where(dirmap == d, sp, acc)
                outs.append((acc, k))
        return outs

    pri = select(lambda d: d)
    sec = select(lambda d: (d + 2) & 7) + select(lambda d: (d - 2) & 7)
    return plane, pri, sec


def _filter_from_taps_j(x0, pri_taps, sec_taps, pri, sec, pri_damping, sec_damping,
                        coeff_shift: int):
    """Apply the CDEF accumulation given precomputed tap planes (full
    frame). pri/sec: per-pixel (broadcastable) strengths. Bit-exact with
    _filter_cells_j / cdef._apply_taps."""
    import jax.numpy as jnp

    def constrain(diff, s, damping):
        shift = jnp.maximum(0, damping - _msb_j(s))
        ad = jnp.abs(diff)
        mag = jnp.minimum(ad, jnp.maximum(0, s - (ad >> shift)))
        return jnp.sign(diff) * jnp.where(s > 0, mag, 0)

    taps_sel = (pri >> coeff_shift) & 1
    sum_ = jnp.zeros_like(x0)
    mx = x0
    mn = x0
    for pv, k in pri_taps:
        ptap = jnp.where(taps_sel == 0, int(PRI_TAPS[0, k]), int(PRI_TAPS[1, k]))
        sum_ = sum_ + ptap * constrain(pv - x0, pri, pri_damping)
        mx = jnp.maximum(mx, jnp.where(pv == CDEF_VERY_LARGE, mx, pv))
        mn = jnp.minimum(mn, pv)
    for sv, k in sec_taps:
        sum_ = sum_ + int(SEC_TAPS[0, k]) * constrain(sv - x0, sec, sec_damping)
        mx = jnp.maximum(mx, jnp.where(sv == CDEF_VERY_LARGE, mx, sv))
        mn = jnp.minimum(mn, sv)
    y = x0 + ((8 + sum_ - (sum_ < 0)) >> 4)
    return jnp.clip(y, mn, mx)


def _upsample_cells_j(cellvals, m: int, H: int, W: int):
    """(F, R, C) per-cell values -> (F, H, W) per-pixel map."""
    import jax.numpy as jnp

    return jnp.repeat(jnp.repeat(cellvals, m, axis=1), m, axis=2)


def cdef_frames_j(planes, src_y, nonskip8, qindex: int | None = None, bd: int = 8,
                  damping: int | None = None, n_cand: int = 0):
    """Search + apply CDEF for a batch of frames, all on device.

    planes: [y, u, v] (F, H, W) jnp int32 (post-DLF recon); src_y (F, H, W)
    int32 source luma; nonskip8 (F, R8, C8) bool. Pass `damping` directly
    (preferred — only 4 values, so jit callers avoid per-qindex recompiles)
    or `qindex` to derive it. Returns (new_planes, strengths (F, 4) int32
    [y_pri, y_sec, uv_pri, uv_sec], damping).

    Tap planes are extracted ONCE (static shifts + direction selects) and
    shared by every ladder candidate and the final apply — the search loop
    is constrain+accumulate only."""
    import jax.numpy as jnp

    if damping is None:
        damping = pick_damping(qindex)
    coeff_shift = max(bd - 8, 0)
    F, H, W = planes[0].shape
    R8, C8 = H // 8, W // 8
    NU = R8 * C8
    mask = nonskip8.reshape(F, NU)

    cells = planes[0].reshape(F, R8, 8, C8, 8).transpose(0, 1, 3, 2, 4).reshape(F, NU, 8, 8)
    dirs, variances = find_dir_j(cells >> coeff_shift)
    dirmap = _upsample_cells_j(dirs.reshape(F, R8, C8), 8, H, W)
    varmap = _upsample_cells_j(variances.reshape(F, R8, C8), 8, H, W)
    x0, pri_taps, sec_taps = _tap_stack_j(planes[0], dirmap, 8)
    maskmap = _upsample_cells_j(mask.reshape(F, R8, C8), 8, H, W)

    # strength search: evaluate the candidate ladder on every non-skip unit
    # (n_cand > 0: fast-preset subset — first n_cand ladder entries)
    ladder = SEARCH_CANDIDATES[:n_cand] if n_cand else SEARCH_CANDIDATES
    sses = []
    for y_pri, y_sec in ladder:
        if y_pri == 0 and y_sec == 0:
            res = x0
        else:
            t = _adjust_strength_j(y_pri << coeff_shift, varmap)
            res = _filter_from_taps_j(x0, pri_taps, sec_taps, t,
                                      jnp.int32(y_sec << coeff_shift),
                                      damping + coeff_shift, damping + coeff_shift,
                                      coeff_shift)
        e = (res - src_y).astype(jnp.float32) ** 2
        sses.append(jnp.sum(e * maskmap, axis=(-2, -1)))
    sses = jnp.stack(sses, axis=-1)  # (F, n_cand)
    best = jnp.argmin(sses, axis=-1)  # (F,)
    # The final apply below omits the decoder's "dir = 0 when pri_strength
    # == 0" forcing (filters/cdef.py:198,206): it is unreachable only while
    # the ladder never yields pri == 0 with sec > 0 — at luma directly, and
    # at chroma after the uv = y >> 1 derivation. Keep that invariant.
    assert all(p > 0 or s == 0 for p, s in ladder), ladder
    assert all((p >> 1) > 0 or (s >> 1) == 0 for p, s in ladder)
    cand = jnp.asarray(np.array(ladder, np.int32))  # (n_cand, 2)
    y_pri = cand[best, 0]
    y_sec = cand[best, 1]
    uv_pri = y_pri >> 1
    uv_sec = y_sec >> 1  # ladder sec values are 0/1/2 -> >>1 gives 0/1, never 3

    # final apply (per-frame dynamic strengths; tap planes reused)
    t = _adjust_strength_j((y_pri << coeff_shift)[:, None, None], varmap)
    res_y = _filter_from_taps_j(x0, pri_taps, sec_taps, t,
                                (y_sec << coeff_shift)[:, None, None],
                                damping + coeff_shift, damping + coeff_shift, coeff_shift)
    apply_y = maskmap.astype(bool) & ((y_pri > 0) | (y_sec > 0))[:, None, None]
    new_y = jnp.where(apply_y, res_y, planes[0])

    Hc, Wc = H // 2, W // 2
    dirmap_c = _upsample_cells_j(dirs.reshape(F, R8, C8), 4, Hc, Wc)
    maskmap_c = _upsample_cells_j(mask.reshape(F, R8, C8), 4, Hc, Wc).astype(bool)
    apply_uv = maskmap_c & ((uv_pri > 0) | (uv_sec > 0))[:, None, None]
    pri_uv = (uv_pri << coeff_shift)[:, None, None]
    sec_uv = (uv_sec << coeff_shift)[:, None, None]
    outs_uv = []
    for pl in (planes[1], planes[2]):
        xc, pri_t, sec_t = _tap_stack_j(pl, dirmap_c, 4)
        res_c = _filter_from_taps_j(xc, pri_t, sec_t, pri_uv, sec_uv,
                                    damping + coeff_shift - 1,
                                    damping + coeff_shift - 1, coeff_shift)
        outs_uv.append(jnp.where(apply_uv, res_c, pl))
    strengths = jnp.stack([y_pri, y_sec, uv_pri, uv_sec], axis=-1)
    return [new_y, outs_uv[0], outs_uv[1]], strengths, damping


def _scatter_cells_j(plane, cells, ys, xs, m, apply_mask):
    """Write (F, NU, m, m) cells back where apply_mask (F, NU), else keep."""
    import jax.numpy as jnp

    F, H, W = plane.shape
    R8, C8 = H // m, W // m
    grid = plane.reshape(F, R8, m, C8, m).transpose(0, 1, 3, 2, 4).reshape(F, R8 * C8, m, m)
    sel = jnp.where(apply_mask[..., None, None], cells, grid)
    return sel.reshape(F, R8, C8, m, m).transpose(0, 1, 3, 2, 4).reshape(F, H, W)
