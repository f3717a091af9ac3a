"""Device (JAX) motion estimation + batched motion compensation.

TPU-first re-architecture of the reference's open-loop HME/ME
(motion_estimation.c:3146 svt_aom_motion_estimation_b64 and the per-size
SAD accumulation of integer_search_b64 :1249): one jitted program computes
full-pel MVs for EVERY square block size 8..64 of the whole frame via

  1. a 3-level decimation pyramid (pic_analysis downsample analog),
  2. exhaustive batched full search per 64x64 SB at 1/4 resolution,
  3. +-2 refinements at 1/2 and full resolution,
  4. one shared window around the SB winner in which 8x8 SAD maps are
     computed once and SUMMED up the quad-tree (16/32/64) so each size
     argmins its own map (the reference's trick, batched),
  5. two-step (half, quarter pel) subpel refinement per block via batched
     normative 8-tap MC (inter_prediction.c svt_av1_convolve_2d_sr_c
     semantics, bit-exact with ops/convolve.convolve_2d_batch).

MVs are (row, col) in 1/8-pel units, matching codec/mvp conventions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .convolve import FILTER_BITS, ROUND0, ROUND1, filter_kernels

SIZES = (8, 16, 32, 64)


def decimate2_j(p):
    """2x2-average decimation ((...,H,W) -> (...,H//2,W//2)); matches
    ops/me.decimate_2x (pic_analysis_process.c svt_aom_downsample_2d)."""
    h, w = p.shape[-2] & ~1, p.shape[-1] & ~1
    q = p[..., :h, :w]
    return (q[..., 0::2, 0::2] + q[..., 0::2, 1::2]
            + q[..., 1::2, 0::2] + q[..., 1::2, 1::2] + 2) >> 2


def gather_windows(plane, ys, xs, wh: int, ww: int):
    """(B,) top-left coords -> (B, wh, ww) windows, coords clipped to the
    plane (edge replication — the spec's reference-sample clamp)."""
    H, W = plane.shape
    iy = jnp.clip(ys[:, None] + jnp.arange(wh)[None, :], 0, H - 1)
    ix = jnp.clip(xs[:, None] + jnp.arange(ww)[None, :], 0, W - 1)
    return plane[iy[:, :, None], ix[:, None, :]]


def _blocks_of(plane, n: int, R: int, C: int):
    return plane[: R * n, : C * n].reshape(R, n, C, n).transpose(0, 2, 1, 3) \
        .reshape(R * C, n, n)


def sad_maps(src_blocks, windows, n: int, r: int):
    """src (B, n, n), windows (B, n+2r, n+2r) -> SAD maps (B, D, D) int32,
    D = 2r+1; map[dy, dx] = SAD at displacement (dy-r, dx-r)."""
    D = 2 * r + 1
    iy = (jnp.arange(D)[:, None] + jnp.arange(n)[None, :])  # (D, n)
    pat = windows[:, iy[:, None, :, None], iy[None, :, None, :]]  # (B,D,D,n,n)
    diff = jnp.abs(pat.astype(jnp.int16) - src_blocks[:, None, None].astype(jnp.int16))
    return jnp.sum(diff.astype(jnp.int32), axis=(-2, -1))


def _argmin2d(maps, r: int):
    """(B, D, D) -> (B, 2) int32 displacement (row, col) in [-r, r]."""
    D = 2 * r + 1
    flat = maps.reshape(maps.shape[0], D * D)
    best = jnp.argmin(flat, axis=1).astype(jnp.int32)
    return jnp.stack([best // D - r, best % D - r], axis=1)


def _bias(r: int, scale: float):
    d = jnp.abs(jnp.arange(-r, r + 1))
    return ((d[:, None] + d[None, :]) * scale).astype(jnp.int32)


def _search_centered(src_b, ref, ys, xs, centers, n: int, r: int, bias_scale: float):
    """Full search of (B, n, n) blocks at plane positions (ys, xs) with
    per-block full-pel center MVs; returns refined centers (B, 2)."""
    win = gather_windows(ref, ys + centers[:, 0] - r, xs + centers[:, 1] - r,
                         n + 2 * r, n + 2 * r)
    maps = sad_maps(src_b, win, n, r) + _bias(r, bias_scale)[None]
    return centers + _argmin2d(maps, r)


def me_fullpel_frame(src_y, ref_y, sb_rows: int, sb_cols: int, l2_radius: int = 16,
                     leaf_radius: int = 4, ref_off_x: int = 0):
    """Full-pel per-size ME for one frame vs one reference.

    src_y/ref_y: (H, W) int32 planes, H/W multiples of 64 (pad first).
    ref_off_x: STATIC column offset of the src origin inside a WIDER ref
    plane (tile sharding passes each tile a halo-cropped ref whose column
    ref_off_x aligns with the tile's column 0; must be a multiple of 4 for
    the pyramid). Returns dict {n: (R_n, C_n, 2) int32 full-pel MVs} for n
    in SIZES and the SB-level MVs (B_sb, 2)."""
    assert ref_off_x % 4 == 0
    B = sb_rows * sb_cols
    src1, ref1 = decimate2_j(src_y), decimate2_j(ref_y)
    src2, ref2 = decimate2_j(src1), decimate2_j(ref1)

    rr = jnp.repeat(jnp.arange(sb_rows), sb_cols)
    cc = jnp.tile(jnp.arange(sb_cols), sb_rows)

    # L2 (1/4 res): 16x16 blocks, exhaustive +-l2_radius (x4 full-res reach)
    mv = _search_centered(_blocks_of(src2, 16, sb_rows, sb_cols), ref2,
                          rr * 16, cc * 16 + ref_off_x // 4,
                          jnp.zeros((B, 2), jnp.int32),
                          16, l2_radius, 1.0)
    # L1 (1/2 res): +-2 refine
    mv = _search_centered(_blocks_of(src1, 32, sb_rows, sb_cols), ref1,
                          rr * 32, cc * 32 + ref_off_x // 2, mv * 2, 32, 2, 2.0)
    # L0 (full res): +-2 refine of the SB
    mv_sb = _search_centered(_blocks_of(src_y, 64, sb_rows, sb_cols), ref_y,
                             rr * 64, cc * 64 + ref_off_x, mv * 2, 64, 2, 4.0)

    # shared windows: 8x8 SAD maps summed up the quad-tree (per-size argmin).
    # TWO candidate centers per SB — the pyramid winner and zero MV (the
    # reference always keeps a (0,0) candidate; guards against pyramid
    # aliasing on periodic content and static regions). Leaf windows are
    # STATIC slices of one shared (64+2r)^2 window per SB: the zero-center
    # window comes from an edge-padded plane with no gather at all, the
    # MV-center window is one small per-SB gather — dynamic-gather traffic
    # is the decide pass's real cost on TPU.
    r = leaf_radius
    D = 2 * r + 1
    src8 = src_y.reshape(sb_rows, 8, 8, sb_cols, 8, 8)  # (Rsb, 8r, 8px, Csb, 8c, 8px)
    src8 = src8.transpose(0, 3, 1, 4, 2, 5).reshape(B * 64, 8, 8)
    wsz = 64 + 2 * r

    def leaf_windows_of(sbwin):
        """(B_sb, 64+2r, 64+2r) SB windows -> (B_sb*64, 8+2r, 8+2r) leaf
        windows via static slice stacking."""
        rows = jnp.stack([sbwin[:, 8 * i : 8 * i + 8 + 2 * r] for i in range(8)], 1)
        both = jnp.stack([rows[..., 8 * j : 8 * j + 8 + 2 * r] for j in range(8)], 2)
        return both.reshape(B * 64, 8 + 2 * r, 8 + 2 * r)

    # zero-center: edge-padded plane, overlapping windows by static slices
    padded = jnp.pad(ref_y, ((r, r), (r, r)), mode="edge")
    prow = jnp.stack([padded[64 * i : 64 * i + wsz] for i in range(sb_rows)])
    win_zero = jnp.stack([prow[:, :, ref_off_x + 64 * j : ref_off_x + 64 * j + wsz]
                          for j in range(sb_cols)], 1)
    win_zero = win_zero.reshape(B, wsz, wsz)
    # MV-center: one gather per SB
    win_mv = gather_windows(ref_y, rr * 64 + mv_sb[:, 0] - r,
                            cc * 64 + ref_off_x + mv_sb[:, 1] - r, wsz, wsz)

    def leaf_maps(sbwin):
        return sad_maps(src8, leaf_windows_of(sbwin), 8, r) \
            .reshape(sb_rows, sb_cols, 8, 8, D, D)

    centers = (mv_sb, jnp.zeros((B, 2), jnp.int32))
    maps = [leaf_maps(win_mv), leaf_maps(win_zero)]

    out = {}
    for n in SIZES:
        k = 8 // (n // 8)  # blocks per SB side at this size
        bias = _bias(r, 4.0 * (n * n) / 64.0)[None, None, None, None]
        best_val = None
        best_mv = None
        for m, c in zip(maps, centers):
            mm = (m + bias).reshape(-1, D, D)
            off = _argmin2d(mm, r)
            val = jnp.min(mm.reshape(-1, D * D), axis=1)
            base = jnp.repeat(c, k * k, axis=0).reshape(sb_rows, sb_cols, k, k, 2) \
                .reshape(-1, 2)
            mvn = base + off
            if best_val is None:
                best_val, best_mv = val, mvn
            else:
                take = val < best_val
                best_val = jnp.where(take, val, best_val)
                best_mv = jnp.where(take[:, None], mvn, best_mv)
        out[n] = best_mv.reshape(sb_rows, sb_cols, k, k, 2) \
            .transpose(0, 2, 1, 3, 4).reshape(sb_rows * k, sb_cols * k, 2)
        if n < 64:  # sum 2x2 children -> parent maps
            maps = [m[:, :, 0::2, 0::2] + m[:, :, 0::2, 1::2]
                    + m[:, :, 1::2, 0::2] + m[:, :, 1::2, 1::2] for m in maps]
    return out, mv_sb


# ------------------------------------------------------------------ MC

def mc_lanes(ref, ys, xs, mv_q16_y, mv_q16_x, n_h: int, n_w: int, which: int, bd: int,
             ref_idx=None, conv_buf: bool = False):
    """Batched normative subpel MC with PER-LANE subpel phases.

    ref: (H, W) or (NREF, H, W) when ref_idx (B,) given. ys/xs (B,) block
    top-left in plane coords; mv in 1/16-pel units of this plane. Returns
    (B, n_h, n_w) int32 predictions, bit-exact with convolve_2d_scalar
    (4-tap table auto-selected for dims <= 4 per spec 7.11.3.4).

    conv_buf=True: the COMPOUND path's offset-carrying intermediate
    (round_1 = 7), to be blended by compound_average_j — bit-exact with
    convolve_2d_scalar_compound."""
    from .convolve import COMPOUND_ROUND1, filter_for_dim

    fy0 = ys * 16 + mv_q16_y
    fx0 = xs * 16 + mv_q16_x
    iy, sy = fy0 >> 4, fy0 & 15
    ix, sx = fx0 >> 4, fx0 & 15
    if ref.ndim == 2:
        H, W = ref.shape
        gy = jnp.clip(iy[:, None] - 3 + jnp.arange(n_h + 7)[None, :], 0, H - 1)
        gx = jnp.clip(ix[:, None] - 3 + jnp.arange(n_w + 7)[None, :], 0, W - 1)
        patch = ref[gy[:, :, None], gx[:, None, :]].astype(jnp.int32)
    else:
        H, W = ref.shape[1:]
        gy = jnp.clip(iy[:, None] - 3 + jnp.arange(n_h + 7)[None, :], 0, H - 1)
        gx = jnp.clip(ix[:, None] - 3 + jnp.arange(n_w + 7)[None, :], 0, W - 1)
        patch = ref[ref_idx[:, None, None], gy[:, :, None], gx[:, None, :]].astype(jnp.int32)

    ftab_x = jnp.asarray(filter_kernels(filter_for_dim(which, n_w)))
    ftab_y = jnp.asarray(filter_kernels(filter_for_dim(which, n_h)))
    fxk = ftab_x[sx]  # (B, 8)
    fyk = ftab_y[sy]
    offset_bits = bd + 2 * FILTER_BITS - ROUND0

    acc = jnp.full((patch.shape[0], n_h + 7, n_w), 1 << (bd + FILTER_BITS - 1), jnp.int32)
    for k in range(8):
        acc = acc + fxk[:, k, None, None] * patch[:, :, k : k + n_w]
    im = (acc + (1 << (ROUND0 - 1))) >> ROUND0

    acc = jnp.full((patch.shape[0], n_h, n_w), 1 << offset_bits, jnp.int32)
    for k in range(8):
        acc = acc + fyk[:, k, None, None] * im[:, k : k + n_h, :]
    if conv_buf:
        return (acc + (1 << (COMPOUND_ROUND1 - 1))) >> COMPOUND_ROUND1
    res = ((acc + (1 << (ROUND1 - 1))) >> ROUND1) \
        - ((1 << (offset_bits - ROUND1)) + (1 << (offset_bits - ROUND1 - 1)))
    bits = 2 * FILTER_BITS - ROUND0 - ROUND1
    if bits > 0:
        res = (res + (1 << (bits - 1))) >> bits
    return jnp.clip(res, 0, (1 << bd) - 1)


def compound_average_j(conv0, conv1, bd: int):
    """jnp twin of convolve.compound_average (normative average blend)."""
    from .convolve import COMPOUND_ROUND1

    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    tmp = (conv0 + conv1) >> 1
    tmp = tmp - ((1 << (offset_bits - COMPOUND_ROUND1))
                 + (1 << (offset_bits - COMPOUND_ROUND1 - 1)))
    round_bits = 2 * FILTER_BITS - ROUND0 - COMPOUND_ROUND1
    return jnp.clip((tmp + (1 << (round_bits - 1))) >> round_bits, 0, (1 << bd) - 1)


def mc_lanes_compound(refs, ys, xs, mv0y, mv0x, mv1y, mv1x, n_h: int, n_w: int,
                      which: int, bd: int, ref0_idx, ref1_idx):
    """Batched compound-average MC: two conv-buf passes + normative blend."""
    c0 = mc_lanes(refs, ys, xs, mv0y, mv0x, n_h, n_w, which, bd,
                  ref_idx=ref0_idx, conv_buf=True)
    c1 = mc_lanes(refs, ys, xs, mv1y, mv1x, n_h, n_w, which, bd,
                  ref_idx=ref1_idx, conv_buf=True)
    return compound_average_j(c0, c1, bd)


def extract_patches(ref, ys, xs, h: int, w: int):
    """(B,) top-left plane coords -> (B, h, w) patches with spec edge
    replication (per-index clip). ONE of these per block replaces the
    per-candidate gathers of the subpel search — TPU lowers dynamic 2-D
    gathers to a slow path, so gather traffic is the cost that matters."""
    H, W = ref.shape
    gy = jnp.clip(ys[:, None] + jnp.arange(h)[None, :], 0, H - 1)
    gx = jnp.clip(xs[:, None] + jnp.arange(w)[None, :], 0, W - 1)
    return ref[gy[:, :, None], gx[:, None, :]].astype(jnp.int32)


def _mc_patch_static(patch, idy: int, idx: int, sy: int, sx: int, n: int,
                     which: int, bd: int):
    """Normative 8-tap MC from a shared (B, n+8, n+8) patch at a STATIC
    integer shift (idy, idx in {-1, 0} relative to the patch's full-pel
    origin) and STATIC subpel phase (sy, sx in 0..15). Bit-exact with
    mc_lanes for the same absolute MV; all addressing is static slicing
    and the filter kernels are compile-time constants."""
    from .convolve import filter_for_dim

    fx = filter_kernels(filter_for_dim(which, n))[sx]  # (8,) host constants
    fy = filter_kernels(filter_for_dim(which, n))[sy]
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    r0, c0 = 1 + idy, 1 + idx  # patch rows [-4 .. n+3] -> tap base iy-3
    sub = patch[:, r0 : r0 + n + 7, c0 : c0 + n + 7]
    acc = jnp.full(sub.shape[:1] + (n + 7, n), 1 << (bd + FILTER_BITS - 1), jnp.int32)
    for k in range(8):
        if fx[k]:
            acc = acc + int(fx[k]) * sub[:, :, k : k + n]
    im = (acc + (1 << (ROUND0 - 1))) >> ROUND0
    acc = jnp.full(sub.shape[:1] + (n, n), 1 << offset_bits, jnp.int32)
    for k in range(8):
        if fy[k]:
            acc = acc + int(fy[k]) * im[:, k : k + n, :]
    res = ((acc + (1 << (ROUND1 - 1))) >> ROUND1) \
        - ((1 << (offset_bits - ROUND1)) + (1 << (offset_bits - ROUND1 - 1)))
    bits = 2 * FILTER_BITS - ROUND0 - ROUND1
    if bits > 0:
        res = (res + (1 << (bits - 1))) >> bits
    return jnp.clip(res, 0, (1 << bd) - 1)


def subpel_pred_lanes(src_b, ref, ys, xs, mv_fp, which: int, bd: int,
                      fast: bool = False):
    """Two-step (half, quarter pel) 9-point refinement that ALSO returns the
    winner's normative prediction.

    Gather-lean reformulation of subpel_refine_lanes: every candidate of
    both steps reads the SAME (n+8)^2 patch per block (subpel deltas stay
    within one integer pel), its integer shift and phase are static per
    candidate, so the 18 MC evaluations are static slices with constant
    kernels — ONE dynamic gather per block instead of 18. Returns
    (mv8 (B, 2), pred (B, n, n)) with pred == mc_lanes(ref, mv8).

    fast=True: exhaustive 5x5 even lattice ({-4..4}) — 25 MC evaluations
    instead of 49, reach limited to quarter-pel +-0.5px (the fast-preset
    trade; the reference's preset ladder likewise shrinks subpel searches,
    enc_mode_config.c md_subpel levels)."""
    B, n = src_b.shape[0], src_b.shape[-1]
    patch = extract_patches(ref, ys + mv_fp[:, 0] - 4, xs + mv_fp[:, 1] - 4,
                            n + 8, n + 8)

    # every reachable total delta lies on the even 1/8-pel lattice
    # {-6..6}^2: MC each of the 49 points ONCE (static slice + constant
    # kernels), then run the two sequential argmin stages over the
    # precomputed SAD grid.
    lat = (-4, -2, 0, 2, 4) if fast else (-6, -4, -2, 0, 2, 4, 6)
    preds = {}
    sads = {}
    for dy8 in lat:
        for dx8 in lat:
            fy0, fx0 = 2 * dy8, 2 * dx8  # 1/16-pel
            p = _mc_patch_static(patch, fy0 >> 4, fx0 >> 4, fy0 & 15, fx0 & 15,
                                 n, which, bd)
            preds[(dy8, dx8)] = p
            sads[(dy8, dx8)] = jnp.sum(jnp.abs(p - src_b), axis=(-2, -1))

    if fast:
        # exhaustive argmin over the 25 points (no sequential stages)
        keys = [(dy, dx) for dy in lat for dx in lat]
        sall = jnp.stack([sads[k] for k in keys])  # (25, B)
        kbest = jnp.argmin(sall, axis=0)
        oh = jax.nn.one_hot(kbest, len(keys), dtype=jnp.int32)
        best_d = jnp.asarray(np.array(keys, np.int32))[kbest]
        best_pred = sum(preds[keys[c]] * oh[:, c, None, None]
                        for c in range(len(keys)))
        return mv_fp * 8 + best_d, best_pred

    # step 1: half-pel 9 points (first-occurrence argmin order as the
    # sequential search)
    step1 = [(dy, dx) for dy in (-4, 0, 4) for dx in (-4, 0, 4)]
    sads1 = jnp.stack([sads[d] for d in step1])
    k1 = jnp.argmin(sads1, axis=0)  # (B,)
    oh1 = jax.nn.one_hot(k1, 9, dtype=jnp.int32)  # (B, 9)
    d1 = jnp.asarray(np.array(step1, np.int32))[k1]  # (B, 2)
    best_sad = jnp.min(sads1, axis=0)
    best_pred = sum(preds[step1[c]] * oh1[:, c, None, None] for c in range(9))
    best_d = d1

    # step 2: quarter-pel points around the step-1 winner — per static
    # offset, blend the 9 possible totals by one-hot(k1); no gathers.
    for o2 in [(dy, dx) for dy in (-2, 0, 2) for dx in (-2, 0, 2)]:
        if o2 == (0, 0):
            continue
        pred_o = sum(preds[(d1y + o2[0], d1x + o2[1])] * oh1[:, c, None, None]
                     for c, (d1y, d1x) in enumerate(step1))
        sad_o = sum(sads[(d1y + o2[0], d1x + o2[1])] * oh1[:, c]
                    for c, (d1y, d1x) in enumerate(step1))
        take = sad_o < best_sad
        best_sad = jnp.where(take, sad_o, best_sad)
        best_d = jnp.where(take[:, None], d1 + jnp.asarray(o2, jnp.int32), best_d)
        best_pred = jnp.where(take[:, None, None], pred_o, best_pred)
    return mv_fp * 8 + best_d, best_pred


def subpel_refine_lanes(src_b, ref, ys, xs, mv_fp, which: int, bd: int):
    """Two-step (half then quarter pel) 9-point refinement by luma SAD.

    src_b (B, n, n); mv_fp (B, 2) full-pel -> (B, 2) 1/8-pel MVs. All nine
    candidates of a step are folded into the LANE axis (one MC launch per
    step — compile-friendly, throughput-oriented)."""
    B, n = src_b.shape[0], src_b.shape[-1]
    mv = mv_fp * 8
    ys9 = jnp.tile(ys, 9)
    xs9 = jnp.tile(xs, 9)
    offs = jnp.array([(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)], jnp.int32)

    for step in (4, 2):
        cand = (mv[None] + offs[:, None] * step).reshape(9 * B, 2)
        pred = mc_lanes(ref, ys9, xs9, cand[:, 0] * 2, cand[:, 1] * 2, n, n, which, bd)
        sads = jnp.sum(jnp.abs(pred.reshape(9, B, n, n) - src_b[None]),
                       axis=(-2, -1)).astype(jnp.int32)
        pick = jnp.argmin(sads, axis=0)
        mv = jnp.take_along_axis(cand.reshape(9, B, 2), pick[None, :, None], axis=0)[0]
    return mv
