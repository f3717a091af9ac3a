"""Motion estimation kernels: batched SAD search + decimation pyramids.

TPU-first replacement for the reference's per-blocksize SIMD SAD family
(ASM_AVX2/compute_sad_intrin_avx2.c + motion_estimation.c HME levels
hme_level_0:820, open_loop_me_fullpel_search_sblock:781): one batched
full-search kernel evaluates every candidate displacement of a window for a
whole batch of blocks at once — wide regular work instead of branchy
early-exit pruning (SURVEY §7 design stance).

Shapes are static: (B, n, n) source blocks x (2r+1)^2 candidates.
Works with numpy or jax.numpy.
"""
from __future__ import annotations

import numpy as np


def sad_full_search(src_blocks, ref_windows, n: int, radius: int, xp=np):
    """Full-pel exhaustive SAD search.

    src_blocks: (B, n, n) int32; ref_windows: (B, n + 2r, n + 2r) int32
    reference windows centered so candidate (dy, dx) = window[dy:dy+n, ...].
    Returns (sads (B, 2r+1, 2r+1) int32, best (B, 2) int32 displacements
    relative to -r..+r)."""
    B = src_blocks.shape[0]
    d = 2 * radius + 1
    sads = []
    for dy in range(d):
        row = []
        for dx in range(d):
            cand = ref_windows[:, dy : dy + n, dx : dx + n]
            row.append(xp.sum(xp.abs(cand - src_blocks), axis=(1, 2)))
        sads.append(xp.stack(row, axis=1))
    sads = xp.stack(sads, axis=1)  # (B, d, d)
    flat = sads.reshape(B, d * d)
    best = xp.argmin(flat, axis=1)
    by = best // d - radius
    bx = best % d - radius
    return sads.astype(xp.int32), xp.stack([by, bx], axis=1).astype(xp.int32)


def decimate_2x(plane, xp=np):
    """2x downsample with the reference's filtered decimation semantics
    (pic_analysis_process.c svt_aom_downsample_2d: 2x2 average)."""
    h, w = plane.shape[-2] & ~1, plane.shape[-1] & ~1
    p = plane[..., :h, :w]
    return (p[..., 0::2, 0::2] + p[..., 0::2, 1::2] + p[..., 1::2, 0::2] + p[..., 1::2, 1::2] + 2) >> 2


def build_pyramid(plane, levels: int = 3, xp=np):
    """[full, 1/2, 1/4, ...] decimation pyramid (HME levels: reference uses
    1/4 and 1/16 area = 2 and 4x decimation per axis)."""
    out = [plane]
    for _ in range(levels - 1):
        out.append(decimate_2x(out[-1], xp))
    return out


def hme_search(src_y, ref_y, block: int = 64, radius_l0: int = 8, xp=np):
    """Hierarchical ME over a 3-level pyramid for every `block` x `block`
    superblock of the frame: coarse full search at 1/16 area, refined at
    1/4, then full-res (radius 2 refinements). Returns (B, 2) full-pel MVs
    in raster SB order and the final SADs (B,).

    Encoder-side heuristic (reference motion_estimation.c:3146
    svt_aom_motion_estimation_b64) re-architected as three batched
    full-search passes."""
    H, W = src_y.shape
    rows, cols = H // block, W // block
    B = rows * cols

    src_p = build_pyramid(src_y, 3, xp)
    ref_p = build_pyramid(ref_y, 3, xp)

    def blocks_of(plane, nb):
        # (B, nb, nb) blocks in raster order
        hh = rows * nb
        ww = cols * nb
        x = plane[:hh, :ww].reshape(rows, nb, cols, nb)
        return x.transpose(0, 2, 1, 3).reshape(B, nb, nb) if xp is np else \
            xp.transpose(x, (0, 2, 1, 3)).reshape(B, nb, nb)

    def windows_of(plane, nb, centers, radius):
        # gather (B, nb+2r, nb+2r) windows at block origin + center - r;
        # padding is sized so no window ever clips (edge-replicated refs)
        pad = radius + int(np.abs(np.asarray(centers)).max(initial=0)) + nb + 1
        padded = xp.pad(plane, ((pad, pad), (pad, pad)), mode="edge")
        outs = []
        for b in range(B):
            r0 = (b // cols) * nb + int(centers[b, 0]) - radius + pad
            c0 = (b % cols) * nb + int(centers[b, 1]) - radius + pad
            outs.append(padded[r0 : r0 + nb + 2 * radius, c0 : c0 + nb + 2 * radius])
        return xp.stack(outs)

    mv = np.zeros((B, 2), np.int64)
    for lvl, nb, radius in ((2, block // 4, radius_l0), (1, block // 2, 2), (0, block, 2)):
        src_b = blocks_of(src_p[lvl], nb)
        win = windows_of(ref_p[lvl], nb, mv, radius)
        sads, best = sad_full_search(src_b, win, nb, radius, xp)
        mv = mv + np.asarray(best)
        if lvl > 0:
            mv = mv * 2  # upscale to the next (finer) level
    # final SAD at chosen MV
    src_b = blocks_of(src_p[0], block)
    win = windows_of(ref_p[0], block, mv, 0)
    final_sad = np.asarray(xp.sum(xp.abs(win[:, :block, :block] - src_b), axis=(1, 2)))
    return mv.astype(np.int32), final_sad.astype(np.int64)
