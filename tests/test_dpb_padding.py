"""DPB alignment padding must hold replicated display-edge pixels (ADVICE r1).

Spec 7.11.3.4 clamps MC reference coordinates at display dims; we achieve the
same by re-padding every DPB plane from the display edge (the reference's
svt_aom_pad_picture_to_multiple_of_min_blk_size_dimensions behavior), so the
edge-clamped gather in ops/convolve.py reads spec-identical samples.
"""
import numpy as np

from svtav1_tpu.ops.convolve import convolve_2d_scalar
from svtav1_tpu.pipeline.encoder import replicate_display_edges


def test_replicate_display_edges_matches_display_clamp():
    rng = np.random.default_rng(7)
    w, h = 68, 36  # display dims, mi-aligned to 72x40
    aw, ah = 72, 40
    y = np.zeros((ah, aw), np.int32)
    y[:h, :w] = rng.integers(0, 256, (h, w))
    y[:, w:] = 999  # poison the alignment padding
    y[h:, :] = 999
    planes = [y, np.zeros((ah // 2, aw // 2), np.int32), np.zeros((ah // 2, aw // 2), np.int32)]
    planes[1][:, w // 2 :] = 999
    replicate_display_edges(planes, w, h)
    assert (y[:h, w:] == y[:h, w - 1 : w]).all()
    assert (y[h:, :] == y[h - 1 : h, :]).all()
    assert (planes[1][: h // 2, w // 2 :] == planes[1][: h // 2, w // 2 - 1 : w // 2]).all()

    # MC of a block hanging off the right/bottom display edge now equals the
    # spec's display-dim clamp: build the display-clamped oracle directly.
    blk = convolve_2d_scalar(y, 64, 32, 8, 8, mv_x_q4=5, mv_y_q4=9)
    disp = y[:h, :w]
    ys = np.clip(np.arange(32 - 3, 32 + 8 + 4), 0, h - 1)
    xs = np.clip(np.arange(64 - 3, 64 + 8 + 4), 0, w - 1)
    from svtav1_tpu.ops.convolve import convolve_2d_batch

    oracle = convolve_2d_batch(disp[np.ix_(ys, xs)].astype(np.int32)[None], 5, 9)[0]
    assert (blk == oracle).all()
