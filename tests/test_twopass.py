"""Two-pass VBR: pass-1 stats collection + complexity-weighted pass-2
allocation (firstpass.c / pass2_strategy.c analogs at honest scale)."""
from __future__ import annotations

import numpy as np

from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig
from svtav1_tpu.pipeline.firstpass import (FirstPassCollector, TwoPassVbrController,
                                           read_stats)

W, H, N = 128, 128, 12


def _frames():
    """Half static, half busy (noise+motion) — complexity varies 2x+."""
    rng = np.random.default_rng(0)
    base = rng.integers(60, 200, (H, W)).astype(np.int32)
    out = []
    for i in range(N):
        if i < N // 2:
            y = base + rng.integers(-2, 3, (H, W))
        else:
            y = np.roll(base, i * 3, axis=1) + rng.integers(-25, 26, (H, W))
        out.append((np.clip(y, 0, 255), np.full((H // 2, W // 2), 128, np.int32),
                    np.full((H // 2, W // 2), 128, np.int32)))
    return out


def test_stats_roundtrip(tmp_path):
    frames = _frames()
    col = FirstPassCollector()
    for (y, _u, _v) in frames:
        col.send_frame(y)
    path = str(tmp_path / "stats.json")
    col.write_stats(path)
    recs = read_stats(path)
    assert len(recs) == N
    # the busy half must read as more complex
    first = np.mean([r["coded_error"] for r in recs[1 : N // 2]])
    second = np.mean([r["coded_error"] for r in recs[N // 2 + 1 :]])
    assert second > 2 * first


def test_twopass_allocates_by_complexity(tmp_path):
    frames = _frames()
    col = FirstPassCollector()
    for (y, _u, _v) in frames:
        col.send_frame(y)
    path = str(tmp_path / "stats.json")
    col.write_stats(path)
    stats = read_stats(path)

    # complex frames get larger targets (the share weighting)
    rc = TwoPassVbrController(stats, 400e3, 30.0, keyint=N)
    rc.set_frame_geometry(W, H)
    assert rc._share[N - 1] > rc._share[2] * 1.3

    def encode(stats_in):
        enc = Encoder(EncoderConfig(width=W, height=H, qindex=120, keyint=N,
                                    rc_mode="vbr", target_kbps=400,
                                    stats_in=stats_in))
        sizes = []
        for (y, u, v) in frames:
            for p in enc.send_frame(y, u, v):
                sizes.append(len(p.tu))
        for p in enc.flush():
            sizes.append(len(p.tu))
        return sizes

    sizes2 = encode(stats)
    total = sum(sizes2) * 8 * 30.0 / N  # bps
    # micro-clip smoke: one 7x-boosted key over 12 frames dominates, so the
    # tolerance is wide — convergence is asserted by test_vbr on longer runs
    assert 0.3 * 400e3 < total < 2.5 * 400e3, total
    # and spends more on the busy half than the static half
    inter1 = sum(sizes2[1 : N // 2])
    inter2 = sum(sizes2[N // 2 :])
    assert inter2 > inter1
