#!/usr/bin/env python3
"""Benchmark: full-pipeline encode fps at 1080p (BASELINE config 3 axis).

Primary metric: keyint-16 low-delay encode (1 key + 15 inter frames)
through the unified device pipeline (ME + MC + MD + wavefront commit +
DLF/CDEF on device, native C entropy walk). Secondary: all-intra fps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is against the MEASURED reference throughput on this machine:
SVT-AV1 v2.2.0 preset 8 CRF 28 at 1080p, 2-core C-only build (BASELINE.md
round-2 measurement table, rows 3/3b: 0.509 / 0.500 fps). The extra
`vs_est_32core_avx2` field scales that by x40 (midpoint of the 30-80x
SIMD+core-count estimate documented in BASELINE.md).

Env overrides: BENCH_W/BENCH_H/BENCH_FRAMES/BENCH_QINDEX.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

# persistent XLA compile cache: the big jitted frame programs (decide /
# commit / filters) compile once per shape-bucket per machine, not per run
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig  # noqa: E402

REF_FPS_1080P_INTRA_MEASURED = 0.500  # measured: BASELINE.md row 3b
REF_FPS_1080P_P8_MEASURED = 0.509  # measured: BASELINE.md row 3 (preset 8 CRF 28)
EST_32CORE_AVX2_SCALE = 40.0  # documented midpoint estimate (BASELINE.md)


def main() -> None:
    w = int(os.environ.get("BENCH_W", 1920))
    h = int(os.environ.get("BENCH_H", 1080))
    nframes = int(os.environ.get("BENCH_FRAMES", 16))
    qindex = int(os.environ.get("BENCH_QINDEX", 120))

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(nframes + 1):
        y = (110 + 70 * np.sin((xx + 3 * t) / 19.0) + 45 * np.cos(yy / 13.0)
             + rng.normal(0, 3, (h, w))).clip(0, 255).astype(np.uint8)
        u = (128 + 35 * np.sin(xx[::2, ::2] / 29.0)).clip(0, 255).astype(np.uint8)
        v = (128 - 30 * np.cos(yy[::2, ::2] / 23.0)).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))

    def run_config(cfg_kwargs):
        # warmup (compile): run the real frames once so the timed pass
        # reuses the compiled shapes (schedules bucket by content sizes)
        enc = Encoder(EncoderConfig(width=w, height=h, qindex=qindex,
                                    mode_decision="jax", **cfg_kwargs))
        t0 = time.time()
        for f in frames[1:]:
            enc.send_frame(*f)
        enc.flush()
        warm = time.time() - t0
        enc = Encoder(EncoderConfig(width=w, height=h, qindex=qindex,
                                    mode_decision="jax", **cfg_kwargs))
        t0 = time.time()
        pkts = []
        for f in frames[1:]:
            pkts += enc.send_frame(*f)
        pkts += enc.flush()
        total_bytes = sum(len(p.tu) for p in pkts)
        dt = time.time() - t0
        return nframes / dt, warm, total_bytes / nframes

    batch = int(os.environ.get("BENCH_BATCH", 8))
    fps_i, warm_i, kb_i = run_config(dict(intra_batch=batch))
    fps_p, warm_p, kb_p = run_config(dict(keyint=nframes))  # 1 key + P frames

    print(json.dumps({
        "metric": f"inter (keyint={nframes}) encode fps {w}x{h} q{qindex} (full pipeline, 1 chip)",
        "value": round(fps_p, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps_p / REF_FPS_1080P_P8_MEASURED, 5),
        "vs_est_32core_avx2": round(fps_p / (REF_FPS_1080P_P8_MEASURED * EST_32CORE_AVX2_SCALE), 5),
        "intra_fps": round(fps_i, 4),
        "intra_vs_baseline": round(fps_i / REF_FPS_1080P_INTRA_MEASURED, 5),
    }))
    print(f"# inter warmup {warm_p:.1f}s {kb_p/1000:.1f} kB/f; "
          f"intra warmup {warm_i:.1f}s {kb_i/1000:.1f} kB/f", file=sys.stderr)


if __name__ == "__main__":
    main()
