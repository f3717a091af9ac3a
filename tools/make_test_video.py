#!/usr/bin/env python3
"""Generate a synthetic y4m test clip (gradient + texture + motion)."""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np

from svtav1_tpu.io.y4m import write_y4m


def make_frames(w: int, h: int, n: int, noise: float = 3.0, seed: int = 0):
    """The canonical synthetic clip (gradient + texture + motion) — the SAME
    content the reference baselines in BASELINE.md were measured on, so
    bench.py PSNR/size rows are like-for-like."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        dx = 3 * t
        y = (110 + 70 * np.sin((xx + dx) / 19.0) + 45 * np.cos(yy / 13.0)
             + 25 * np.sin((xx + 2 * yy + 5 * t) / 41.0)
             + rng.normal(0, noise, (h, w))).clip(0, 255).astype(np.uint8)
        u = (128 + 35 * np.sin((xx[::2, ::2] + dx) / 29.0)).clip(0, 255).astype(np.uint8)
        v = (128 - 30 * np.cos((yy[::2, ::2] + 2 * t) / 23.0)).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("-w", "--width", type=int, default=352)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("-n", "--frames", type=int, default=8)
    ap.add_argument("--noise", type=float, default=3.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    frames = make_frames(args.width, args.height, args.frames, args.noise, args.seed)
    write_y4m(args.output, frames, args.width, args.height)
    print(f"wrote {args.frames} frames {args.width}x{args.height} to {args.output}")


if __name__ == "__main__":
    main()
