"""CLI encoder app (analog of reference Source/App SvtAv1EncApp).

Usage: python -m svtav1_tpu.app -i input.y4m -b output.ivf [-q 120] [-n N]
       [--recon recon.y4m] [--md numpy|jax]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from .decode.decoder import Decoder
from .io.ivf import write_ivf
from .io.y4m import read_y4m, write_y4m
from .pipeline.encoder import Encoder, EncoderConfig


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="svtav1-tpu", description="TPU-native AV1 encoder")
    ap.add_argument("-i", "--input", required=True, help="input .y4m")
    ap.add_argument("-b", "--output", required=True, help="output .ivf")
    ap.add_argument("-q", "--qindex", type=int, default=120, help="base_q_idx (0-255)")
    ap.add_argument("-n", "--frames", type=int, default=None, help="max frames")
    ap.add_argument("--recon", default=None, help="write decoder-checked recon .y4m")
    ap.add_argument("--md", default="numpy", choices=["numpy", "jax"], help="mode decision backend")
    ap.add_argument("--keyint", type=int, default=1, help="key frame interval (1 = all-intra)")
    ap.add_argument("--verify", action="store_true", help="decode each frame and verify recon match")
    args = ap.parse_args(argv)

    if not 0 <= args.qindex <= 255:
        ap.error(f"--qindex must be in [0, 255], got {args.qindex}")
    try:
        frames, w, h, fps = read_y4m(args.input, args.frames)
    except (OSError, ValueError) as e:
        print(f"error reading {args.input}: {e}", file=sys.stderr)
        return 1
    if not frames:
        print("no frames read", file=sys.stderr)
        return 1
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=args.qindex, mode_decision=args.md,
                                keyint=args.keyint))
    dec = Decoder()
    tus = []
    recons = []
    t0 = time.time()
    total_psnr = 0.0
    for i, (y, u, v) in enumerate(frames):
        tu, recon = enc.encode_frame(y, u, v)
        tus.append(tu)
        if args.verify or args.recon:
            dy, du, dv, drecon = dec.decode_tu(tu)
            for pl in range(3):
                assert np.array_equal(recon[pl], drecon[pl]), f"frame {i} plane {pl} enc/dec recon mismatch"
            recons.append((dy.astype(np.uint8), du.astype(np.uint8), dv.astype(np.uint8)))
            mse = ((dy.astype(float) - y.astype(float)) ** 2).mean()
            psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
            total_psnr += psnr
            print(f"frame {i}: {len(tu)} bytes, Y-PSNR {psnr:.2f} dB")
        else:
            print(f"frame {i}: {len(tu)} bytes")
    dt = time.time() - t0
    write_ivf(args.output, tus, w, h, fps)
    if args.recon:
        write_y4m(args.recon, recons, w, h, fps)
    kb = sum(len(t) for t in tus) / 1000.0
    print(f"encoded {len(tus)} frames {w}x{h} in {dt:.2f}s ({len(tus)/dt:.2f} fps), {kb:.1f} kB", end="")
    if args.verify or args.recon:
        print(f", avg Y-PSNR {total_psnr/len(frames):.2f} dB", end="")
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
