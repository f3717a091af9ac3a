#!/usr/bin/env python3
"""Generate reference (SvtAv1EncApp) RD anchor points on the bench clip.

Encodes the synthetic bench clip at several CRF values with the reference
encoder, decodes nothing (uses the encoder's stat report PSNR is not
available in C-only builds reliably, so PSNR is computed by decoding with
our conformance-independent path: we just use the encoder output size and
the reference's own recon via --enable-stat-report when available; falls
back to aomdec/own decode if not). Writes tools/ref_rd_<WxH>.json consumed
by bench.py's BD-rate section.

Usage: python tools/gen_ref_rd.py <SvtAv1EncApp> [W H FRAMES]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_test_video import make_frames  # noqa: E402

CRFS = (30, 40, 50, 60)  # wide span: the synthetic clip's noise floor caps
# PSNR near 38.5 dB, so low CRFs are rate-inflated at equal quality


def write_y4m(path, frames, w, h):
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C420jpeg\n".encode())
        for (y, u, v) in frames:
            f.write(b"FRAME\n")
            f.write(np.asarray(y, np.uint8).tobytes())
            f.write(np.asarray(u, np.uint8).tobytes())
            f.write(np.asarray(v, np.uint8).tobytes())


def psnr_from_recon(recon_path, frames, w, h):
    """Y-PSNR of the reference's recon (raw YUV420 via -o) vs the source."""
    vals = []
    fsz = w * h * 3 // 2
    with open(recon_path, "rb") as f:
        for (y, _u, _v) in frames:
            data = f.read(fsz)
            if len(data) < fsz:
                break
            ry = np.frombuffer(data[: w * h], np.uint8).reshape(h, w)
            mse = ((ry.astype(np.float64) - np.asarray(y, np.float64)) ** 2).mean()
            vals.append(10 * np.log10(255.0 ** 2 / max(mse, 1e-12)))
    return float(np.mean(vals))


def main():
    app = sys.argv[1]
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 360
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    frames = make_frames(w, h, n)
    src = f"/tmp/benchclip_{w}x{h}_{n}.y4m"
    write_y4m(src, frames, w, h)
    points = []
    for crf in CRFS:
        out = f"/tmp/ref_{crf}.ivf"
        rec = f"/tmp/ref_{crf}_rec.y4m"
        cmd = [app, "-i", src, "-b", out, "--crf", str(crf), "--preset", "8",
               "--keyint", str(n), "--lp", "2", "-o", rec]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        assert r.returncode == 0, r.stderr[-2000:]
        size = os.path.getsize(out)
        kbps = size * 8 * 30.0 / n / 1000.0
        psnr = psnr_from_recon(rec, frames, w, h)
        points.append(dict(crf=crf, bytes=size, kbps=round(kbps, 2),
                           psnr=round(psnr, 3)))
        print(points[-1], flush=True)
    meta = dict(encoder="SvtAv1EncApp v2.2.0 C-only preset 8", width=w, height=h,
                frames=n, fps=30, clip="tools/make_test_video.make_frames",
                points=points)
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"ref_rd_{w}x{h}.json")
    with open(dst, "w") as f:
        json.dump(meta, f, indent=1)
    print("wrote", dst)


if __name__ == "__main__":
    main()
