#!/usr/bin/env python3
"""Benchmark: full-pipeline encode fps at 1080p (BASELINE config 3 axis).

Primary metric: keyint-16 low-delay encode (1 key + 15 inter frames)
through the unified device pipeline (ME + MC + MD + wavefront commit +
DLF/CDEF on device, native C entropy walk). Secondary: all-intra fps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} with
quality fields (Y-PSNR, bytes/frame) and a per-stage timing breakdown.
The clip is the SAME synthetic content (tools/make_test_video.make_frames)
the reference baselines were measured on (BASELINE.md rows 3/3b): SVT-AV1
v2.2.0 preset 8 CRF 28 at 1080p, 2-core C-only build → 0.509 fps @ 38.48 dB
(inter) / 0.500 fps @ 38.44 dB (all-intra). `vs_est_32core_avx2` scales the
measured baseline by x40 (BASELINE.md's 30-80x midpoint estimate).

Env overrides: BENCH_W/BENCH_H/BENCH_FRAMES/BENCH_QINDEX/BENCH_BATCH.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

# NO persistent compile cache by default: executable deserialization on
# this host is unreliable (cpu_aot_loader machine-feature mismatch can
# SIGSEGV on load — see tests/conftest.py), and the driver benches fresh
# code every round so a cache saves nothing. Opt in via env if needed.
if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig  # noqa: E402
from svtav1_tpu.utils import profiler  # noqa: E402
from tools.make_test_video import make_frames  # noqa: E402

# measured on this machine (BASELINE.md round-2 table, rows 3/3b)
REF = {"inter_fps": 0.509, "inter_psnr": 38.48, "inter_bytes": 145792 / 16,
       "intra_fps": 0.500, "intra_psnr": 38.44, "intra_bytes": 868517 / 16}
EST_32CORE_AVX2_SCALE = 40.0  # documented midpoint estimate (BASELINE.md)


def bd_rate(ref_pts, test_pts) -> float:
    """Bjontegaard delta rate (%): avg log-bitrate difference over the
    overlapping PSNR interval (poly fit of log-rate vs PSNR; degree adapts
    to the point count). Negative = test needs fewer bits than reference."""
    ref_pts = sorted(ref_pts)
    test_pts = sorted(test_pts)
    lr_r = np.log(np.array([r for r, _ in ref_pts], np.float64))
    p_r = np.array([p for _, p in ref_pts], np.float64)
    lr_t = np.log(np.array([r for r, _ in test_pts], np.float64))
    p_t = np.array([p for _, p in test_pts], np.float64)
    deg = min(3, len(ref_pts) - 1, len(test_pts) - 1)
    if deg < 1:
        return float("nan")
    fr = np.polyfit(p_r, lr_r, deg)
    ft = np.polyfit(p_t, lr_t, deg)
    lo = max(p_r.min(), p_t.min())
    hi = min(p_r.max(), p_t.max())
    if hi <= lo:
        return float("nan")
    ir, it = np.polyint(fr), np.polyint(ft)
    avg = ((np.polyval(it, hi) - np.polyval(it, lo))
           - (np.polyval(ir, hi) - np.polyval(ir, lo))) / (hi - lo)
    return float((np.exp(avg) - 1.0) * 100.0)


def psnr_y(shown: dict, frames: list) -> float:
    vals = []
    for d, rec in shown.items():
        y = np.asarray(frames[d][0], np.float64)
        mse = ((rec[: y.shape[0], : y.shape[1]].astype(np.float64) - y) ** 2).mean()
        vals.append(10 * np.log10(255.0 ** 2 / max(mse, 1e-12)))
    return float(np.mean(vals))


def main() -> None:
    t_start = time.time()
    w = int(os.environ.get("BENCH_W", 1920))
    h = int(os.environ.get("BENCH_H", 1080))
    nframes = int(os.environ.get("BENCH_FRAMES", 16))
    qindex = int(os.environ.get("BENCH_QINDEX", 120))
    frames = make_frames(w, h, nframes)

    def run_config(cfg_kwargs):
        # warmup (compile): run the real frames once so the timed pass
        # reuses the compiled shapes (schedules bucket by content sizes)
        enc = Encoder(EncoderConfig(width=w, height=h, qindex=qindex,
                                    mode_decision="jax", **cfg_kwargs))
        t0 = time.time()
        for f in frames:
            enc.send_frame(*f)
        enc.flush()
        warm = time.time() - t0
        profiler.reset()
        enc = Encoder(EncoderConfig(width=w, height=h, qindex=qindex,
                                    mode_decision="jax", **cfg_kwargs))
        t0 = time.time()
        pkts = []
        for f in frames:
            pkts += enc.send_frame(*f)
        pkts += enc.flush()
        dt = time.time() - t0
        shown = {}
        for p in pkts:
            if p.shown_disp_idx is not None:
                shown[p.shown_disp_idx] = (p.recon[0] if p.recon is not None
                                           else shown_recon[p.shown_disp_idx])
            if p.recon is not None and p.disp_idx is not None:
                shown_recon[p.disp_idx] = p.recon[0]
        total_bytes = sum(len(p.tu) for p in pkts)
        return dict(fps=nframes / dt, warm=warm, bpf=total_bytes / nframes,
                    psnr=psnr_y(shown, frames), stages=profiler.report())

    # PRIMARY metric (inter) runs FIRST and its JSON line prints the moment
    # it is ready — a driver timeout during the secondary intra pass still
    # leaves a complete result on stdout (VERDICT r3 weak #2).
    shown_recon: dict = {}
    inter = run_config(dict(keyint=nframes))  # 1 key + P frames
    result = {
        "metric": f"inter (keyint={nframes}) encode fps {w}x{h} q{qindex} (full pipeline, 1 chip)",
        "value": round(inter["fps"], 4),
        "unit": "frames/s",
        "vs_baseline": round(inter["fps"] / REF["inter_fps"], 5),
        "vs_est_32core_avx2": round(inter["fps"] / (REF["inter_fps"] * EST_32CORE_AVX2_SCALE), 5),
        "psnr_db": round(inter["psnr"], 3),
        "ref_psnr_db": REF["inter_psnr"],
        "bytes_per_frame": round(inter["bpf"], 1),
        "ref_bytes_per_frame": round(REF["inter_bytes"], 1),
        "warmup_s": round(inter["warm"], 1),
        "stages_s": inter["stages"],
    }
    print(json.dumps(result), flush=True)
    budget = float(os.environ.get("BENCH_BUDGET_S", 2100))

    # ---- BD-rate vs the reference encoder (VERDICT r4 #8): 4-point RD
    # sweep at 640x360 (the 1080p program family is too compile-expensive
    # for a 4-q sweep inside the bench window; compression efficiency is
    # resolution-portable enough for a like-for-like delta). Reference
    # anchors: tools/ref_rd_640x360.json (SvtAv1EncApp preset 8, same clip,
    # generated by tools/gen_ref_rd.py).
    ref_rd_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tools", "ref_rd_640x360.json")
    if (os.environ.get("BENCH_SKIP_BD", "0") != "1" and os.path.exists(ref_rd_path)
            and time.time() - t_start < 0.72 * budget):
        with open(ref_rd_path) as f:
            ref_meta = json.load(f)
        bw, bh, bn = ref_meta["width"], ref_meta["height"], ref_meta["frames"]
        bd_frames = make_frames(bw, bh, bn)
        test_pts = []
        test_detail = []
        for q in (110, 150, 190, 230):
            if time.time() - t_start > 0.90 * budget:
                break
            enc = Encoder(EncoderConfig(width=bw, height=bh, qindex=q,
                                        mode_decision="jax", keyint=bn, minigop=4))
            pkts = []
            for f in bd_frames:
                pkts += enc.send_frame(*f)
            pkts += enc.flush()
            shown2 = {}
            rec_by_disp = {}
            for p in pkts:
                if p.recon is not None and p.disp_idx is not None:
                    rec_by_disp[p.disp_idx] = p.recon[0]
                if p.shown_disp_idx is not None:
                    shown2[p.shown_disp_idx] = rec_by_disp[p.shown_disp_idx]
            size = sum(len(p.tu) for p in pkts)
            kbps = size * 8 * 30.0 / bn / 1000.0
            ps = psnr_y(shown2, bd_frames)
            test_pts.append((kbps, ps))
            test_detail.append(dict(q=q, kbps=round(kbps, 2), psnr=round(ps, 3)))
        ref_pts = [(pt["kbps"], pt["psnr"]) for pt in ref_meta["points"]]
        if len(test_pts) >= 2:
            result["bd_rate_vs_ref_pct"] = round(bd_rate(ref_pts, test_pts), 2)
            result["bd_rate_clip"] = f"{bw}x{bh} {bn}f minigop4 vs SvtAv1EncApp p8 CRF"
            result["bd_points"] = test_detail
            result["ref_points"] = ref_meta["points"]
            print(json.dumps(result), flush=True)

    if os.environ.get("BENCH_SKIP_INTRA", "0") == "1":
        return
    # self-budget: the driver gives the whole bench a fixed wall-clock
    # window; the intra section is secondary — skip it rather than lose
    # the (already printed) primary result to a timeout
    if time.time() - t_start > 0.62 * budget:
        return

    shown_recon = {}
    batch = int(os.environ.get("BENCH_BATCH", 8))
    intra = run_config(dict(intra_batch=batch))
    result.update({
        "intra_fps": round(intra["fps"], 4),
        "intra_vs_baseline": round(intra["fps"] / REF["intra_fps"], 5),
        "intra_psnr_db": round(intra["psnr"], 3),
        "intra_ref_psnr_db": REF["intra_psnr"],
        "intra_bytes_per_frame": round(intra["bpf"], 1),
        "intra_ref_bytes_per_frame": round(REF["intra_bytes"], 1),
        "intra_warmup_s": round(intra["warm"], 1),
        "intra_stages_s": intra["stages"],
    })
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
