"""Device inter pipeline e2e: encode with mode_decision='jax' (device ME/MC/
MD + wavefront commit + device filters), decode with the conformance
decoder, assert recon identity; quality parity vs the numpy reference MD."""
import numpy as np
import pytest

from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig


def moving_clip(w, h, n, seed=7, step=(1, 2), smooth=True):
    rng = np.random.default_rng(seed)
    H, W = h + 8 * n, w + 8 * n
    if smooth:
        base = rng.normal(0, 55, (H // 4 + 2, W // 4 + 2))
        base = np.kron(base, np.ones((4, 4)))[:H, :W]
        base = (128 + base + rng.normal(0, 4, (H, W))).clip(0, 255).astype(np.int32)
    else:
        base = rng.integers(0, 255, (H, W), np.int32)
    frames = []
    for t in range(n):
        dy, dx = step[0] * t, step[1] * t
        y = base[dy : dy + h, dx : dx + w].astype(np.int32)
        u = (base[dy : dy + h : 2, dx : dx + w : 2] // 2 + 64).astype(np.int32)
        v = (base[dy : dy + h : 2, dx : dx + w : 2] // 3 + 80).astype(np.int32)
        frames.append((y, u, v))
    return frames


def run(frames, w, h, md, qindex=100, keyint=8, minigop=1, rdoq=True):
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=qindex, keyint=keyint,
                                minigop=minigop, mode_decision=md, enable_rdoq=rdoq))
    dec = Decoder()
    sizes, psnrs = [], []
    pkts = []
    for y, u, v in frames:
        pkts += enc.send_frame(y, u, v)
    pkts += enc.flush()
    shown = {}
    for i, pkt in enumerate(pkts):
        dy, du, dv, drecon = dec.decode_tu(pkt.tu)
        if pkt.recon is not None:
            for pl in range(3):
                assert np.array_equal(pkt.recon[pl], drecon[pl]), \
                    f"pkt {i} plane {pl} recon mismatch"
        sizes.append(len(pkt.tu))
        if pkt.shown_disp_idx is not None and dy is not None:
            shown[pkt.shown_disp_idx] = dy
    for d, yd in shown.items():
        mse = ((yd.astype(float) - frames[d][0]) ** 2).mean()
        psnrs.append(10 * np.log10(255 ** 2 / max(mse, 1e-9)))
    assert len(shown) == len(frames)
    return sizes, psnrs


def test_device_inter_conformance_lowdelay():
    frames = moving_clip(96, 64, 5)
    sizes, psnrs = run(frames, 96, 64, "jax", qindex=100, keyint=5)
    assert min(psnrs) > 30.0
    # translation exploited: inter frames well below the key frame
    assert max(sizes[1:]) < 0.6 * sizes[0]


def test_device_inter_conformance_hierarchical():
    frames = moving_clip(96, 64, 5, step=(0, 1))
    sizes, psnrs = run(frames, 96, 64, "jax", qindex=110, keyint=5, minigop=4)
    assert min(psnrs) > 28.0


def test_device_inter_odd_dims():
    frames = moving_clip(68, 36, 3, step=(1, 1))
    sizes, psnrs = run(frames, 68, 36, "jax", qindex=90, keyint=3)
    assert min(psnrs) > 30.0


def test_device_vs_numpy_quality():
    """The device path must be within tolerance of the numpy oracle on both
    PSNR and size (VERDICT r1: no fast-but-dumb / smart-but-slow split).
    RDOQ (device-only, shifts the operating point) is pinned off here; its
    BD-domination gate lives in test_rdoq.py."""
    frames = moving_clip(96, 64, 4, step=(1, 2))
    s_np, p_np = run(frames, 96, 64, "numpy", qindex=100, keyint=4)
    s_dx, p_dx = run(frames, 96, 64, "jax", qindex=100, keyint=4, rdoq=False)
    assert np.mean(p_dx) > np.mean(p_np) - 1.0, (p_dx, p_np)
    assert sum(s_dx) < 1.35 * sum(s_np), (s_dx, s_np)
