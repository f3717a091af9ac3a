"""One-pass VBR: bitrate accuracy + conformance.

Behavior model: rc_process.c svt_av1_rc_bits_per_mb (:602) projection,
av1_rc_regulate_q selection, correction-factor postencode update (:2236,
:2407). Gate: a keyint-window encode lands within +-10% of the target
bitrate and every stream stays conformant (in-repo decoder + libaom)."""
import numpy as np
import pytest

from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig
from svtav1_tpu.utils import aomdec


def _clip(w, h, n, seed=11):
    """Translation + fresh per-frame noise: the noise keeps the content
    able to absorb bits at ANY target (a purely predictable clip makes
    VBR undershoot by design — that would test the content, not the RC)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h + 4 * n, w + 4 * n), np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
            + np.roll(base, (1, 1), (0, 1))) // 4
    out = []
    for t in range(n):
        y = (base[t : t + h, 2 * t : 2 * t + w]
             + rng.integers(-10, 11, (h, w))).clip(0, 255).astype(np.int32)
        u = (base[t : t + h : 2, 2 * t : 2 * t + w : 2] // 2 + 64
             + rng.integers(-6, 7, (h // 2, w // 2))).clip(0, 255).astype(np.int32)
        v = (base[t : t + h : 2, 2 * t : 2 * t + w : 2] // 3 + 80
             + rng.integers(-6, 7, (h // 2, w // 2))).clip(0, 255).astype(np.int32)
        out.append((y, u, v))
    return out


def _encode_vbr(frames, w, h, kbps, fps, keyint):
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=120, keyint=keyint,
                                rc_mode="vbr", target_kbps=kbps, fps=fps,
                                mode_decision="jax"))
    dec = Decoder()
    tus, shown, total_bits = [], [], 0
    for f in frames:
        for p in enc.send_frame(*f):
            dy, du, dv, drec = dec.decode_tu(p.tu)
            for pl in range(3):
                assert np.array_equal(p.recon[pl], drec[pl])
            tus.append(p.tu)
            shown.append((dy, du, dv))
            total_bits += len(p.tu) * 8
    for p in enc.flush():
        dy, du, dv, drec = dec.decode_tu(p.tu)
        tus.append(p.tu)
        shown.append((dy, du, dv))
        total_bits += len(p.tu) * 8
    aomdec.verify_tus(tus, shown)
    return total_bits


@pytest.mark.parametrize("kbps", [300.0, 900.0])
def test_vbr_hits_target(kbps):
    w, h, n, fps = 160, 96, 24, 30.0
    frames = _clip(w, h, n)
    bits = _encode_vbr(frames, w, h, kbps, fps, keyint=24)
    actual_kbps = bits * fps / n / 1000.0
    assert abs(actual_kbps - kbps) / kbps < 0.10, \
        f"target {kbps} kbps, got {actual_kbps:.1f}"


def test_vbr_rate_ordering():
    """Doubling the target must raise both spend and quality ordering."""
    w, h, n, fps = 160, 96, 16, 30.0
    frames = _clip(w, h, n, seed=5)
    b_lo = _encode_vbr(frames, w, h, 250.0, fps, keyint=16)
    b_hi = _encode_vbr(frames, w, h, 1000.0, fps, keyint=16)
    assert b_hi > 1.5 * b_lo


def test_vbr_string_api():
    from svtav1_tpu import params as P

    cfg = P.config_from_params({"rc": "vbr", "tbr": "500", "fps": "30",
                                "keyint": "8", "mode-decision": "jax"},
                               width=96, height=64)
    enc = Encoder(cfg)
    assert enc.rc is not None and type(enc.rc).__name__ == "VbrController"
