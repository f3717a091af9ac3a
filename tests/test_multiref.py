"""Multi-reference single prediction (LAST + GOLDEN [+ ALTREF]).

Behavior model: av1_generate_rps_info ref lists (pd_process.c:1333) — the
sequence key stays referenceable as GOLDEN from a protected DPB slot.
Gates: conformance through both decoders, GOLDEN actually chosen when it is
the better reference (flash/occlusion content), and a rate win vs 1-ref."""
import numpy as np
import pytest

from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig
from svtav1_tpu.utils import aomdec


def _flash_clip(w, h, n, seed=9):
    """Static scene with a one-frame global flash in the middle: frames
    after the flash predict far better from the key (GOLDEN) than from the
    flashed LAST frame."""
    rng = np.random.default_rng(seed)
    base_y = rng.integers(0, 200, (h, w), np.int32)
    base_u = rng.integers(40, 200, (h // 2, w // 2), np.int32)
    base_v = rng.integers(40, 200, (h // 2, w // 2), np.int32)
    out = []
    for t in range(n):
        if t == n // 2:  # one frame of unrelated content (occlusion/flash)
            out.append((rng.integers(0, 255, (h, w), np.int32),
                        rng.integers(0, 255, (h // 2, w // 2), np.int32),
                        rng.integers(0, 255, (h // 2, w // 2), np.int32)))
        else:
            out.append((base_y, base_u, base_v))
    return out


def _run(frames, w, h, n_refs):
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=120, keyint=len(frames),
                                mode_decision="jax", n_refs=n_refs))
    dec = Decoder()
    tus, shown, bits = [], [], 0
    pkts = []
    for f in frames:
        pkts += enc.send_frame(*f)
    pkts += enc.flush()
    for p in pkts:
        dy, du, dv, drec = dec.decode_tu(p.tu)
        for pl in range(3):
            assert np.array_equal(p.recon[pl], drec[pl])
        tus.append(p.tu)
        shown.append((dy, du, dv))
        bits += len(p.tu)
    aomdec.verify_tus(tus, shown)
    return bits


def test_golden_ref_conformance_and_gain():
    w, h = 96, 64
    frames = _flash_clip(w, h, 6)
    b3 = _run(frames, w, h, n_refs=3)
    b1 = _run(frames, w, h, n_refs=2)
    # post-flash frames re-predict from GOLDEN: multi-ref must not lose,
    # and on this clip should win clearly
    assert b3 < b1, (b3, b1)


def test_golden_slot_survives_rotation():
    """More than 7 inter frames: the rotating slots 0..6 must not evict the
    key's slot-7 GOLDEN entry (encode would assert / desync otherwise)."""
    w, h = 64, 64
    rng = np.random.default_rng(2)
    base = rng.integers(0, 255, (h, w), np.int32)
    frames = []
    for t in range(11):
        y = np.roll(base, t, axis=1)
        frames.append((y, (y[::2, ::2] // 2 + 60), (y[::2, ::2] // 3 + 70)))
    b = _run(frames, w, h, n_refs=3)
    assert b > 0
