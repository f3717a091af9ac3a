"""CDF lifecycle: primary-ref frame-context inheritance + frame-end update.

The reference seeds each frame's CDFs from the primary ref's saved context
(md_config_process.c:676-695) and stores the adapted end-of-frame state with
every refreshed DPB slot (spec decode_frame_wrapup / primary_ref_frame).
Gates: streams stay conformant (decoder recon == encoder recon) and
inheritance strictly shrinks keyint-N streams vs fresh-CDFs-per-frame.
"""
import numpy as np
import pytest

from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig


def _frames(w, h, n, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w), np.int32)
    out = []
    for i in range(n):
        y = np.roll(base, i * 2, axis=1) + rng.integers(-4, 5, (h, w))
        y = np.clip(y, 0, 255).astype(np.int32)
        out.append((y, np.full((h // 2, w // 2), 100 + i, np.int32),
                    np.full((h // 2, w // 2), 140 - i, np.int32)))
    return out


def _run(cfg_kwargs, frames):
    enc = Encoder(EncoderConfig(**cfg_kwargs))
    pkts = []
    for f in frames:
        pkts += enc.send_frame(*f)
    pkts += enc.flush()
    dec = Decoder()
    total = 0
    for p in pkts:
        total += len(p.tu)
        _y, _u, _v, recon = dec.decode_tu(p.tu)
        if p.recon is not None:
            assert recon is not None
            for pl in range(3):
                assert np.array_equal(recon[pl], p.recon[pl]), \
                    f"decoder recon mismatch plane {pl} disp {p.disp_idx}"
    return total


@pytest.mark.parametrize("md", ["numpy", "jax"])
def test_low_delay_conformance_and_gain(md):
    w, h = 64, 64
    frames = _frames(w, h, 6)
    kw = dict(width=w, height=h, qindex=120, keyint=8, mode_decision=md)
    inherit = _run(dict(cdf_inheritance=True, **kw), frames)
    fresh = _run(dict(cdf_inheritance=False, **kw), frames)
    assert inherit < fresh, (inherit, fresh)


def test_hierarchical_conformance():
    w, h = 96, 64
    frames = _frames(w, h, 9, seed=3)
    _run(dict(width=w, height=h, qindex=100, keyint=9, minigop=4,
              mode_decision="numpy", cdf_inheritance=True), frames)


def test_multitile_intra_conformance():
    # multi-tile: tile 0's end state is the stored context; later tiles
    # restart from the frame-initial state
    w, h = 128, 128
    frames = _frames(w, h, 2, seed=5)
    _run(dict(width=w, height=h, qindex=120, keyint=1, mode_decision="jax",
              tile_cols_log2=1, cdf_inheritance=True), frames)
