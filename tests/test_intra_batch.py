"""Batched all-intra device pipeline: packets must decode bit-exactly
(including the on-device DLF + CDEF filter stage and its signaled params)."""
import numpy as np

from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig


def _frames(w, h, n, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = (120 + 60 * np.sin((xx + 5 * t) / 11.0) + 40 * np.cos(yy / 7.0)
             + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.uint8)
        u = (128 + 30 * np.sin(xx[::2, ::2] / 17.0)).clip(0, 255).astype(np.uint8)
        v = (128 - 25 * np.cos(yy[::2, ::2] / 13.0)).clip(0, 255).astype(np.uint8)
        out.append((y, u, v))
    return out


def test_intra_batch_decodes_bit_exact():
    w, h = 128, 96
    frames = _frames(w, h, 5)
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=72, mode_decision="jax",
                                intra_batch=2))
    pkts = []
    for f in frames:
        pkts += enc.send_frame(*f)
    pkts += enc.flush()
    assert len(pkts) == 5
    dec = Decoder()
    for pkt in pkts:
        dy, du, dv, drecon = dec.decode_tu(pkt.tu)
        for i in range(3):
            assert (drecon[i] == pkt.recon[i]).all(), f"frame {pkt.disp_idx} plane {i}"
        assert dy is not None


def test_intra_batch_matches_unbatched_md():
    """MD decisions are batch-size-invariant (filters may pick different
    CDEF strengths than the host search, so compare with filters off)."""
    w, h = 128, 64
    frames = _frames(w, h, 3, seed=4)
    cfg = dict(width=w, height=h, qindex=100, mode_decision="jax",
               enable_dlf=False, enable_cdef=False)
    e1 = Encoder(EncoderConfig(**cfg, intra_batch=3))
    e2 = Encoder(EncoderConfig(**cfg))
    p1 = []
    for f in frames:
        p1 += e1.send_frame(*f)
    p1 += e1.flush()
    p2 = [e2.send_frame(*f)[0] for f in frames]
    for a, b in zip(p1, p2):
        assert a.tu == b.tu
