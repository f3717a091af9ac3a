"""Arbitrary even frame dimensions: pad to mi-aligned area, crop at display."""
import numpy as np

from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig


def test_non_multiple_of_8_dims():
    for (W, H) in ((100, 52), (68, 36), (90, 70)):
        rng = np.random.default_rng(1)
        base = rng.integers(0, 255, (H + 16, W + 16), np.int32)
        enc = Encoder(EncoderConfig(width=W, height=H, qindex=110, keyint=2))
        dec = Decoder()
        for t in range(2):
            y = base[t : t + H, 2 * t : 2 * t + W]
            u = base[t : t + H : 2, 2 * t : 2 * t + W : 2] // 2
            v = base[t : t + H : 2, 2 * t : 2 * t + W : 2] // 3
            tu, recon = enc.encode_frame(y, u, v)
            dy, du, dv, drecon = dec.decode_tu(tu)
            for pl in range(3):
                assert np.array_equal(recon[pl], drecon[pl]), (W, H, t, pl)
            assert dy.shape == (H, W) and du.shape == (H // 2, W // 2)
