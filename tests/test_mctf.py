"""MCTF (temporal filtering of key frames) — quality-gain + conformance.

Behavior model: temporal_filtering.c produce_temporally_filtered_pic
(:2752) / apply_filtering_block_plane_wise (:1382). The filter changes only
the source, so streams stay conformant; the gate is the reference's reason
to exist: on a noisy static scene the filtered key costs fewer bits AND the
decoded output lands closer to the clean signal."""
import numpy as np

from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.ops import tf_jax
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig
from svtav1_tpu.utils import aomdec


def _noisy_static(w, h, n, sigma=6.0, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    clean_y = (128 + 60 * np.sin(xx / 19.0) + 45 * np.cos(yy / 13.0)).clip(0, 255)
    clean_u = np.full((h // 2, w // 2), 120.0)
    clean_v = np.full((h // 2, w // 2), 130.0)
    frames = []
    for _t in range(n):
        y = (clean_y + rng.normal(0, sigma, (h, w))).clip(0, 255).astype(np.int32)
        u = (clean_u + rng.normal(0, sigma, (h // 2, w // 2))).clip(0, 255).astype(np.int32)
        v = (clean_v + rng.normal(0, sigma, (h // 2, w // 2))).clip(0, 255).astype(np.int32)
        frames.append((y, u, v))
    return frames, clean_y


def test_filter_reduces_noise():
    """Direct filter check: output closer to the clean signal than input."""
    w, h = 128, 64
    frames, clean_y = _noisy_static(w, h, 5)
    out = tf_jax.filter_frame(list(frames[2]), [list(frames[i]) for i in (0, 1, 3, 4)],
                              qindex=120)
    err_in = float(((frames[2][0] - clean_y) ** 2).mean())
    err_out = float(((out[0] - clean_y) ** 2).mean())
    assert err_out < 0.5 * err_in, (err_in, err_out)


def _run(frames, w, h, tf):
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=140, keyint=8,
                                mode_decision="jax", enable_tf=tf))
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
        bits += len(p.tu) * 8
    aomdec.verify_tus(tus, shown)
    return bits, shown


def test_mctf_e2e_gain():
    w, h = 128, 64
    frames, clean_y = _noisy_static(w, h, 8)
    bits_off, shown_off = _run(frames, w, h, tf=False)
    bits_on, shown_on = _run(frames, w, h, tf=True)

    def psnr_clean(shown):
        vals = []
        for (dy, _u, _v) in shown:
            mse = ((dy.astype(np.float64) - clean_y) ** 2).mean()
            vals.append(10 * np.log10(255 ** 2 / max(mse, 1e-9)))
        return float(np.mean(vals))

    # fewer bits AND closer to the clean signal
    assert bits_on < bits_off, (bits_on, bits_off)
    assert psnr_clean(shown_on) > psnr_clean(shown_off)
