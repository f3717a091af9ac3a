"""End-to-end intra encode/decode conformance (model: reference test/e2e_test/
SvtAv1E2EFramework: encode -> decode -> compare recon + check PSNR)."""
import numpy as np
import pytest

from svtav1_tpu.decode.decoder import decode_temporal_unit
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig


def synth_frame(w, h, seed=0, noise=4.0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 60 * np.sin(xx / 17.0) + 40 * np.cos(yy / 11.0) + 30 * np.sin((xx + yy) / 31.0)
         + rng.normal(0, noise, (h, w))).clip(0, 255).astype(np.uint8)
    u = (128 + 30 * np.sin(xx[::2, ::2] / 23.0)).clip(0, 255).astype(np.uint8)
    v = (128 - 25 * np.cos(yy[::2, ::2] / 19.0)).clip(0, 255).astype(np.uint8)
    return y, u, v


def roundtrip(w, h, qindex, seed=0):
    from svtav1_tpu.utils import aomdec

    y, u, v = synth_frame(w, h, seed)
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=qindex))
    tu, recon = enc.encode_frame(y, u, v)
    dy, du, dv, drecon = decode_temporal_unit(tu)
    for i in range(3):
        assert np.array_equal(recon[i], drecon[i]), f"plane {i} recon mismatch"
    aomdec.verify_tus([tu], [(dy, du, dv)])  # independent conformance oracle
    mse = ((dy.astype(float) - y.astype(float)) ** 2).mean()
    psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
    return len(tu), psnr, (dy, du, dv)


@pytest.mark.parametrize("qindex", [60, 120, 200])
def test_roundtrip_128x64(qindex):
    size, psnr, _ = roundtrip(128, 64, qindex)
    assert psnr > 25.0, psnr


def test_roundtrip_unaligned_dims():
    """88x56: frame not SB-aligned -> forced boundary partitions."""
    size, psnr, _ = roundtrip(88, 56, 120)
    assert psnr > 25.0


def test_quality_monotonic_in_q():
    s_hi, p_hi, _ = roundtrip(128, 128, 40)
    s_lo, p_lo, _ = roundtrip(128, 128, 220)
    assert p_hi > p_lo
    assert s_hi > s_lo


def test_near_lossless_q0():
    y, u, v = synth_frame(64, 64, 3, noise=2.0)
    enc = Encoder(EncoderConfig(width=64, height=64, qindex=4))
    tu, recon = enc.encode_frame(y, u, v)
    dy, du, dv, _ = decode_temporal_unit(tu)
    mse = ((dy.astype(float) - y.astype(float)) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) > 44.0


@pytest.mark.parametrize("tcl,trl", [(1, 0), (0, 1), (1, 1)])
def test_tiles_roundtrip(tcl, trl):
    """Tile independence (model: reference TileIndependenceTest)."""
    y, u, v = synth_frame(256, 128, 5)
    enc = Encoder(EncoderConfig(width=256, height=128, qindex=120, mode_decision="jax",
                                tile_cols_log2=tcl, tile_rows_log2=trl))
    tu, recon = enc.encode_frame(y, u, v)
    dy, du, dv, drecon = decode_temporal_unit(tu)
    for i in range(3):
        assert np.array_equal(recon[i], drecon[i])
    from svtav1_tpu.utils import aomdec

    aomdec.verify_tus([tu], [(dy, du, dv)])  # tile streams through libaom too
    mse = ((dy.astype(float) - y.astype(float)) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 30.0
