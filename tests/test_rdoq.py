"""RDOQ (batched level/eob optimization) tests.

Reference behavior: full_loop.c:1124 `svt_av1_optimize_b` — the trellis
refines dead-zone levels to lower true RD cost. Here: the frozen-context
two-pass device twin must (a) strictly improve aggregate exact RD cost on
synthetic txbs, (b) shrink the bitstream at ~equal PSNR end-to-end, with
streams still decoding conformantly (recon identity).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from svtav1_tpu.codec import rate_jax  # noqa: E402
from svtav1_tpu.constants.av1 import TxSize, TxType  # noqa: E402
from svtav1_tpu.constants.cdf import FrameContext  # noqa: E402
from svtav1_tpu.decode.decoder import Decoder  # noqa: E402
from svtav1_tpu.ops import quantize as Q  # noqa: E402
from svtav1_tpu.ops import transforms as T  # noqa: E402
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig  # noqa: E402
from svtav1_tpu.pipeline.intra_md import rd_lambda  # noqa: E402


@pytest.mark.parametrize("qindex", [60, 120, 200])
@pytest.mark.parametrize("n,txs", [(8, TxSize.TX_8X8), (16, TxSize.TX_16X16)])
def test_rdoq_improves_exact_rd(qindex, n, txs):
    fc = FrameContext(qindex)
    lam = float(rd_lambda(qindex, 8))
    rdoq = rate_jax.make_rdoq_fn(fc, int(txs), 0)
    bits_fn = rate_jax.make_txb_bits_fn(fc, int(txs), int(TxType.DCT_DCT), 0, 0, 0)
    rng = np.random.default_rng(3)
    gains = []
    for _ in range(12):
        res = (rng.integers(-50, 50) + rng.normal(0, 16, (n, n))
               + np.outer(np.linspace(-18, 18, n), np.ones(n))).astype(np.int32)
        c = T.fwd_txfm2d_np(res, int(TxType.DCT_DCT), 8)
        lv0 = Q.quantize_np(c, qindex, n, n)
        lv1 = np.asarray(rdoq(jnp.asarray(lv0[None]), jnp.asarray(c[None]),
                              Q.dc_q(qindex, 8), Q.ac_q(qindex, 8), lam))[0]

        def cost(lv):
            d = Q.dequantize_np(lv, qindex, n, n)
            pix = T.inv_txfm2d_add_np(d, np.zeros((n, n), np.int32),
                                      int(TxType.DCT_DCT), 8)
            sse = float(((pix - res).astype(np.float64) ** 2).sum())
            return sse + lam * float(bits_fn(jnp.asarray(lv[None]))[0])

        c0, c1 = cost(lv0), cost(lv1)
        gains.append(c0 - c1)
        # levels only ever move toward zero
        assert (np.abs(lv1) <= np.abs(lv0)).all()
        assert (np.sign(lv1)[lv1 != 0] == np.sign(lv0)[lv1 != 0]).all()
    gains = np.array(gains)
    # aggregate strictly better; per-sample regressions (frozen-context
    # approximation) bounded well below the mean gain
    assert gains.mean() > 0
    assert gains.min() > -0.5 * max(gains.mean(), 1.0) - 2000.0


def _moving_clip(w, h, n, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h + 8 * n, w + 8 * n), np.int32)
    # smooth it so RDOQ has level-1 tails to trim (pure noise has none)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
            + np.roll(base, (1, 1), (0, 1))) // 4
    frames = []
    for t in range(n):
        dy, dx = 2 * t, 3 * t
        y = base[dy : dy + h, dx : dx + w].astype(np.int32)
        u = (base[dy : dy + h : 2, dx : dx + w : 2] // 2 + 64).astype(np.int32)
        v = (base[dy : dy + h : 2, dx : dx + w : 2] // 3 + 80).astype(np.int32)
        frames.append((y, u, v))
    return frames


def _roundtrip(frames, w, h, rdoq, qindex=120, keyint=4):
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=qindex, keyint=keyint,
                                mode_decision="jax", enable_rdoq=rdoq))
    dec = Decoder()
    total, psnrs, tus, shown = 0, [], [], []
    for i, (y, u, v) in enumerate(frames):
        tu, recon = enc.encode_frame(y, u, v)
        dy, du, dv, drecon = dec.decode_tu(tu)
        for pl in range(3):
            assert np.array_equal(recon[pl], drecon[pl]), \
                f"rdoq={rdoq} frame {i} plane {pl} recon mismatch"
        mse = ((dy.astype(float) - y) ** 2).mean()
        psnrs.append(10 * np.log10(255 ** 2 / max(mse, 1e-9)))
        total += len(tu)
        tus.append(tu)
        shown.append((dy, du, dv))
    from svtav1_tpu.utils import aomdec

    aomdec.verify_tus(tus, shown)  # independent conformance oracle
    return total, float(np.mean(psnrs))


def test_rdoq_e2e_conformance_and_size():
    """RDOQ shifts the rate operating point down, so equal-q PSNR drops by
    design; the BD-rate-style gate is strict domination across the sweep:
    rdoq-on at a LOWER q must beat rdoq-off at a higher q on BOTH axes
    (measured r3: on@q100 5619B/35.75dB vs off@q120 6334B/35.18dB)."""
    w, h = 96, 64
    frames = _moving_clip(w, h, 4)
    b_off, p_off = _roundtrip(frames, w, h, rdoq=False, qindex=120)
    b_on, p_on = _roundtrip(frames, w, h, rdoq=True, qindex=100)
    assert b_on < b_off, f"rdoq point not dominating on size: {b_on} vs {b_off}"
    assert p_on > p_off, f"rdoq point not dominating on psnr: {p_on:.2f} vs {p_off:.2f}"
