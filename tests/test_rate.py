"""Rate estimation tests: BitCounter vs the real range coder.

The estimator runs the actual symbol writers against a bit counter, so its
totals must track real encoded sizes closely (md_rate_estimation.c analog)."""
import numpy as np

from svtav1_tpu.codec import rate, txb as txb_mod
from svtav1_tpu.codec.mv import MvCoder
from svtav1_tpu.constants.av1 import TxSize, TxType
from svtav1_tpu.constants.cdf import FrameContext
from svtav1_tpu.entropy.range_coder import RangeEncoder


def test_bitcounter_matches_coder_on_txbs():
    rng = np.random.default_rng(3)
    fc_est = FrameContext(100)
    fc_real = FrameContext(100)
    est_bits = 0.0
    enc = RangeEncoder()
    for _ in range(30):
        lv = np.zeros((16, 16), np.int32)
        n = int(rng.integers(1, 30))
        pos = rng.integers(0, 16, (n, 2))
        lv[pos[:, 0], pos[:, 1]] = rng.integers(-40, 41, n)
        if not np.any(lv):
            lv[0, 0] = 1
        est_bits += rate.txb_bits(fc_est, lv, int(TxSize.TX_16X16), int(TxType.DCT_DCT), 0, 0, 0)
        # real coding without adaptation for an apples-to-apples check
        txs = txb_mod.get_txsize_entropy_ctx(int(TxSize.TX_16X16))
        enc.encode_symbol_n(0, fc_real["txb_skip"][txs][0], 2)
        txb_mod.write_coeffs_txb_body(enc, fc_real, lv, int(TxSize.TX_16X16),
                                      int(TxType.DCT_DCT), 0, 0, update=False)
    real_bits = len(enc.done()) * 8
    # estimator mirrors the coder's reduced-precision probabilities; the
    # residual is the state-dependent (r >> 8) truncation, ~1% + flush slack
    assert abs(est_bits - real_bits) < 0.02 * real_bits + 64, (est_bits, real_bits)


def test_fast_estimator_matches_exact():
    """Vectorized txb_bits vs the writer-driven BitCounter path."""
    from svtav1_tpu.codec import txb as txb_mod
    from svtav1_tpu.constants.av1 import TX_H, TX_W

    fc = FrameContext(100)
    rng = np.random.default_rng(3)
    for _ in range(120):
        ts = int(rng.choice([int(TxSize.TX_4X4), int(TxSize.TX_8X8), int(TxSize.TX_16X16),
                             int(TxSize.TX_32X32), int(TxSize.TX_8X16), int(TxSize.TX_16X8)]))
        adj = txb_mod.adjusted_tx_size(ts)
        h, w = int(TX_H[adj]), int(TX_W[adj])
        lv = np.zeros((h, w), np.int32)
        n = int(rng.integers(0, max(2, h * w // 3)))
        if n:
            lv.reshape(-1)[rng.integers(0, h * w, n)] = rng.integers(-60, 61, n)
        tt = int(rng.choice([int(TxType.DCT_DCT), int(TxType.ADST_ADST), 10, 13]))
        pt = int(rng.integers(0, 2))
        tctx = int(rng.integers(0, 3)) + (7 if pt else 0)
        dctx = int(rng.integers(0, 3))
        fast = rate.txb_bits(fc, lv, ts, tt, pt, tctx, dctx)
        exact = rate.txb_bits_exact(fc, lv, ts, tt, pt, tctx, dctx)
        # raw sign/golomb bits counted as exactly 1.0 in the fast path
        assert abs(fast - exact) < 0.5, (fast, exact, ts, tt)


def test_mv_bits_reasonable():
    fc = FrameContext(100)
    small = rate.mv_bits(fc, (2, 0), (0, 0))
    big = rate.mv_bits(fc, (512, -512), (0, 0))
    zero = rate.mv_bits(fc, (0, 0), (0, 0))
    assert zero < small < big
    assert zero < 4.0  # joint=ZERO only (default p = 1/8 -> ~3 bits)


def test_symbol_bits_distribution():
    fc = FrameContext(100)
    cdf = fc["skip"][0]
    b0 = rate.symbol_bits(cdf, 0, 2)
    b1 = rate.symbol_bits(cdf, 1, 2)
    # total probability must be ~1 -> 2^-b0 + 2^-b1 ~ 1
    assert abs(2 ** -b0 + 2 ** -b1 - 1.0) < 1e-3
