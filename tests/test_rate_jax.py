"""Device txb rate estimator must match the numpy exact-path estimator.

rate_jax.make_txb_bits_fn is the batched JAX twin of rate.txb_bits (itself
validated against the real writer, tests/test_rate.py); here we require
near-exact agreement across tx sizes, types, plane types and sparsity
patterns, including all-zero blocks, high levels (golomb) and negative DCs.
"""
import numpy as np
import pytest

import jax

from svtav1_tpu.codec import rate as rate_np
from svtav1_tpu.codec import rate_jax
from svtav1_tpu.codec import txb as txb_mod
from svtav1_tpu.constants.av1 import TX_H, TX_W, TxSize, TxType
from svtav1_tpu.constants.cdf import FrameContext


CASES = [
    (int(TxSize.TX_4X4), int(TxType.DCT_DCT), 0),
    (int(TxSize.TX_4X4), int(TxType.ADST_ADST), 1),
    (int(TxSize.TX_8X8), int(TxType.DCT_DCT), 0),
    (int(TxSize.TX_8X8), int(TxType.ADST_DCT), 0),
    (int(TxSize.TX_16X16), int(TxType.DCT_ADST), 0),
    (int(TxSize.TX_16X16), int(TxType.V_DCT), 0),  # 1-D class
    (int(TxSize.TX_32X32), int(TxType.DCT_DCT), 1),
    (int(TxSize.TX_64X64), int(TxType.DCT_DCT), 0),  # adjusted to 32x32
]


@pytest.mark.parametrize("tx_size,tx_type,plane_type", CASES)
def test_txb_bits_matches_numpy(tx_size, tx_type, plane_type):
    fc = FrameContext(100)
    adj = txb_mod.adjusted_tx_size(tx_size)
    h, w = int(TX_H[adj]), int(TX_W[adj])
    rng = np.random.default_rng(tx_size * 37 + tx_type)
    B = 12
    levels = np.zeros((B, h, w), np.int32)
    # varied sparsity: decaying magnitudes, a dense block, an all-zero block,
    # and one with very large levels (golomb path)
    for b in range(B - 2):
        density = rng.uniform(0.02, 0.6)
        mask = rng.random((h, w)) < density * np.exp(-(np.add.outer(np.arange(h), np.arange(w))) / (h + w))
        mag = rng.integers(1, 9, (h, w))
        levels[b] = mask * mag * rng.choice([-1, 1], (h, w))
    levels[B - 2] = 0
    levels[B - 1, :2, :2] = [[-900, 17], [3, 1]]

    skip_ctx, dc_ctx = (0, 0) if plane_type == 0 else (7, 0)
    fn = jax.jit(rate_jax.make_txb_bits_fn(fc, tx_size, tx_type, plane_type, skip_ctx, dc_ctx))
    got = np.asarray(fn(levels))
    want = np.array([rate_np.txb_bits(fc, lv, tx_size, tx_type, plane_type, skip_ctx, dc_ctx)
                     for lv in levels])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_mv_cost_lut_matches_mv_bits():
    fc = FrameContext(100)
    lut = rate_jax.mv_component_cost_lut(fc, max_abs=512)
    joint = rate_jax.mv_joint_cost(fc)
    for mv in [(0, 0), (8, 0), (0, -16), (24, -128), (510, 2)]:
        want = rate_np.mv_bits(fc, mv, (0, 0))
        got = float(joint[int(mv[0] != 0), int(mv[1] != 0)]
                    + lut[0, abs(mv[0])] + lut[1, abs(mv[1])])
        assert abs(got - want) < 1e-3, (mv, got, want)
