"""Transform validation (model: reference test/FwdTxfm2dAsmTest.cc, InvTxfm2dAsmTest.cc).

Three layers of checks:
1. Stage tables encode the *right math*: integer 1-D transforms match the
   ideal float DCT/ADST bases to within rounding.
2. fwd -> inv roundtrip reconstructs residuals to within a few LSBs for
   every (tx_size, tx_type) pair.
3. quant -> dequant -> inverse roundtrip bounded by quantizer step size.
"""
import math

import numpy as np
import pytest

from svtav1_tpu.constants.av1 import TX_H, TX_W, TX_TYPE_1D, Tx1D, TxSize, TxType
from svtav1_tpu.ops import transforms as T
from svtav1_tpu.ops import quantize as Q



def _rng(*key):
    import zlib

    return np.random.default_rng(zlib.crc32(repr(key).encode()))


def ideal_dct2(n):
    """Orthonormal DCT-II matrix (rows = basis)."""
    M = np.zeros((n, n))
    for k in range(n):
        for j in range(n):
            M[k, j] = math.cos(math.pi * (2 * j + 1) * k / (2 * n)) * math.sqrt(2 / n)
    M[0] /= math.sqrt(2)
    return M


def ideal_adst(n):
    """AV1 ADST basis: DST-VII for n=4 (sin((j+1)(2k+1)pi/(2n+1))),
    DST-IV-style sin((2j+1)(2k+1)pi/4n) for n=8,16. Orthonormal rows."""
    M = np.zeros((n, n))
    for k in range(n):
        for j in range(n):
            if n == 4:
                M[k, j] = math.sin(math.pi * (j + 1) * (2 * k + 1) / (2 * n + 1))
            else:
                M[k, j] = math.sin(math.pi * (2 * j + 1) * (2 * k + 1) / (4 * n))
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    return M


@pytest.mark.parametrize("n", [4, 8, 16, 32, 64])
def test_fdct_matches_ideal_basis(n):
    """fdct_n should be alpha * DCT2 for a scalar alpha (up to rounding)."""
    rng = _rng("fdct", n)
    x = rng.integers(-(2 ** 10), 2 ** 10, size=(64, n)).astype(np.int64)
    y = T.txfm1d_np(x, Tx1D.DCT, n, 12, inverse=False, clamp_range=None)
    ideal = x @ ideal_dct2(n).T
    # estimate alpha from energy ratio
    alpha = np.sqrt((y.astype(float) ** 2).sum() / (ideal ** 2).sum())
    err = np.abs(y - alpha * ideal)
    assert err.max() <= max(4.0, 2e-3 * np.abs(y).max()), (n, err.max(), alpha)
    # alpha should be ~ 2^k or 2^k*sqrt2 (structure sanity)
    l2 = math.log2(alpha)
    assert abs(l2 - round(l2 * 2) / 2) < 0.01, alpha


@pytest.mark.parametrize("n", [4, 8, 16])
def test_fadst_matches_ideal_basis(n):
    rng = _rng("fadst", n)
    x = rng.integers(-(2 ** 10), 2 ** 10, size=(64, n)).astype(np.int64)
    y = T.txfm1d_np(x, Tx1D.ADST, n, 12, inverse=False, clamp_range=None)
    ideal = x @ ideal_adst(n).T
    alpha = np.sqrt((y.astype(float) ** 2).sum() / (ideal ** 2).sum())
    # ADST basis rows may come out in a permuted/sign-flipped order vs ideal;
    # compare via correlation: every ideal basis row must be (anti)correlated
    # with exactly one integer output direction. Use Gram matrix instead.
    G_int = y.astype(float).T @ y.astype(float)
    G_ideal = (alpha ** 2) * (ideal.T @ ideal)
    rel = np.abs(G_int - G_ideal).max() / np.abs(G_ideal).max()
    assert rel < 2e-3, (n, rel)


@pytest.mark.parametrize("n", [4, 8, 16, 32, 64])
def test_idct_matches_ideal_basis(n):
    """idct_n (DCT-III) should invert fdct up to known power-of-2 scale."""
    rng = _rng("idct", n)
    x = rng.integers(-(2 ** 12), 2 ** 12, size=(32, n)).astype(np.int64)
    y = T.txfm1d_np(x, Tx1D.DCT, n, 12, inverse=True, clamp_range=None)
    ideal = x @ ideal_dct2(n)  # DCT-III = DCT-II^T
    alpha = np.sqrt((y.astype(float) ** 2).sum() / (ideal ** 2).sum())
    err = np.abs(y - alpha * ideal)
    assert err.max() <= max(4.0, 2e-3 * np.abs(y).max()), (n, err.max(), alpha)


ALL_SIZES = [(TxSize.TX_4X4, 4, 4), (TxSize.TX_8X8, 8, 8), (TxSize.TX_16X16, 16, 16),
             (TxSize.TX_32X32, 32, 32), (TxSize.TX_64X64, 64, 64), (TxSize.TX_4X8, 4, 8),
             (TxSize.TX_8X4, 8, 4), (TxSize.TX_8X16, 8, 16), (TxSize.TX_16X8, 16, 8),
             (TxSize.TX_16X32, 16, 32), (TxSize.TX_32X16, 32, 16), (TxSize.TX_32X64, 32, 64),
             (TxSize.TX_64X32, 64, 32), (TxSize.TX_4X16, 4, 16), (TxSize.TX_16X4, 16, 4),
             (TxSize.TX_8X32, 8, 32), (TxSize.TX_32X8, 32, 8), (TxSize.TX_16X64, 16, 64),
             (TxSize.TX_64X16, 64, 16)]


def tx_types_for(w, h):
    out = [TxType.DCT_DCT]
    if max(w, h) <= 32:
        out.append(TxType.IDTX)
    if max(w, h) <= 16:
        out += [TxType.ADST_DCT, TxType.DCT_ADST, TxType.ADST_ADST,
                TxType.FLIPADST_DCT, TxType.DCT_FLIPADST, TxType.FLIPADST_FLIPADST,
                TxType.ADST_FLIPADST, TxType.FLIPADST_ADST,
                TxType.V_DCT, TxType.H_DCT, TxType.V_ADST, TxType.H_ADST,
                TxType.V_FLIPADST, TxType.H_FLIPADST]
    return out


@pytest.mark.parametrize("tx_size,w,h", ALL_SIZES)
def test_fwd_inv_roundtrip(tx_size, w, h):
    rng = _rng("rt", int(tx_size))
    pred = np.full((4, h, w), 128, np.int32)
    if max(w, h) == 64:
        # 64-point dims normatively keep only 32x32 coeffs -> synthesize truly
        # band-limited residuals through the normative inverse itself.
        c0 = np.zeros((4, h, w), np.int32)
        c0[:, : min(h, 16), : min(w, 16)] = rng.integers(-500, 500, size=(4, min(h, 16), min(w, 16)))
        resid = (T.inv_txfm2d_add_np(c0, pred, TxType.DCT_DCT, bd=8) - pred).astype(np.int32)
        # rect 64-dim forwards run at reduced cos_bit -> coarser rounding;
        # assert unbiased small-RMS error rather than a tight max
        tol = 32
    else:
        resid = rng.integers(-255, 256, size=(4, h, w)).astype(np.int32)
        tol = 2
    for tt in tx_types_for(w, h):
        coeff = T.fwd_txfm2d_np(resid, tt, bd=8)
        recon = T.inv_txfm2d_add_np(coeff, pred, tt, bd=8)
        err = recon - (pred + resid)
        clipped = (pred + resid < 0) | (pred + resid > 255)
        err = np.where(clipped, 0, err)
        assert np.abs(err).max() <= tol, (tx_size.name, TxType(tt).name, np.abs(err).max())
        if max(w, h) == 64:
            rms = np.sqrt((err.astype(float) ** 2).mean())
            assert rms < 1.5, (tx_size.name, rms)


def test_fwd_inv_roundtrip_smooth_64():
    """Smooth content survives the 64-point 32x32 truncation nearly exactly."""
    yy, xx = np.mgrid[0:64, 0:64]
    resid = ((yy + xx) // 4 - 16).astype(np.int32)[None]
    pred = np.full((1, 64, 64), 128, np.int32)
    coeff = T.fwd_txfm2d_np(resid, TxType.DCT_DCT, bd=8)
    recon = T.inv_txfm2d_add_np(coeff, pred, TxType.DCT_DCT, bd=8)
    assert np.abs(recon - (pred + resid)).max() <= 2


@pytest.mark.parametrize("qindex", [20, 60, 120, 200])
def test_quant_roundtrip_error_bounded(qindex):
    rng = _rng("q", qindex)
    w = h = 16
    resid = rng.integers(-200, 201, size=(8, h, w)).astype(np.int32)
    pred = np.full((8, h, w), 128, np.int32)
    coeff = T.fwd_txfm2d_np(resid, TxType.DCT_DCT, bd=8)
    lvl = Q.quantize_np(coeff, qindex, w, h)
    dq = Q.dequantize_np(lvl, qindex, w, h)
    recon = T.inv_txfm2d_add_np(dq, pred, TxType.DCT_DCT, bd=8)
    err = recon.astype(float) - np.clip(pred + resid, 0, 255)
    # error bounded by ~ quantizer step in pixel units: q/8 per the Q3 scale
    qstep_pix = Q.ac_q(qindex, 8) / 8.0
    rmse = np.sqrt((err ** 2).mean())
    assert rmse <= max(1.0, qstep_pix), (qindex, rmse, qstep_pix)
    # and high qindex must not be lossless-identical (sanity that quant did something)
    if qindex >= 120:
        assert np.abs(err).max() > 0


def test_dequant_matches_spec_scale():
    # dc/ac lookup sanity: qindex 0 is near-lossless (dq==4 -> step 0.5 pixel)
    assert Q.dc_q(0, 8) == 4 and Q.ac_q(0, 8) == 4
    assert Q.dc_q(255, 8) > 1000
