"""JAX/TPU twin of the transform engine (ops/transforms.py).

Same extracted stage tables, executed as jnp int32 ops over batched blocks:
each 1-D stage is two gathers + two multiplies + shift — VPU elementwise work
with static shapes, `jit`-compiled once per (size, type). The inverse path is
bit-exact with the numpy engine (normative recon); the forward path uses the
same integer network (int32; forward exactness is an encoder choice only).

All ops int32: TPU has no int64. Inverse intermediates fit int32 for bd<=10
(stage ranges 16/18 x cospi 2^12); forward fits for bd=8 at all sizes.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..constants.av1 import TX_TYPE_1D, Tx1D, TxType
from . import transforms as T


@functools.lru_cache(maxsize=None)
def _stage_consts(name: str, cos_bit: int):
    """Stage tables as numpy constants ready for jnp closure capture."""
    out = []
    for ia, wa, ib, wb, sh, clamp2 in T.stage_table(name, cos_bit):
        rnd = np.where(sh > 0, (1 << np.maximum(sh, 1)) >> 1, 0).astype(np.int32)
        out.append((ia, wa.astype(np.int32), ib, wb.astype(np.int32), sh.astype(np.int32), rnd, clamp2))
    return out


def _clamp_bits_j(x, bits):
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    return jnp.clip(x, lo, hi)


def _round_shift_j(x, bit: int):
    if bit == 0:
        return x
    return (x + (1 << (bit - 1))) >> bit


def _txfm1d_j(x, name: str, cos_bit: int, clamp_range):
    """x: (..., n) int32."""
    for ia, wa, ib, wb, sh, rnd, clamp2 in _stage_consts(name, cos_bit):
        a = x[..., ia]
        b = x[..., ib]
        y = (a * wa + b * wb + rnd) >> sh
        if clamp_range is not None:
            y = jnp.where(clamp2, _clamp_bits_j(y, clamp_range), y)
        x = y
    return x


def _adst4_j(x, cos_bit: int, inverse: bool):
    sp = [int(v) for v in T.sinpi_arr(cos_bit)]
    x0, x1, x2, x3 = (x[..., i] for i in range(4))
    if inverse:
        s0 = sp[1] * x0 + sp[4] * x2 + sp[2] * x3
        s1 = sp[2] * x0 - sp[1] * x2 - sp[4] * x3
        s2 = sp[3] * ((x0 - x2) + x3)
        s3 = sp[3] * x1
        o0 = s0 + s3
        o1 = s1 + s3
        o2 = s2
        o3 = s0 + s1 - s3
    else:
        s0 = sp[1] * x0
        s1 = sp[4] * x0
        s2 = sp[2] * x1
        s3 = sp[1] * x1
        s4 = sp[3] * x2
        s5 = sp[4] * x3
        s6 = sp[2] * x3
        s7 = x0 + x1 - x3
        a0 = s0 + s2 + s5
        a1 = sp[3] * s7
        a2 = s1 - s3 + s6
        a3 = s4
        o0 = a0 + a3
        o1 = a1
        o2 = a2 - a3
        o3 = a2 - a0 + a3
    out = jnp.stack([o0, o1, o2, o3], axis=-1)
    return _round_shift_j(out, cos_bit)


def _identity_j(x, n: int):
    mul, bits = T._IDT_MULS[n]
    return _round_shift_j(x * mul, bits)


def txfm1d_j(x, kind: Tx1D, n: int, cos_bit: int, inverse: bool, clamp_range):
    if kind == Tx1D.IDT:
        return _identity_j(x, n)
    if kind in (Tx1D.ADST, Tx1D.FLIPADST) and n == 4:
        return _adst4_j(x, cos_bit, inverse)
    prefix = "i" if inverse else "f"
    base = "adst" if kind in (Tx1D.ADST, Tx1D.FLIPADST) else "dct"
    return _txfm1d_j(x, f"{prefix}{base}{n}", cos_bit, clamp_range)


def inv_txfm2d_add_j(coeff, pred, tx_type: int, bd: int = 8):
    """coeff/pred: (..., h, w) int32 -> recon clipped to pixel range.

    Bit-exact with ops/transforms.inv_txfm2d_add_np for bd <= 10."""
    h, w = coeff.shape[-2], coeff.shape[-1]
    vkind, hkind = TX_TYPE_1D[TxType(tx_type)]
    ud_flip, lr_flip = T._flips(tx_type)
    sh_row, sh_col = T.INV_SHIFTS[(w, h)]
    opt_range_row = 16 if bd == 8 else 18
    opt_range_col = 16

    x = coeff.astype(jnp.int32)
    if abs(int(math.log2(w)) - int(math.log2(h))) == 1:
        x = _round_shift_j(x * T.NEW_INV_SQRT2, T.NEW_SQRT2_BITS)
    x = _clamp_bits_j(x, bd + 8)
    x = txfm1d_j(x, hkind, w, T.INV_COS_BIT, True, opt_range_row)
    if sh_row:
        x = _round_shift_j(x, sh_row)
    x = jnp.swapaxes(x, -1, -2)
    x = _clamp_bits_j(x, max(bd + 6, 16))
    x = txfm1d_j(x, vkind, h, T.INV_COS_BIT, True, opt_range_col)
    x = _round_shift_j(x, sh_col)
    x = jnp.swapaxes(x, -1, -2)
    if lr_flip:
        x = x[..., ::-1]
    if ud_flip:
        x = x[..., ::-1, :]
    return jnp.clip(pred + x, 0, (1 << bd) - 1).astype(jnp.int32)


def fwd_txfm2d_j(resid, tx_type: int, bd: int = 8):
    """Forward transform, same integer network as numpy engine (bd=8)."""
    h, w = resid.shape[-2], resid.shape[-1]
    vkind, hkind = TX_TYPE_1D[TxType(tx_type)]
    ud_flip, lr_flip = T._flips(tx_type)
    s0, s1, s2 = T.FWD_SHIFTS[(w, h)]
    wi, hi = int(math.log2(w)) - 2, int(math.log2(h)) - 2
    cb_col, cb_row = T.FWD_COS_BIT_COL[wi][hi], T.FWD_COS_BIT_ROW[wi][hi]

    x = resid.astype(jnp.int32)
    if ud_flip:
        x = x[..., ::-1, :]
    x = jnp.swapaxes(x, -1, -2)
    x = _apply_shift_j(x, -s0)
    x = txfm1d_j(x, vkind, h, cb_col, False, None)
    x = _apply_shift_j(x, -s1)
    x = jnp.swapaxes(x, -1, -2)
    if lr_flip:
        x = x[..., ::-1]
    x = txfm1d_j(x, hkind, w, cb_row, False, None)
    x = _apply_shift_j(x, -s2)
    if abs(int(math.log2(w)) - int(math.log2(h))) == 1:
        x = _round_shift_j(x * T.NEW_SQRT2, T.NEW_SQRT2_BITS)
    if w == 64:
        x = x.at[..., :, 32:].set(0)
    if h == 64:
        x = x.at[..., 32:, :].set(0)
    return x


def _sel_kinds(x, v_adst, name_d: str, name_a: str, n: int, cos_bit: int,
               inverse: bool, clamp_range):
    """Apply DCT and (if available) ADST 1-D networks, selecting per lane.

    TPU-first: computing both kinds once and where-selecting costs 2 passes
    for the whole 4-combo DCT/ADST family, vs 8 for evaluating each 2-D type
    separately (the commit wavefront is latency-bound, so op count is the
    budget)."""
    from ..constants.av1 import Tx1D

    xd = txfm1d_j(x, Tx1D.DCT, n, cos_bit, inverse, clamp_range)
    if n > 16:  # no ADST above 16 points
        return xd
    xa = txfm1d_j(x, Tx1D.ADST, n, cos_bit, inverse, clamp_range)
    sel = v_adst.reshape(v_adst.shape + (1,) * (x.ndim - v_adst.ndim))
    return jnp.where(sel, xa, xd)


def fwd_txfm2d_sel_j(resid, v_adst, h_adst, bd: int = 8):
    """Forward transform of square blocks with per-lane DCT/ADST kind
    selection (the 2-D types DCT_DCT / ADST_ADST / ADST_DCT / DCT_ADST; no
    flips). resid (..., n, n) int32; v_adst/h_adst boolean (...)."""
    n = resid.shape[-1]
    s0, s1, s2 = T.FWD_SHIFTS[(n, n)]
    wi = int(math.log2(n)) - 2
    cb_col, cb_row = T.FWD_COS_BIT_COL[wi][wi], T.FWD_COS_BIT_ROW[wi][wi]
    x = jnp.swapaxes(resid.astype(jnp.int32), -1, -2)
    x = _apply_shift_j(x, -s0)
    x = _sel_kinds(x, v_adst, "fdct", "fadst", n, cb_col, False, None)
    x = _apply_shift_j(x, -s1)
    x = jnp.swapaxes(x, -1, -2)
    x = _sel_kinds(x, h_adst, "fdct", "fadst", n, cb_row, False, None)
    x = _apply_shift_j(x, -s2)
    if n == 64:
        x = x.at[..., :, 32:].set(0)
        x = x.at[..., 32:, :].set(0)
    return x


def inv_txfm2d_add_sel_j(coeff, pred, v_adst, h_adst, bd: int = 8):
    """Inverse + add of square blocks with per-lane DCT/ADST selection.
    Bit-exact with inv_txfm2d_add_j for the four 2-D types."""
    n = coeff.shape[-1]
    sh_row, sh_col = T.INV_SHIFTS[(n, n)]
    opt_range_row = 16 if bd == 8 else 18
    x = _clamp_bits_j(coeff.astype(jnp.int32), bd + 8)
    x = _sel_kinds(x, h_adst, "idct", "iadst", n, T.INV_COS_BIT, True, opt_range_row)
    if sh_row:
        x = _round_shift_j(x, sh_row)
    x = jnp.swapaxes(x, -1, -2)
    x = _clamp_bits_j(x, max(bd + 6, 16))
    x = _sel_kinds(x, v_adst, "idct", "iadst", n, T.INV_COS_BIT, True, 16)
    x = _round_shift_j(x, sh_col)
    x = jnp.swapaxes(x, -1, -2)
    return jnp.clip(pred + x, 0, (1 << bd) - 1).astype(jnp.int32)


def _apply_shift_j(x, bit: int):
    if bit > 0:
        return _round_shift_j(x, bit)
    if bit < 0:
        return x << (-bit)
    return x


def _dq_grid(h: int, w: int, dq_dc, dq_ac):
    """(h, w) dequant grid; dq_dc/dq_ac may be python ints OR traced scalars
    (qindex as a runtime operand — avoids per-qindex recompilation)."""
    mask = np.zeros((h, w), bool)
    mask[0, 0] = True
    return jnp.where(jnp.asarray(mask), jnp.int32(dq_dc), jnp.int32(dq_ac))


def quantize_j(coeff, dq_dc, dq_ac, ls: int, bias_num: int = 1, bias_den: int = 2):
    """Dead-zone quantizer (jnp twin of ops/quantize.quantize_np)."""
    h, w = coeff.shape[-2], coeff.shape[-1]
    dq = _dq_grid(h, w, dq_dc, dq_ac)
    absc = jnp.abs(coeff) << ls
    level = (absc + dq * bias_num // bias_den) // dq
    return jnp.sign(coeff) * level


def dequantize_j(level, dq_dc, dq_ac, ls: int, bd: int = 8):
    h, w = level.shape[-2], level.shape[-1]
    dq = _dq_grid(h, w, dq_dc, dq_ac)
    v = (jnp.abs(level) * dq) >> ls
    v = jnp.minimum(v, (1 << (bd + 7)) - 1)
    return jnp.sign(level) * v
