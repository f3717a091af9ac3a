"""Device (JAX) twin of the exact CDF-based rate estimator (codec/rate.py).

Batched per-txb bit estimation as pure array ops so mode decision can run
rate-true RD on device — the TPU analog of the reference's LUT-based
`svt_aom_estimate_coefficients_rate` + encodetxb level/context-map SIMD
kernels (md_rate_estimation.c, ASM_AVX2/encodetxb_avx2.c). All per-config
constants (scan orders, context-offset maps, eob token cost tables, CDF cost
LUTs) are precomputed on host per FrameContext and baked into the traced
program; the device work is shifts, mins, gathers and masked sums.

Numerically identical to rate.txb_bits (tested) up to float32 summation
order.
"""
from __future__ import annotations

import math

import numpy as np

from ..constants.av1 import TX_H, TX_TYPE_CLASS, TX_W, TxSize
from . import rate as rate_np
from . import txb as txb_mod


def _eob_cost_lut(fc, tx_size: int, tx_type: int, plane_type: int) -> np.ndarray:
    """(n+1,) float32: total eob-token cost (eob flag + eob_extra cdf bit +
    raw offset bits) for every possible eob value 1..n; index 0 unused."""
    tx_class = int(TX_TYPE_CLASS[tx_type])
    txs_ctx = txb_mod.get_txsize_entropy_ctx(tx_size)
    adj = txb_mod.adjusted_tx_size(tx_size)
    n = int(TX_W[adj]) * int(TX_H[adj])
    emc = 0 if tx_class == txb_mod.TX_CLASS_2D else 1
    nsz = 16 << txb_mod.eob_multi_size(tx_size)
    flag_lut = rate_np.cdf_cost_table(fc[f"eob_flag_{nsz}"], int(math.log2(nsz)) + 1)
    extra_lut = rate_np.cdf_cost_table(fc["eob_extra"], 2)
    out = np.zeros(n + 1, np.float32)
    for eob in range(1, n + 1):
        eob_pt, eob_extra = txb_mod.get_eob_pos_token(eob)
        bits = float(flag_lut[plane_type, emc, eob_pt - 1])
        ob = int(txb_mod.EOB_OFFSET_BITS[eob_pt])
        if ob > 0:
            bit = (eob_extra >> (ob - 1)) & 1
            bits += float(extra_lut[txs_ctx, plane_type, eob_pt, bit])
            bits += ob - 1
        out[eob] = bits
    return out


def _base_eob_ctx_lut(tx_size: int) -> np.ndarray:
    """(n,) int32: get_base_eob_ctx for scan_idx = eob-1 over all eob."""
    adj = txb_mod.adjusted_tx_size(tx_size)
    h, w = int(TX_H[adj]), int(TX_W[adj])
    bwl = int(math.log2(w))
    return np.array([txb_mod.get_base_eob_ctx(i, bwl, h) for i in range(h * w)], np.int32)


def make_txb_bits_fn(fc, tx_size: int, tx_type: int, plane_type: int,
                     txb_skip_ctx: int = 0, dc_sign_ctx: int = 0):
    """Build fn(levels) -> bits for one static txb config.

    levels: (..., h, w) int32 (adjusted-size quantized levels, signed).
    Returns (...,) float32 bits. Trace inside jit; constants fold in.
    """
    import jax
    import jax.numpy as jnp

    tx_class = int(TX_TYPE_CLASS[tx_type])
    txs_ctx = txb_mod.get_txsize_entropy_ctx(tx_size)
    adj = txb_mod.adjusted_tx_size(tx_size)
    h, w = int(TX_H[adj]), int(TX_W[adj])
    n = h * w

    lut = rate_np.cdf_cost_table  # host
    base_lut = lut(fc["coeff_base"], 4)[txs_ctx, plane_type]  # (42, 4)
    base_eob_lut = lut(fc["coeff_base_eob"], 3)[txs_ctx, plane_type]  # (4, 3)
    # cumulative br-round cost per base_range (codec/rate.py _luts "br")
    br_raw = lut(fc["coeff_br"], 4)[min(txs_ctx, int(TxSize.TX_32X32)), plane_type]  # (21,4)
    br_lut = np.zeros((21, 13), np.float32)
    for r in range(13):
        cost, rem = np.zeros(21, np.float32), r
        for _ in range(4):
            k = min(rem, 3)
            cost += br_raw[:, k]
            if k < 3:
                break
            rem -= 3
        br_lut[:, r] = cost
    skip_lut = lut(fc["txb_skip"], 2)[txs_ctx, txb_skip_ctx]  # (2,)
    dc_sign_lut = lut(fc["dc_sign"], 2)[plane_type, dc_sign_ctx]  # (2,)
    eob_cost = _eob_cost_lut(fc, tx_size, tx_type, plane_type)  # (n+1,)
    ectx_lut = _base_eob_ctx_lut(tx_size)  # (n,)

    scan = txb_mod.get_scan(tx_size, tx_type).astype(np.int32)  # scan idx -> pos
    iscan = np.argsort(scan).astype(np.int32)  # pos -> scan idx (raster layout)
    iscan2d = iscan.reshape(h, w)

    if tx_class == txb_mod.TX_CLASS_2D:
        nz_off = txb_mod.nz_map_ctx_offset_2d(tx_size).reshape(h, w)
    elif tx_class == txb_mod.TX_CLASS_HORIZ:
        nz_off = np.broadcast_to(txb_mod.NZ_MAP_CTX_OFFSET_1D[np.arange(w)][None, :], (h, w))
    else:
        nz_off = np.broadcast_to(txb_mod.NZ_MAP_CTX_OFFSET_1D[np.arange(h)][:, None], (h, w))
    rows = np.arange(h)[:, None]
    cols = np.arange(w)[None, :]
    if tx_class == txb_mod.TX_CLASS_2D:
        br_grp = np.where((rows < 2) & (cols < 2), 7, 14).astype(np.int32)
    elif tx_class == txb_mod.TX_CLASS_HORIZ:
        br_grp = np.where(cols == 0, 7, 14).astype(np.int32) + np.zeros((h, w), np.int32)
    else:
        br_grp = np.where(rows == 0, 7, 14).astype(np.int32) + np.zeros((h, w), np.int32)

    def lut_sum(lut2d, idx_a, idx_b, weight):
        """sum_pos weight * lut2d[idx_a, idx_b] via a fused one-hot matmul —
        TPU gathers from tiny tables lower to slow paths; an iota-compare
        one-hot fused into a dot runs on the MXU (measured ~7x faster)."""
        la, lb = lut2d.shape
        flat_idx = idx_a * lb + idx_b
        oh = jax.nn.one_hot(flat_idx, la * lb, dtype=jnp.float32)
        return jnp.einsum("...pk,...p->...k", oh, weight.astype(jnp.float32)) @ \
            jnp.asarray(lut2d.reshape(-1), jnp.float32)

    def lut_pick(lut1d, idx):
        """lut1d[idx] for per-block scalars via one-hot dot (exact, f32)."""
        oh = jax.nn.one_hot(idx, len(lut1d), dtype=jnp.float32)
        return oh @ jnp.asarray(lut1d, jnp.float32)

    def fn(levels):
        lv = levels.astype(jnp.int32)
        absl = jnp.abs(lv)
        batch = lv.shape[:-2]
        flat = lv.reshape(batch + (n,))
        aflat = absl.reshape(batch + (n,))
        nz = aflat != 0

        # eob (1-based scan position of the last nonzero; 0 if none)
        eob = jnp.max(jnp.where(nz, iscan[None] + 1, 0), axis=-1)

        # base-level context map (vectorized get_base_ctx; rate.py twin)
        P = jnp.pad(jnp.minimum(absl, 127), [(0, 0)] * len(batch) + [(0, 4), (0, 4)])
        M = jnp.minimum(P, 3)
        mag = M[..., 0:h, 1 : w + 1] + M[..., 1 : h + 1, 0:w]
        if tx_class == txb_mod.TX_CLASS_2D:
            mag = mag + M[..., 1 : h + 1, 1 : w + 1] + M[..., 0:h, 2 : w + 2] + M[..., 2 : h + 2, 0:w]
        elif tx_class == txb_mod.TX_CLASS_VERT:
            mag = mag + M[..., 2 : h + 2, 0:w] + M[..., 3 : h + 3, 0:w] + M[..., 4 : h + 4, 0:w]
        else:
            mag = mag + M[..., 0:h, 2 : w + 2] + M[..., 0:h, 3 : w + 3] + M[..., 0:h, 4 : w + 4]
        bctx = jnp.minimum((mag + 1) >> 1, 4) + nz_off[(None,) * len(batch)]
        bctx = bctx.reshape(batch + (n,))
        if tx_class == txb_mod.TX_CLASS_2D:
            bctx = bctx.at[..., 0].set(0)  # (tx_class | pos) == 0 -> ctx 0

        sym = jnp.minimum(aflat, 3)
        is_eob_pos = iscan[None] == (eob[..., None] - 1)
        before_eob = iscan[None] < (eob[..., None] - 1)
        bits = lut_sum(base_lut, bctx, sym, before_eob)

        # the eob-position symbol uses the base_eob table
        sym_eob = jnp.sum(jnp.where(is_eob_pos, sym, 0), axis=-1)
        ectx = lut_pick(ectx_lut.astype(np.float32), jnp.maximum(eob - 1, 0)).astype(jnp.int32)
        bits = bits + lut_pick(base_eob_lut.reshape(-1),
                               ectx * 3 + jnp.maximum(sym_eob - 1, 0))

        # eob token
        bits = bits + lut_pick(eob_cost, eob)

        # br rounds (levels > 2) + golomb (levels > 14)
        magb = P[..., 0:h, 1 : w + 1] + P[..., 1 : h + 1, 0:w]
        if tx_class == txb_mod.TX_CLASS_2D:
            magb = magb + P[..., 1 : h + 1, 1 : w + 1]
        elif tx_class == txb_mod.TX_CLASS_VERT:
            magb = magb + P[..., 2 : h + 2, 0:w]
        else:
            magb = magb + P[..., 0:h, 2 : w + 2]
        brctx = jnp.minimum((magb + 1) >> 1, 6) + br_grp[(None,) * len(batch)]
        brctx = brctx.reshape(batch + (n,))
        brctx = brctx.at[..., 0].add(-br_grp.reshape(-1)[0])  # pos 0: no group offset
        big = aflat > 2
        bits = bits + lut_sum(br_lut, brctx, jnp.clip(aflat - 3, 0, 12), big)
        gx = jnp.maximum(aflat - 14, 1).astype(jnp.float32)
        glens = jnp.floor(jnp.log2(gx)) + 1.0
        bits = bits + jnp.sum((2.0 * glens - 1.0) * (aflat > 14), axis=-1)

        # signs
        nnz = jnp.sum(nz, axis=-1).astype(jnp.float32)
        dc = flat[..., 0]
        dc_cost = jnp.where(dc < 0, float(dc_sign_lut[1]), float(dc_sign_lut[0]))
        bits = bits + jnp.where(dc != 0, dc_cost + (nnz - 1.0), nnz)

        # all-zero txb: just the skip flag
        return jnp.where(eob == 0, float(skip_lut[1]), bits + float(skip_lut[0]))

    return fn


def mv_component_cost_lut(fc, max_abs: int = 1 << 11) -> np.ndarray:
    """(2, max_abs+1) float32 per component (0=row, 1=col): bits to code one
    NEWMV difference of magnitude d (1/8-pel units; without allow_hp only even
    values are codable — odd entries get an effectively-infinite cost). Cost
    includes the sign bit. Host LUT for device ME/RD gathers. d=0 -> 0."""
    from .mv import MvCoder

    out = np.zeros((2, max_abs + 1), np.float32)
    coder = MvCoder(fc, update=False, allow_hp=False)
    for comp in range(2):
        for d in range(2, max_abs + 1, 2):
            bc = rate_np.BitCounter()
            coder._write_component(bc, comp, d)
            out[comp, d] = bc.bits
    out[:, 1::2] = 1e9
    return out


def mv_joint_cost(fc) -> np.ndarray:
    """(2,2) float32: nmv joint symbol cost indexed [row!=0][col!=0]."""
    j = rate_np.cdf_cost_table(fc["nmv_joints"], 4)
    return np.array([[j[0], j[1]], [j[2], j[3]]], np.float32)
