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

from ..constants.av1 import TX_H, TX_TYPE_CLASS, TX_W, TxSize, TxType
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


def make_rdoq_fn(fc, tx_size: int, plane_type: int,
                 txb_skip_ctx: int = 0, dc_sign_ctx: int = 0):
    """Batched device RDOQ — the TPU re-formulation of the reference's
    per-coefficient trellis (`svt_av1_optimize_b`, full_loop.c:1124).

    The reference walks coefficients serially, carrying exact contexts. On
    TPU a serial walk over up to 1024 positions inside the commit wavefront
    would be ruinous, so this uses the classic two-pass frozen-context
    approximation, entirely as array ops over the whole lane batch:

      pass 1 (eob search): per-position gain of zeroing (distortion delta vs
        own frozen-context bits) -> reverse-scan suffix sums give the total
        gain of truncating the block at every possible new eob in one
        cumsum; pick the argmin (including eob=0 == skip).
      pass 2 (level-down): with contexts refreshed from the truncated
        levels, accept per-coefficient level-1 steps where
        d(dist) + lam * d(bits) < 0 (base/br/golomb/sign tables; the eob
        position uses the base_eob table and may not drop to zero).

    Distortion is computed in coefficient domain against the unquantized
    coefficient and mapped to pixel domain by the transform gain
    2^(7 - 2*tx_scale) (measured exact for the AV1 integer transforms).

    Only TX_CLASS_2D configs are supported (all TX_SEARCH types are 2D and
    share the default scan). Returns fn(levels, coeff, dq_dc, dq_ac, lam)
    -> new levels, same shape/dtype, jit-traceable with qindex as data.
    """
    import jax
    import jax.numpy as jnp

    txs_ctx = txb_mod.get_txsize_entropy_ctx(tx_size)
    adj = txb_mod.adjusted_tx_size(tx_size)
    h, w = int(TX_H[adj]), int(TX_W[adj])
    n = h * w
    # tx_scale is by the ORIGINAL size; for 64-pt the caller passes the
    # cropped 32x32 levels but quant used ls=2
    full_w, full_h = int(TX_W[tx_size]), int(TX_H[tx_size])
    ls = int(full_w * full_h > 256) + int(full_w * full_h > 1024)
    # coeff-domain -> pixel-domain distortion divisor: ideal 2^(7-2*ls),
    # measured on single-level steps through the integer inverse transforms
    # (the per-stage roundings bend it off the ideal, most at 64-pt); the
    # 1.12 margin biases against the frozen-context/rounding cross terms so
    # borderline moves that would LOSE true RD are rejected
    _DIV = {4: 132.0, 8: 124.0, 16: 120.0, 32: 36.0, 64: 6.0}
    dscale = 1.12 / _DIV[full_w]

    lut = rate_np.cdf_cost_table
    base_lut = lut(fc["coeff_base"], 4)[txs_ctx, plane_type]  # (42, 4)
    base_eob_lut = lut(fc["coeff_base_eob"], 3)[txs_ctx, plane_type]  # (4, 3)
    br_raw = lut(fc["coeff_br"], 4)[min(txs_ctx, int(TxSize.TX_32X32)), plane_type]
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
    skip_lut = lut(fc["txb_skip"], 2)[txs_ctx, txb_skip_ctx]
    dc_sign_lut = lut(fc["dc_sign"], 2)[plane_type, dc_sign_ctx]
    eob_cost = _eob_cost_lut(fc, tx_size, int(TxType.DCT_DCT), plane_type)  # (n+1,)
    ectx_lut = _base_eob_ctx_lut(tx_size)  # (n,)

    scan = txb_mod.get_scan(tx_size, int(TxType.DCT_DCT)).astype(np.int32)
    iscan = np.argsort(scan).astype(np.int32)
    nz_off = txb_mod.nz_map_ctx_offset_2d(tx_size).reshape(h, w)
    rows = np.arange(h)[:, None]
    cols = np.arange(w)[None, :]
    br_grp = np.where((rows < 2) & (cols < 2), 7, 14).astype(np.int32)
    sign_base = np.full(n, 1.0, np.float32)  # AC sign = 1 raw bit

    def _pick2(lut2d, ia, ib):
        """per-position lut2d[ia, ib] via one-hot matmul (MXU-friendly)."""
        la, lb = lut2d.shape
        oh = jax.nn.one_hot(ia * lb + ib, la * lb, dtype=jnp.float32)
        return jnp.einsum("...pk,k->...p", oh,
                          jnp.asarray(lut2d.reshape(-1), jnp.float32))

    def fn(levels, coeff, dq_dc, dq_ac, lam):
        lv = levels.astype(jnp.int32)
        batch = lv.shape[:-2]
        nb = len(batch)
        a0g = jnp.abs(lv)
        cg = jnp.abs(coeff.astype(jnp.int32))
        sgn = jnp.where(lv < 0, -1, 1)
        # keep the coeff sign where the level is 0 (never re-incremented,
        # so sign only matters for surviving levels)
        a0 = a0g.reshape(batch + (n,))
        c_abs = cg.reshape(batch + (n,)).astype(jnp.float32)
        dqv = jnp.full((n,), dq_ac, jnp.int32).at[0].set(dq_dc)

        def err(a):
            return (((a * dqv[(None,) * nb]) >> ls)).astype(jnp.float32) - c_abs

        def ctx_maps(ag):
            P = jnp.pad(jnp.minimum(ag, 127), [(0, 0)] * nb + [(0, 4), (0, 4)])
            M = jnp.minimum(P, 3)
            mag = (M[..., 0:h, 1 : w + 1] + M[..., 1 : h + 1, 0:w]
                   + M[..., 1 : h + 1, 1 : w + 1] + M[..., 0:h, 2 : w + 2]
                   + M[..., 2 : h + 2, 0:w])
            bctx = jnp.minimum((mag + 1) >> 1, 4) + nz_off[(None,) * nb]
            bctx = bctx.reshape(batch + (n,)).at[..., 0].set(0)
            magb = (P[..., 0:h, 1 : w + 1] + P[..., 1 : h + 1, 0:w]
                    + P[..., 1 : h + 1, 1 : w + 1])
            brctx = jnp.minimum((magb + 1) >> 1, 6) + br_grp[(None,) * nb]
            brctx = brctx.reshape(batch + (n,)).at[..., 0].add(-int(br_grp[0, 0]))
            return bctx, brctx

        dc_cost = jnp.where(lv.reshape(batch + (n,))[..., 0] < 0,
                            float(dc_sign_lut[1]), float(dc_sign_lut[0]))
        sign_cost = jnp.broadcast_to(jnp.asarray(sign_base), batch + (n,))
        sign_cost = sign_cost.at[..., 0].set(dc_cost)

        def own_cost(a, bctx, brctx):
            base = _pick2(base_lut, bctx, jnp.minimum(a, 3))
            brc = jnp.where(a > 2, _pick2(br_lut, brctx, jnp.clip(a - 3, 0, 12)), 0.0)
            gx = jnp.maximum(a - 14, 1).astype(jnp.float32)
            gol = jnp.where(a > 14, 2.0 * (jnp.floor(jnp.log2(gx)) + 1.0) - 1.0, 0.0)
            return base + brc + gol + jnp.where(a > 0, sign_cost, 0.0)

        # ---- pass 1: eob truncation search
        bctx, brctx = ctx_maps(a0g)
        e0 = err(a0)
        zd = (c_abs * c_abs - e0 * e0) * dscale  # dist delta of zeroing
        n_i = own_cost(a0, bctx, brctx)
        g = jnp.where(a0 > 0, zd, 0.0) - lam * n_i
        g_scan = g[..., scan]
        a_scan = a0[..., scan]
        bctx_scan = bctx[..., scan]
        # positions at/after the original eob are not coded at all — they
        # must not contribute phantom bit savings to the truncation scores
        eob0_pre = jnp.max(jnp.where(a_scan > 0, jnp.arange(1, n + 1), 0),
                           axis=-1)
        g_scan = jnp.where(jnp.arange(n)[(None,) * nb] < eob0_pre[..., None],
                           g_scan, 0.0)
        # S[k] = sum_{i >= k} g_scan[i], k in 0..n
        S = jnp.concatenate([
            jnp.flip(jnp.cumsum(jnp.flip(g_scan, -1), -1), -1),
            jnp.zeros(batch + (1,), jnp.float32)], -1)
        eob0 = eob0_pre
        # candidate scores: new eob k (last nonzero at scan k-1)
        a_last = a_scan  # a at scan pos k-1 for candidate k = index k-1
        beob = _pick2(base_eob_lut, jnp.asarray(ectx_lut)[(None,) * nb],
                      jnp.maximum(jnp.minimum(a_last, 3) - 1, 0))
        bnorm = _pick2(base_lut, bctx_scan, jnp.minimum(a_last, 3))
        ks = jnp.arange(1, n + 1)
        score_k = (S[..., 1:] + lam * (jnp.asarray(eob_cost[1:])[(None,) * nb]
                                       + beob - bnorm))
        valid = (a_scan > 0) & (ks[(None,) * nb] <= eob0[..., None])
        score_k = jnp.where(valid, score_k, jnp.inf)
        score_0 = S[..., 0] + lam * float(skip_lut[1] - skip_lut[0])
        alls = jnp.concatenate([score_0[..., None], score_k], -1)
        kbest = jnp.argmin(alls, axis=-1)  # 0..n
        isc = jnp.asarray(iscan)[(None,) * nb]
        keep = isc < kbest[..., None]
        a1 = jnp.where(keep, a0, 0)

        # ---- pass 2: level-down with refreshed contexts
        a1g = a1.reshape(batch + (h, w))
        bctx, brctx = ctx_maps(a1g)
        is_eob = isc == (kbest[..., None] - 1)
        e1 = err(a1)
        adn = jnp.maximum(a1 - 1, 0)
        edn = err(adn)
        dd = (edn * edn - e1 * e1) * dscale
        c_now = own_cost(a1, bctx, brctx)
        c_dn = own_cost(adn, bctx, brctx)
        # eob position: swap the base part for the base_eob table
        ectx_k = jnp.take(jnp.asarray(ectx_lut),
                          jnp.maximum(kbest - 1, 0))[..., None]
        beob_now = _pick2(base_eob_lut, jnp.broadcast_to(ectx_k, a1.shape),
                          jnp.maximum(jnp.minimum(a1, 3) - 1, 0))
        beob_dn = _pick2(base_eob_lut, jnp.broadcast_to(ectx_k, a1.shape),
                         jnp.maximum(jnp.minimum(adn, 3) - 1, 0))
        b_now = _pick2(base_lut, bctx, jnp.minimum(a1, 3))
        b_dn = _pick2(base_lut, bctx, jnp.minimum(adn, 3))
        c_now = jnp.where(is_eob, c_now - b_now + beob_now, c_now)
        c_dn = jnp.where(is_eob, c_dn - b_dn + beob_dn, c_dn)
        allow = (a1 > 0) & keep & (~is_eob | (a1 >= 2))
        better = allow & (dd + lam * (c_dn - c_now) < 0.0)
        a2 = a1 - better.astype(jnp.int32)
        return (sgn.reshape(batch + (n,)) * a2).reshape(lv.shape).astype(levels.dtype)

    return fn
