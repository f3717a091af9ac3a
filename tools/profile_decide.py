#!/usr/bin/env python3
"""Time the decide program's components in isolation on the real device.

Breaks the whole-frame inter decide into separately-jitted stages at the
bench geometry so the optimization effort goes where the cycles are
(profiler stages only show host-blocking boundaries, not device kernels).

Usage: python tools/profile_decide.py [W H NREF]
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from svtav1_tpu.codec.tile_codec import FrameParams
from svtav1_tpu.constants.av1 import TxType
from svtav1_tpu.constants.cdf import get_q_ctx
from svtav1_tpu.ops import me_jax
from svtav1_tpu.pipeline import device_decide
from svtav1_tpu.pipeline.device_decide import (SIZES, TX_SEARCH, _blocks_of, _decide_intra_size,
                                               _eval_txfm, _penalty_grid_np, _rate_fns,
                                               fc_for_qctx, intra_mode_cost_const,
                                               intra_txtype_cost_const)


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1000:9.2f} ms")
    return dt


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    NREF = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    qindex, bd, which = 120, 8, 0
    p = FrameParams(width=W, height=H, qindex=qindex, bd=bd, frame_is_intra=False)
    aw, ah = p.aligned_width, p.aligned_height
    qctx = get_q_ctx(qindex)
    rng = np.random.default_rng(0)
    sy = jax.device_put(rng.integers(0, 255, (1, ah, aw)).astype(np.uint8))
    su = jax.device_put(rng.integers(0, 255, (1, ah // 2, aw // 2)).astype(np.uint8))
    sv = jax.device_put(rng.integers(0, 255, (1, ah // 2, aw // 2)).astype(np.uint8))
    ry = jax.device_put(rng.integers(0, 255, (NREF, ah, aw)).astype(np.uint8))
    dqv, lam = device_decide.qparams_np(qindex, bd)
    sbr, sbc = -(-ah // 64), -(-aw // 64)

    # 1) fullpel ME (per ref)
    @jax.jit
    def me_fp(s, r):
        out, mv_sb = me_jax.me_fullpel_frame(s[0].astype(jnp.int32), r[0].astype(jnp.int32), sbr, sbc)
        return [out[n] for n in SIZES] + [mv_sb]

    t_me = timeit("fullpel ME (1 ref)", me_fp, sy, ry)

    # 2) subpel lattice + pred (per size, 1 ref)
    t_sub = {}
    for n in SIZES:
        R, C = ah // n, aw // n
        fp = jnp.zeros((R * C, 2), jnp.int32)

        @jax.jit
        def sub(s, r, fp=fp, n=n, R=R, C=C):
            srcb = _blocks_of(s.astype(jnp.int32), n, R, C)
            r_idx = jnp.repeat(jnp.arange(R), C)
            c_idx = jnp.tile(jnp.arange(C), R)
            return me_jax.subpel_pred_lanes(srcb, r[0].astype(jnp.int32), r_idx * n,
                                            c_idx * n, fp, which, bd)

        t_sub[n] = timeit(f"subpel lattice+pred {n}x{n} (1 ref)", sub, sy, ry)

    # 3) intra decide per size (7 modes, inter-frame class)
    fc = fc_for_qctx(qctx)
    t_intra = {}
    for n in SIZES:
        R, C = ah // n, aw // n
        pen = _penalty_grid_np(p, 0, 0, R, C, n, (0, 0), (p.mi_rows, p.mi_cols))
        mc = intra_mode_cost_const(fc, n, False)
        tc = intra_txtype_cost_const(fc, n)

        @jax.jit
        def intr(s, u, v, dq, lm, n=n, R=R, C=C, pen=pen, mc=mc, tc=tc):
            return _decide_intra_size(s.astype(jnp.int32), u.astype(jnp.int32),
                                      v.astype(jnp.int32), jnp.asarray(pen),
                                      jnp.asarray(mc), jnp.asarray(tc), n, qctx,
                                      (dq[0], dq[1]), bd, False, R, C, lm, nmodes=7)

        t_intra[n] = timeit(f"intra decide {n}x{n} (7 modes)", intr, sy, su, sv, dqv, lam)

    # 4) inter RD per size: NC lanes of txfm+quant+rate+inv (luma only)
    t_rd = {}
    for n in SIZES:
        R, C = ah // n, aw // n
        NC = NREF + 1
        rate_fn = _rate_fns(qctx, n)["y"][0]

        @jax.jit
        def rd(s, r, dq, lm, n=n, R=R, C=C, NC=NC, rate_fn=rate_fn):
            srcb = _blocks_of(s.astype(jnp.int32), n, R, C)
            src_nc = jnp.tile(srcb, (NC, 1, 1))
            pred = jnp.tile(_blocks_of(r[0][None].astype(jnp.int32), n, R, C), (NC, 1, 1))
            lv, dqc, rate = _eval_txfm(src_nc - pred, int(TxType.DCT_DCT),
                                       (dq[0], dq[1]), bd, n, rate_fn)
            from svtav1_tpu.ops import transforms_jax as TJ

            rec = TJ.inv_txfm2d_add_j(dqc, pred, int(TxType.DCT_DCT), bd)
            dist = jnp.sum((rec - src_nc).astype(jnp.float32) ** 2, axis=(-2, -1))
            return dist + lm * rate

        t_rd[n] = timeit(f"inter RD chain {n}x{n} ({NC} lanes)", rd, sy, ry, dqv, lam)

    # 5) chroma MC gathers (mc_lanes with dynamic MVs) per size
    t_cmc = {}
    for n in SIZES:
        nc = n // 2
        R, C = ah // n, aw // n
        B = R * C
        mv = jnp.zeros((B,), jnp.int32)
        ridx = jnp.zeros((B,), jnp.int32)
        r_idx = jnp.repeat(jnp.arange(R), C) * nc
        c_idx = jnp.tile(jnp.arange(C), R) * nc

        @jax.jit
        def cmc(ru, mvy, mvx, n=n, nc=nc, ridx=ridx):
            return me_jax.mc_lanes(ru.astype(jnp.int32), r_idx, c_idx, mvy, mvx,
                                   nc, nc, which, bd, ref_idx=ridx)

        ru_ = jax.device_put(rng.integers(0, 255, (NREF, ah // 2, aw // 2)).astype(np.uint8))
        t_cmc[n] = timeit(f"chroma mc_lanes {n}x{n} (1 plane)", cmc, ru_, mv, mv)

    total = (t_me * NREF + sum(t_sub.values()) * NREF + sum(t_intra.values())
             + sum(t_rd.values()) + 2 * sum(t_cmc.values()))
    print(f"{'--- modeled decide total':40s} {total*1000:9.2f} ms")


if __name__ == "__main__":
    main()
