"""MCTF — motion-compensated temporal filtering of key/base frames.

TPU-native re-architecture of the reference's ALT-REF temporal filter
(temporal_filtering.c:2752 produce_temporally_filtered_pic, plane-wise
weighted accumulation :1382 apply_filtering_block_plane_wise): each
neighbor frame is motion-compensated toward the center frame (16x16 block
ME + subpel, reusing the gather-lean ME stack of ops/me_jax), then every
pixel of the center is replaced by an exponentially-weighted average of the
center and the compensated neighbors, with weights driven by the local
(5x5-windowed) compensation error, the frame noise level, and the encoding
strength. One jitted program per (geometry, window size) filters Y, U and V.

The filter only changes the SOURCE handed to the encoder (nothing is
signaled), so conformance is untouched; the win is rate: noise that would
cost bits in every frame is averaged away in the reference frames.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import me_jax

TF_BLOCK = 16  # ME/MC granularity (reference filters 32x32 with 16 subblocks)


def estimate_noise_j(y, bd: int = 8):
    """Frame noise sigma via the median-absolute-Laplacian estimator the
    reference uses (temporal_filtering.c estimate_noise: |L| * sqrt(pi/2) /
    6 averaged over non-edge pixels; mean replaces median — same scale on
    iid noise). The edge-gradient threshold scales with bit depth (the
    reference shifts its EDGE_THRESHOLD by bd-8) so 10-bit frames classify
    flat pixels at the same luminance contrast as 8-bit."""
    y = y.astype(jnp.float32)
    lap = (4.0 * y[1:-1, 1:-1]
           - 2.0 * (y[1:-1, :-2] + y[1:-1, 2:] + y[:-2, 1:-1] + y[2:, 1:-1])
           + y[:-2, :-2] + y[:-2, 2:] + y[2:, :-2] + y[2:, 2:])
    # edge mask: skip high-gradient pixels so texture doesn't read as noise
    gx = jnp.abs(y[1:-1, 2:] - y[1:-1, :-2])
    gy = jnp.abs(y[2:, 1:-1] - y[:-2, 1:-1])
    flat = (gx + gy) < 40.0 * (1 << (bd - 8))
    cnt = jnp.maximum(jnp.sum(flat), 1)
    return jnp.sum(jnp.abs(lap) * flat) / cnt * jnp.float32(np.sqrt(np.pi / 2) / 6.0)


def _box5(x):
    """5x5 box mean with edge replication, (H, W) float32."""
    p = jnp.pad(x, 2, mode="edge")
    c = jnp.cumsum(jnp.cumsum(p, axis=0), axis=1)
    c = jnp.pad(c, ((1, 0), (1, 0)))
    H, W = x.shape
    s = (c[5 : 5 + H, 5 : 5 + W] - c[:H, 5 : 5 + W]
         - c[5 : 5 + H, :W] + c[:H, :W])
    return s / 25.0


@functools.lru_cache(maxsize=8)
def _tf_jit(H: int, W: int, K: int, bd: int):
    """Filter program: center + K neighbors -> filtered planes.

    Inputs: cy (H, W), cu/cv (H/2, W/2), ny (K, H, W), nu/nv (K, ...),
    strength scalar (q-derived). Returns filtered (y, u, v) int32."""
    sbr, sbc = H // 64, W // 64
    R, C = H // TF_BLOCK, W // TF_BLOCK
    B = R * C

    @jax.jit
    def run(cy8, cu8, cv8, ny8, nu8, nv8, strength):
        cy = cy8.astype(jnp.int32)
        cu = cu8.astype(jnp.int32)
        cv = cv8.astype(jnp.int32)
        sigma = jnp.maximum(estimate_noise_j(cy, bd), 0.5 * (1 << (bd - 8)))
        r_idx = jnp.repeat(jnp.arange(R), C)
        c_idx = jnp.tile(jnp.arange(C), R)
        srcb = cy.reshape(R, TF_BLOCK, C, TF_BLOCK).transpose(0, 2, 1, 3) \
            .reshape(B, TF_BLOCK, TF_BLOCK)

        accs = [cy.astype(jnp.float32), cu.astype(jnp.float32), cv.astype(jnp.float32)]
        wsums = [jnp.ones((H, W), jnp.float32),
                 jnp.ones((H // 2, W // 2), jnp.float32),
                 jnp.ones((H // 2, W // 2), jnp.float32)]
        # decay model (tf n_decay * q_decay * sigma^2 shape): larger noise
        # or stronger filtering -> flatter weights
        h2 = 2.0 * (sigma * sigma + strength * strength)

        for k in range(K):
            ref_y = ny8[k].astype(jnp.int32)
            mvs_fp, _sb = me_jax.me_fullpel_frame(cy, ref_y, sbr, sbc)
            fp = mvs_fp[TF_BLOCK][:R, :C].reshape(B, 2)
            mv8, pred = me_jax.subpel_pred_lanes(srcb, ref_y, r_idx * TF_BLOCK,
                                                 c_idx * TF_BLOCK, fp, 0, bd)
            pred_y = pred.reshape(R, C, TF_BLOCK, TF_BLOCK) \
                .transpose(0, 2, 1, 3).reshape(H, W)
            # chroma MC at mv/2 (1/16-pel chroma units == luma 1/8 values)
            nc = TF_BLOCK // 2
            pu = me_jax.mc_lanes(nu8[k].astype(jnp.int32), r_idx * nc, c_idx * nc,
                                 mv8[:, 0], mv8[:, 1], nc, nc, 0, bd)
            pv = me_jax.mc_lanes(nv8[k].astype(jnp.int32), r_idx * nc, c_idx * nc,
                                 mv8[:, 0], mv8[:, 1], nc, nc, 0, bd)
            pred_u = pu.reshape(R, C, nc, nc).transpose(0, 2, 1, 3).reshape(H // 2, W // 2)
            pred_v = pv.reshape(R, C, nc, nc).transpose(0, 2, 1, 3).reshape(H // 2, W // 2)

            d_y = _box5((pred_y - cy).astype(jnp.float32) ** 2)
            w_y = jnp.exp(-d_y / h2)
            accs[0] = accs[0] + w_y * pred_y
            wsums[0] = wsums[0] + w_y
            for pi, (pc, cc) in enumerate(((pred_u, cu), (pred_v, cv)), start=1):
                d_c = _box5((pc - cc).astype(jnp.float32) ** 2)
                w_c = jnp.exp(-d_c / h2)
                accs[pi] = accs[pi] + w_c * pc
                wsums[pi] = wsums[pi] + w_c

        maxv = (1 << bd) - 1
        outs = [jnp.clip(jnp.round(a / w).astype(jnp.int32), 0, maxv)
                for a, w in zip(accs, wsums)]
        return outs[0], outs[1], outs[2]

    return run


def tf_strength(qindex: int, bd: int = 8) -> float:
    """q-derived filter strength (q_decay shape: stronger at high q),
    in sample units — scales with bit depth like sigma."""
    return (1.0 + qindex / 48.0) * (1 << (bd - 8))


def filter_frame(center, neighbors, qindex: int, bd: int = 8):
    """center: [y, u, v] aligned int planes (64-multiples); neighbors: list
    of same-shape plane triples. Returns filtered [y, u, v] int32 planes."""
    if not neighbors:
        return center
    H, W = center[0].shape
    K = len(neighbors)
    run = _tf_jit(H, W, K, bd)
    dt = np.uint8 if bd == 8 else np.int16
    cy, cu, cv = (np.asarray(p, dt) for p in center)
    ny = np.stack([np.asarray(f[0], dt) for f in neighbors])
    nu = np.stack([np.asarray(f[1], dt) for f in neighbors])
    nv = np.stack([np.asarray(f[2], dt) for f in neighbors])
    y, u, v = run(cy, cu, cv, ny, nu, nv, np.float32(tf_strength(qindex, bd)))
    return [np.asarray(y), np.asarray(u), np.asarray(v)]
