"""Batched device CDEF must match the host numpy CDEF bit-exactly."""
import numpy as np

import jax.numpy as jnp

from svtav1_tpu.codec.mvp import MiState
from svtav1_tpu.constants.av1 import BlockSize, RefFrame
from svtav1_tpu.filters import cdef, cdef_jax


def test_device_cdef_apply_and_search():
    rng = np.random.default_rng(5)
    w, h = 128, 64
    F = 2
    frames, srcs, mis, skips = [], [], [], []
    for f in range(F):
        rec = [np.clip(rng.normal(128, 40, (h, w)), 0, 255).astype(np.int32),
               np.clip(rng.normal(128, 30, (h // 2, w // 2)), 0, 255).astype(np.int32),
               np.clip(rng.normal(128, 30, (h // 2, w // 2)), 0, 255).astype(np.int32)]
        src = [np.clip(r + rng.normal(0, 6, r.shape), 0, 255).astype(np.int32) for r in rec]
        mi = MiState(h // 4, w // 4)
        sk8 = rng.random((h // 8, w // 8)) < 0.25
        for r8 in range(h // 8):
            for c8 in range(w // 8):
                mi.set_block(r8 * 2, c8 * 2, int(BlockSize.BLOCK_8X8), 0,
                             int(RefFrame.INTRA_FRAME), int(RefFrame.NONE), (0, 0),
                             skip=int(sk8[r8, c8]))
        frames.append(rec)
        srcs.append(src)
        mis.append(mi)
        skips.append(~sk8)

    planes = [jnp.asarray(np.stack([frames[f][i] for f in range(F)])) for i in range(3)]
    src_y = jnp.asarray(np.stack([srcs[f][0] for f in range(F)]))
    nonskip = jnp.asarray(np.stack(skips))
    out, strengths, damping = cdef_jax.cdef_frames_j(planes, src_y, nonskip, qindex=100)
    strengths = np.asarray(strengths)
    out = [np.asarray(o) for o in out]

    for f in range(F):
        y_pri, y_sec, uv_pri, uv_sec = (int(v) for v in strengths[f])
        host = [p.copy() for p in frames[f]]
        cdef.cdef_frame(host, mis[f], y_pri, y_sec, uv_pri, uv_sec, damping, bd=8)
        for i in range(3):
            assert (out[i][f] == host[i]).all(), \
                (f, i, strengths[f], np.argwhere(out[i][f] != host[i])[:4])

    # the chosen strengths should beat "off" on noisy recon (sanity)
    assert strengths[:, 0].max() >= 0
