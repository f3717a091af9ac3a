"""Device DLF must be bit-exact with the host numpy DLF (intra frames)."""
import numpy as np

import jax.numpy as jnp

from svtav1_tpu.codec.mvp import MiState
from svtav1_tpu.constants.av1 import BlockSize, RefFrame
from svtav1_tpu.filters import dlf, dlf_jax

BS = {8: int(BlockSize.BLOCK_8X8), 16: int(BlockSize.BLOCK_16X16),
      32: int(BlockSize.BLOCK_32X32), 64: int(BlockSize.BLOCK_64X64)}


def _random_partition(rng, mi_rows, mi_cols):
    """Random quadtree: returns (size_map (R8,C8), MiState)."""
    mi = MiState(mi_rows, mi_cols)
    R8, C8 = mi_rows // 2, mi_cols // 2
    smap = np.zeros((R8, C8), np.int32)

    def walk(y, x, n):
        if n > 8 and (x + n > mi_cols * 4 or y + n > mi_rows * 4 or rng.random() < 0.55):
            h = n // 2
            for dy in (0, h):
                for dx in (0, h):
                    if (x + dx) // 4 < mi_cols and (y + dy) // 4 < mi_rows:
                        walk(y + dy, x + dx, h)
            return
        mi.set_block(y // 4, x // 4, BS[n], 0, int(RefFrame.INTRA_FRAME), int(RefFrame.NONE),
                     (0, 0), skip=int(rng.random() < 0.3))
        smap[y // 8 : (y + n) // 8, x // 8 : (x + n) // 8] = n

    for sy in range(0, mi_rows * 4, 64):
        for sx in range(0, mi_cols * 4, 64):
            walk(sy, sx, 64)
    return smap, mi


def test_device_dlf_bit_exact():
    rng = np.random.default_rng(11)
    w, h = 192, 128
    mi_rows, mi_cols = h // 4, w // 4
    F = 3
    smaps, mis, frames = [], [], []
    for f in range(F):
        smap, mi = _random_partition(rng, mi_rows, mi_cols)
        smaps.append(smap)
        mis.append(mi)
        frames.append([rng.integers(0, 256, (h, w)).astype(np.int32),
                       rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32),
                       rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)])

    levels = dlf.pick_filter_levels(100, 8, True, h)
    assert levels[0] > 0
    # host reference
    host = [[p.copy() for p in fr] for fr in frames]
    for f in range(F):
        dlf.loop_filter_frame(host[f], mis[f], 100, 8, True, levels=levels, sharpness=0)

    planes = [jnp.asarray(np.stack([frames[f][i] for f in range(F)])) for i in range(3)]
    out = dlf_jax.loop_filter_frames_j(planes, np.stack(smaps), levels, 0, bd=8)
    for i in range(3):
        got = np.asarray(out[i])
        for f in range(F):
            assert (got[f] == host[f][i]).all(), (i, f, np.argwhere(got[f] != host[f][i])[:4])
