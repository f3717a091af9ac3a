"""CDEF device twin: the jitted JAX unit filter must be bit-exact with the
numpy path (groundwork for fusing CDEF into the device frame pipeline)."""
import numpy as np

from svtav1_tpu.codec.mvp import MiState
from svtav1_tpu.constants.av1 import BlockSize
from svtav1_tpu.filters import cdef


def test_jax_twin_bit_exact():
    rng = np.random.default_rng(4)
    H = W = 128
    y = rng.integers(0, 255, (H, W), np.int32)
    mi = MiState(H // 4, W // 4)
    for r in range(0, H // 4, 2):
        for c in range(0, W // 4, 2):
            mi.set_block(r, c, int(BlockSize.BLOCK_8X8), 0, 0, -1, (0, 0), skip=0)
    by, bx = cdef.nonskip_units(mi)
    blocks = cdef._gather_blocks(y, by * 8, bx * 8, 8, 8)
    dirs, variances = cdef.find_dir_batch(blocks)
    t = cdef.adjust_strength(4, variances)
    ref = cdef._filter_units(y, by * 8, bx * 8, 8, 8, t, 2, dirs, 4, 4)
    jx = cdef._filter_units_jax(y, by * 8, bx * 8, 8, 8, t, 2, dirs, 4, 4)
    assert np.array_equal(np.asarray(ref, np.int64), np.asarray(jx, np.int64))
