"""ME SAD/HME + subpel convolve kernels (model: reference test/SadTest.cc,
convolve_test.cc)."""
import numpy as np
import pytest

from svtav1_tpu.ops import convolve as C


def test_convolve_fullpel_identity():
    rng = np.random.default_rng(2)
    plane = rng.integers(0, 256, (64, 64)).astype(np.int32)
    out = C.convolve_2d_scalar(plane, 8, 8, 16, 16, 0, 0)
    assert np.array_equal(out, plane[8:24, 8:24])


def test_convolve_halfpel_matches_direct_filter():
    rng = np.random.default_rng(3)
    plane = rng.integers(0, 256, (64, 64)).astype(np.int32)
    out = C.convolve_2d_scalar(plane, 16, 16, 8, 8, 8, 0)  # half-pel x only
    # direct horizontal 8-tap at phase 8
    f = C.filter_kernels(C.REGULAR)[8]
    ref = np.zeros((8, 8), np.int64)
    for r in range(8):
        for c in range(8):
            s = 1 << (8 + 7 - 1)
            for k in range(8):
                s += f[k] * plane[16 + r, 16 + c - 3 + k]
            im = (s + 4) >> 3
            # vertical with phase 0 kernel (identity tap 128 at k=3)
            offset_bits = 8 + 14 - 3
            s2 = (1 << offset_bits) + 128 * im
            res = ((s2 + (1 << 10)) >> 11) - ((1 << (offset_bits - 11)) + (1 << (offset_bits - 12)))
            ref[r, c] = min(max(res, 0), 255)
    assert np.array_equal(out, ref)


def test_convolve_dc_preservation():
    """Constant input -> constant output for every phase/filter."""
    plane = np.full((32, 32), 147, np.int32)
    for which in (C.REGULAR, C.SMOOTH, C.SHARP):
        for phase in (0, 4, 8, 12):
            out = C.convolve_2d_scalar(plane, 8, 8, 8, 8, phase, phase, which)
            assert np.all(out == 147), (which, phase)


def test_convolve_jax_matches_numpy():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    patches = rng.integers(0, 256, (4, 23, 23)).astype(np.int32)
    out_np = C.convolve_2d_batch(patches, 5, 11)
    fn = jax.jit(lambda p: C.convolve_2d_batch(p, 5, 11, xp=jnp))
    out_j = np.asarray(fn(jnp.asarray(patches)))
    assert np.array_equal(out_np, out_j)
