"""Device ME/MC kernels: MC bit-exactness vs the scalar normative path,
full-pel hierarchy recovers known shifts, subpel refinement converges."""
import jax.numpy as jnp
import numpy as np
import pytest

from svtav1_tpu.ops import convolve as conv_ops
from svtav1_tpu.ops import me_jax


def _frame(h, w, seed=0):
    """Smoothed random field — non-periodic, textured (aliasing-free ME)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 60, (h // 4 + 2, w // 4 + 2))
    up = np.kron(base, np.ones((4, 4)))[:h, :w]
    return (128 + up + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.int32)


@pytest.mark.parametrize("bd", [8, 10])
@pytest.mark.parametrize("n", [4, 8, 16])
def test_mc_lanes_bitexact(bd, n):
    rng = np.random.default_rng(1)
    H, W = 96, 112
    ref = rng.integers(0, (1 << bd) - 1, (H, W)).astype(np.int32)
    B = 33
    xs = rng.integers(0, W - n, B).astype(np.int32)
    ys = rng.integers(0, H - n, B).astype(np.int32)
    # 1/16-pel MVs incl. negative + edge-clipping cases
    mvx = rng.integers(-80, 80, B).astype(np.int32)
    mvy = rng.integers(-80, 80, B).astype(np.int32)
    out = np.asarray(me_jax.mc_lanes(jnp.asarray(ref), jnp.asarray(ys), jnp.asarray(xs),
                                     jnp.asarray(mvy), jnp.asarray(mvx), n, n,
                                     conv_ops.REGULAR, bd))
    for b in range(B):
        want = conv_ops.convolve_2d_scalar(ref, int(xs[b]), int(ys[b]), n, n,
                                           int(mvx[b]), int(mvy[b]),
                                           which=conv_ops.REGULAR, bd=bd)
        np.testing.assert_array_equal(out[b], want, err_msg=f"lane {b}")


def test_mc_lanes_multiref():
    rng = np.random.default_rng(2)
    refs = rng.integers(0, 255, (2, 64, 64)).astype(np.int32)
    ys = np.array([8, 8], np.int32)
    xs = np.array([8, 8], np.int32)
    ridx = np.array([0, 1], np.int32)
    out = np.asarray(me_jax.mc_lanes(jnp.asarray(refs), jnp.asarray(ys), jnp.asarray(xs),
                                     jnp.asarray([6, 6]), jnp.asarray([10, 10]), 8, 8,
                                     conv_ops.REGULAR, 8, ref_idx=jnp.asarray(ridx)))
    for b in range(2):
        want = conv_ops.convolve_2d_scalar(refs[b], 8, 8, 8, 8, 10, 6,
                                           which=conv_ops.REGULAR, bd=8)
        np.testing.assert_array_equal(out[b], want)


def test_fullpel_recovers_global_shift():
    H, W = 128, 192  # 2x3 SBs
    ref = _frame(H + 64, W + 64, 3)
    dy, dx = 5, -7
    src = ref[32 + dy : 32 + dy + H, 32 + dx : 32 + dx + W]
    refc = ref[32 : 32 + H, 32 : 32 + W]
    mvs, mv_sb = me_jax.me_fullpel_frame(jnp.asarray(src), jnp.asarray(refc), 2, 3)
    for n in (8, 16, 32, 64):
        got = np.asarray(mvs[n])
        # interior blocks must all find the exact shift
        assert (got[1:-1, 1:-1] == np.array([dy, dx])).all(), (n, got[:, :, 0])


def test_subpel_refine_recovers_halfpel():
    H, W = 64, 64
    rng = np.random.default_rng(4)
    base = rng.normal(128, 50, (H * 2 + 16, W * 2 + 16))
    for _ in range(4):  # separable box blur -> band-limited (interpolable)
        base = (base[:-2] + base[1:-1] + base[2:]) / 3
        base = (base[:, :-2] + base[:, 1:-1] + base[:, 2:]) / 3
    base = base[: H * 2, : W * 2].clip(0, 255)
    # src = ref shifted by exactly (0.5, 0.5) px via 2x supersampling
    ref = base[::2, ::2].astype(np.int32)
    src = base[1::2, 1::2].astype(np.int32)
    ys = np.array([16], np.int32)
    xs = np.array([16], np.int32)
    srcb = jnp.asarray(src[16:32, 16:32][None])
    mv = np.asarray(me_jax.subpel_refine_lanes(srcb, jnp.asarray(ref), jnp.asarray(ys),
                                               jnp.asarray(xs), jnp.zeros((1, 2), jnp.int32),
                                               conv_ops.REGULAR, 8))
    # expect roughly +4/8 (half-pel) in both components
    assert abs(mv[0, 0] - 4) <= 2 and abs(mv[0, 1] - 4) <= 2, mv
