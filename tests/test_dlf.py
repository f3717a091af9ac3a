"""Deblocking filter tests: level derivation, edge behavior, e2e identity.

Reference behavior model: deblocking_filter.c svt_av1_pick_filter_level_by_q
+ deblocking_common.c filter kernels (masks gate big real edges, smooth
gentle blocking edges)."""
import numpy as np

from svtav1_tpu.codec.mvp import MiState
from svtav1_tpu.constants.av1 import BlockSize
from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.filters import dlf
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig


def _grid_8x8(n=16):
    mi = MiState(n, n)
    for r in range(0, n, 2):
        for c in range(0, n, 2):
            mi.set_block(r, c, int(BlockSize.BLOCK_8X8), 0, 0, -1, (0, 0), skip=0)
    return mi


def test_levels_monotonic_in_q():
    prev = -1
    for q in (20, 60, 120, 180, 240):
        lvl = dlf.pick_filter_levels(q, 8, True, 480)[0]
        assert lvl >= prev
        prev = lvl
    assert dlf.pick_filter_levels(240, 8, True, 480)[0] <= 63


def test_gentle_edge_smoothed_big_edge_kept():
    mi = _grid_8x8()
    y = np.zeros((64, 64), np.int32)
    y[:, 32:] = 6
    u = np.full((32, 32), 50, np.int32)
    v = u.copy()
    before = y.copy()
    dlf.loop_filter_frame([y, u, v], mi, 120, 8, True)
    assert np.abs(y - before).sum() > 0  # blocking artifact smoothed

    y2 = np.zeros((64, 64), np.int32)
    y2[:, 32:] = 200  # strong real edge: mask must reject
    b2 = y2.copy()
    dlf.loop_filter_frame([y2, u.copy(), v.copy()], mi, 120, 8, True)
    assert np.array_equal(y2, b2)


def test_skip_inter_interior_not_filtered():
    """Interior tx edges between skipped inter blocks are not filtered
    (set_lpf_parameters: !pv_skip || !curr_skip || pu_edge)."""
    mi = MiState(16, 16)
    # one 64x64 skipped inter block: no interior edges at all, but also
    # verify the grid-level rule with adjacent skipped 8x8 inter blocks:
    for r in range(0, 16, 2):
        for c in range(0, 16, 2):
            mi.set_block(r, c, int(BlockSize.BLOCK_8X8), 16, 1, -1, (0, 0), skip=1)
    y = np.zeros((64, 64), np.int32)
    y[:, 32:] = 6
    before = y.copy()
    u = np.full((32, 32), 50, np.int32)
    dlf.loop_filter_frame([y, u, u.copy()], mi, 120, 8, False)
    # all edges are PU edges here (8x8 blocks), so filtering still applies;
    # now make one 16x16 block whose interior 8x8 tx edge must be skipped:
    # (TX_MODE_LARGEST -> tx == block, so interior tx edges don't exist in
    # this profile; assert the pu-edge path filtered above instead)
    assert np.abs(y - before).sum() > 0


def test_e2e_with_dlf_recon_identity():
    rng = np.random.default_rng(9)
    W, H = 64, 64
    base = rng.integers(0, 255, (H + 16, W + 16), np.int32)
    enc = Encoder(EncoderConfig(width=W, height=H, qindex=80, keyint=3))
    dec = Decoder()
    for t in range(3):
        y = base[t : t + H, 2 * t : 2 * t + W]
        u = base[t : t + H : 2, 2 * t : 2 * t + W : 2] // 2
        v = base[t : t + H : 2, 2 * t : 2 * t + W : 2] // 3
        tu, recon = enc.encode_frame(y, u, v)
        _, _, _, drecon = dec.decode_tu(tu)
        for pl in range(3):
            assert np.array_equal(recon[pl], drecon[pl])


def test_dlf_off_still_roundtrips():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 255, (48, 48), np.int32)
    u = rng.integers(0, 255, (24, 24), np.int32)
    v = rng.integers(0, 255, (24, 24), np.int32)
    enc = Encoder(EncoderConfig(width=48, height=48, qindex=100, keyint=2, enable_dlf=False))
    dec = Decoder()
    for _ in range(2):
        tu, recon = enc.encode_frame(y, u, v)
        _, _, _, drecon = dec.decode_tu(tu)
        for pl in range(3):
            assert np.array_equal(recon[pl], drecon[pl])
