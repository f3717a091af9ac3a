"""E2E inter-frame tests: low-delay P GOPs, MV stack, MV coding.

Mirrors the reference's e2e strategy (encode -> decode -> recon identity +
PSNR sanity) extended to inter frames, plus kernel-level roundtrips for the
MV coder and stack (reference test model: test/e2e_test/SvtAv1E2ETest.cc).
"""
import numpy as np
import pytest

from svtav1_tpu.codec.mv import MvCoder
from svtav1_tpu.codec.mvp import MiState, TileBounds, find_mv_stack
from svtav1_tpu.constants.av1 import BlockSize, InterMode, RefFrame
from svtav1_tpu.constants.cdf import FrameContext
from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.entropy.range_coder import RangeDecoder, RangeEncoder
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig


def moving_clip(w, h, n, seed=7, step=(1, 2)):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h + 8 * n, w + 8 * n), np.int32)
    frames = []
    for t in range(n):
        dy, dx = step[0] * t, step[1] * t
        y = base[dy : dy + h, dx : dx + w].astype(np.int32)
        u = (base[dy : dy + h : 2, dx : dx + w : 2] // 2 + 64).astype(np.int32)
        v = (base[dy : dy + h : 2, dx : dx + w : 2] // 3 + 80).astype(np.int32)
        frames.append((y, u, v))
    return frames


def roundtrip(frames, w, h, qindex=100, keyint=8):
    from svtav1_tpu.utils import aomdec

    enc = Encoder(EncoderConfig(width=w, height=h, qindex=qindex, keyint=keyint))
    dec = Decoder()
    sizes, psnrs, tus, shown = [], [], [], []
    for i, (y, u, v) in enumerate(frames):
        tu, recon = enc.encode_frame(y, u, v)
        dy, du, dv, drecon = dec.decode_tu(tu)
        for pl in range(3):
            assert np.array_equal(recon[pl], drecon[pl]), f"frame {i} plane {pl} recon mismatch"
        mse = ((dy.astype(float) - y) ** 2).mean()
        psnrs.append(10 * np.log10(255 ** 2 / max(mse, 1e-9)))
        sizes.append(len(tu))
        tus.append(tu)
        shown.append((recon[0][:h, :w], recon[1][: (h + 1) // 2, : (w + 1) // 2],
                      recon[2][: (h + 1) // 2, : (w + 1) // 2]))
    aomdec.verify_tus(tus, shown)  # independent conformance oracle
    return sizes, psnrs


def test_inter_motion_clip():
    frames = moving_clip(64, 48, 4)
    sizes, psnrs = roundtrip(frames, 64, 48, qindex=100, keyint=4)
    assert min(psnrs) > 30.0
    # ME should exploit pure translation: inter frames well below the key frame
    assert max(sizes[1:]) < 0.75 * sizes[0]


def test_inter_static_scene_is_cheap():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 255, (48, 64), np.int32)
    u = rng.integers(0, 255, (24, 32), np.int32)
    v = rng.integers(0, 255, (24, 32), np.int32)
    frames = [(y, u, v)] * 3
    sizes, psnrs = roundtrip(frames, 64, 48, qindex=100, keyint=3)
    # static: inter frames collapse to skip/zero-mv blocks
    assert max(sizes[1:]) < 0.10 * sizes[0]
    assert min(psnrs) > 30.0


def test_multiple_gops():
    frames = moving_clip(64, 64, 5, seed=11)
    sizes, psnrs = roundtrip(frames, 64, 64, qindex=120, keyint=2)
    assert min(psnrs) > 28.0  # frames 0,2,4 key; 1,3 inter


def test_mv_coder_roundtrip():
    fc = FrameContext(100)
    rng = np.random.default_rng(5)
    mvs, preds = [], []
    for _ in range(200):
        pred = (int(rng.integers(-512, 512)) * 2, int(rng.integers(-512, 512)) * 2)
        mv = (pred[0] + int(rng.integers(-256, 256)) * 2, pred[1] + int(rng.integers(-256, 256)) * 2)
        mvs.append(mv)
        preds.append(pred)
    enc = RangeEncoder()
    wc = MvCoder(fc, update=True)
    for mv, pred in zip(mvs, preds):
        wc.write_mv(enc, mv, pred)
    data = enc.done()
    fc2 = FrameContext(100)
    dec = RangeDecoder(data)
    rc = MvCoder(fc2, update=True)
    for mv, pred in zip(mvs, preds):
        assert rc.read_mv(dec, pred) == mv


def test_mv_stack_basics():
    mi = MiState(16, 16)
    tile = TileBounds(0, 16, 0, 16)
    L = int(RefFrame.LAST_FRAME)
    # no neighbors coded: empty stack, gm fill
    st = find_mv_stack(mi, tile, 0, 0, int(BlockSize.BLOCK_16X16), L)
    assert st.count == 0
    assert tuple(st.mvs[0]) == (0, 0) and tuple(st.mvs[1]) == (0, 0)
    # code an inter block above: its MV becomes the nearest candidate
    mi.set_block(0, 0, int(BlockSize.BLOCK_16X16), int(InterMode.NEWMV), L, int(RefFrame.NONE), (8, -16))
    st = find_mv_stack(mi, tile, 4, 0, int(BlockSize.BLOCK_16X16), L)
    assert st.count >= 1
    assert tuple(st.mvs[0]) == (8, -16)
    assert st.new_mv_ctx in range(6) and st.ref_mv_ctx in range(6)
    # duplicate MVs merge, distinct MVs stack
    mi.set_block(4, 0, int(BlockSize.BLOCK_16X16), int(InterMode.NEARESTMV), L, int(RefFrame.NONE), (8, -16))
    mi.set_block(0, 4, int(BlockSize.BLOCK_16X16), int(InterMode.NEWMV), L, int(RefFrame.NONE), (0, 24))
    st = find_mv_stack(mi, tile, 4, 4, int(BlockSize.BLOCK_16X16), L)
    assert st.count == 2
    mvset = {tuple(st.mvs[i]) for i in range(st.count)}
    assert mvset == {(8, -16), (0, 24)}


def test_mv_stack_tile_isolation():
    """Candidates must not cross the tile boundary."""
    mi = MiState(16, 32)
    L = int(RefFrame.LAST_FRAME)
    mi.set_block(0, 12, int(BlockSize.BLOCK_16X16), int(InterMode.NEWMV), L, int(RefFrame.NONE), (32, 32))
    tile = TileBounds(0, 16, 16, 32)  # right tile: cols 16..32
    st = find_mv_stack(mi, tile, 0, 16, int(BlockSize.BLOCK_16X16), L)
    assert st.count == 0
