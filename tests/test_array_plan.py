"""Array-plan parity: the vectorized op-stream builder (codec/array_plan)
must produce byte-identical tile payloads to the BlockDecision walk
(tile_walk_native.flatten_plan) for both intra and inter device frames,
including ragged (non-64-multiple) dims and multi-tile intra."""
import numpy as np
import pytest

from svtav1_tpu.codec.tile_codec import FrameParams, TileCodec
from svtav1_tpu.constants.av1 import RefFrame
from svtav1_tpu.constants.cdf import FrameContext
from svtav1_tpu.pipeline import device_commit, inter_device
from svtav1_tpu.pipeline.encoder import pad_to_aligned


def _src(w, h, seed=3):
    rng = np.random.default_rng(seed)
    p = FrameParams(width=w, height=h, qindex=100)
    aw, ah = p.aligned_width, p.aligned_height
    yy, xx = np.mgrid[0:h, 0:w]
    y = (100 + 70 * np.sin(xx / 7.0) + 40 * np.cos(yy / 11.0)
         + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.int32)
    u = rng.integers(80, 170, (h // 2, w // 2)).astype(np.int32)
    v = rng.integers(80, 170, (h // 2, w // 2)).astype(np.int32)
    return [pad_to_aligned(y, aw, ah), pad_to_aligned(u, aw // 2, ah // 2),
            pad_to_aligned(v, aw // 2, ah // 2)]


@pytest.mark.parametrize("dims", [(64, 64), (128, 96), (104, 72)])
def test_intra_array_plan_parity(dims):
    w, h = dims
    p = FrameParams(width=w, height=h, qindex=100, frame_is_intra=True)
    src = _src(w, h)
    arr = device_commit.encode_intra_frames([src], p, use_arrays=True)[0]
    leg = device_commit.encode_intra_frames([src], p, use_arrays=False)[0]
    assert arr[3] is not None and leg[3] is None
    legacy_payload = TileCodec(p, FrameContext(p.qindex)).encode(leg[0])
    assert arr[3][0] == legacy_payload
    for pl in range(3):
        assert np.array_equal(arr[1][pl], leg[1][pl])


def test_intra_array_plan_parity_tiles():
    w = h = 128
    p = FrameParams(width=w, height=h, qindex=100, frame_is_intra=True,
                    tile_cols_log2=1)
    src = _src(w, h, seed=5)
    arr = device_commit.encode_intra_frames([src], p, use_arrays=True)[0]
    leg = device_commit.encode_intra_frames([src], p, use_arrays=False)[0]
    tiles = p.tiles()
    assert len(arr[3]) == len(tiles) == 2
    for i, tile in enumerate(tiles):
        legacy_payload = TileCodec(p, FrameContext(p.qindex), tile=tile).encode(leg[0])
        assert arr[3][i] == legacy_payload, f"tile {i}"


def test_inter_array_plan_parity():
    w, h = 96, 64
    rng = np.random.default_rng(11)
    p0 = FrameParams(width=w, height=h, qindex=96, frame_is_intra=True)
    src0 = _src(w, h, seed=7)
    _, rec0 = device_commit.encode_intra_frame(src0, p0)
    # moving content: shift + noise
    src1 = [np.roll(pl, shift=1, axis=1) for pl in src0]
    src1[0] = np.clip(src1[0] + rng.integers(-2, 3, src1[0].shape), 0, 255)
    ref_hints = tuple([0] * 8)
    p1 = FrameParams(width=w, height=h, qindex=104, frame_is_intra=False,
                     order_hint=1, ref_hints=ref_hints)
    refs = {int(RefFrame.LAST_FRAME): rec0}
    arr = inter_device.encode_inter_frame_device(src1, p1, refs, use_arrays=True)
    leg = inter_device.encode_inter_frame_device(src1, p1, refs, use_arrays=False)
    legacy_payload = TileCodec(p1, FrameContext(p1.qindex)).encode(leg[0])
    assert arr[3] is not None and arr[3][0] == legacy_payload
    for pl in range(3):
        assert np.array_equal(arr[1][pl], leg[1][pl])
