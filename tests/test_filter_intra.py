"""Filter-intra (recursive intra) tests: predictor, syntax, e2e.

Behavior model: intra_prediction.c svt_aom_highbd_filter_intra_predictor
(:2474) and the spec filter_intra_mode_info syntax (5.11.8)."""
import numpy as np

from svtav1_tpu.codec.tile_codec import BlockDecision, FrameParams, Plan, TileCodec
from svtav1_tpu.constants.av1 import BlockSize, Partition, PredMode
from svtav1_tpu.constants.cdf import FrameContext
from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.ops import intra as intra_ops
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig


def test_predictor_shapes_and_range():
    above = np.arange(32, dtype=np.int32) + 100
    left = np.arange(32, dtype=np.int32) + 50
    for m in range(5):
        for (w, h) in ((4, 4), (8, 8), (16, 16), (32, 32), (8, 16)):
            p = intra_ops.filter_intra_pred(above, left, 90, m, w, h)
            assert p.shape == (h, w)
            assert p.min() >= 0 and p.max() <= 255


def test_handcrafted_plan_decodes_to_ops_predictor():
    W = H = 64
    p = FrameParams(width=W, height=H, qindex=100, enable_filter_intra=True)
    plan = Plan()
    plan.partitions[(0, 0, int(BlockSize.BLOCK_64X64))] = int(Partition.PARTITION_SPLIT)
    for k, (r, c) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
        plan.partitions[(r, c, int(BlockSize.BLOCK_32X32))] = int(Partition.PARTITION_NONE)
        plan.blocks[(r, c, int(BlockSize.BLOCK_32X32))] = BlockDecision(
            y_mode=int(PredMode.DC_PRED), uv_mode=int(PredMode.DC_PRED), skip=1,
            use_filter_intra=1, filter_intra_mode=k % 5)
    data = TileCodec(p, FrameContext(100)).encode(plan)
    recon = [np.zeros((64, 64), np.int32), np.zeros((32, 32), np.int32), np.zeros((32, 32), np.int32)]
    TileCodec(p, FrameContext(100)).decode(data, recon)
    exp = np.zeros((64, 64), np.int32)
    for k, (py, px) in enumerate(((0, 0), (0, 32), (32, 0), (32, 32))):
        above, left, tl = intra_ops.build_edges(exp, px, py, 32, 32, 8, py > 0, px > 0)
        exp[py : py + 32, px : px + 32] = intra_ops.filter_intra_pred(
            above, left, int(tl), k % 5, 32, 32, 8)
    assert np.array_equal(recon[0], exp)


def test_e2e_with_filter_intra_enabled():
    rng = np.random.default_rng(7)
    W = H = 64
    yy, xx = np.mgrid[0:H, 0:W]
    enc = Encoder(EncoderConfig(width=W, height=H, qindex=120, keyint=2,
                                enable_filter_intra=True))
    dec = Decoder()
    for t in range(3):
        y = (80 + xx * 0.9 + yy * 0.5 + rng.normal(0, 3, (H, W))).clip(0, 255).astype(np.int32)
        u = np.full((32, 32), 110, np.int32)
        v = np.full((32, 32), 140, np.int32)
        tu, recon = enc.encode_frame(y, u, v)
        dy, du, dv, drecon = dec.decode_tu(tu)
        for pl in range(3):
            assert np.array_equal(recon[pl], drecon[pl])
