"""Block-level localization of the hierarchical-B device-inter mismatch."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_inter_device import moving_clip

from svtav1_tpu.codec.tile_codec import FrameParams, TileCodec
from svtav1_tpu.codec.mvp import MiState
from svtav1_tpu.constants.av1 import RefFrame, BLOCK_W, BLOCK_H
from svtav1_tpu.constants.cdf import FrameContext
from svtav1_tpu.pipeline import inter_device, intra_md
from svtav1_tpu.pipeline.encoder import pad_to_aligned

W = H = 64
frames = moving_clip(W, H, 5, step=(0, 1))


def pad(fr):
    p = FrameParams(width=W, height=H, qindex=110, bd=8)
    aw, ah = p.aligned_width, p.aligned_height
    y, u, v = fr
    return [pad_to_aligned(np.asarray(y, np.int32), aw, ah),
            pad_to_aligned(np.asarray(u, np.int32), aw >> 1, ah >> 1),
            pad_to_aligned(np.asarray(v, np.int32), aw >> 1, ah >> 1)]


# frame 0: key (numpy path is fine, just need a recon)
p0 = FrameParams(width=W, height=H, qindex=98, bd=8, frame_is_intra=True)
plan0, rec0 = intra_md.encode_intra_frame(pad(frames[0]), p0)

# frame 4: inter from LAST=rec0 (device path passes conformance for this)
ref_hints4 = [0] * 8
for r in range(1, 8):
    ref_hints4[r] = 0
p4 = FrameParams(width=W, height=H, qindex=118, bd=8, frame_is_intra=False,
                 order_hint=4, ref_hints=tuple(ref_hints4))
plan4, rec4, _f, _pl4 = inter_device.encode_inter_frame_device(
    pad(frames[4]), p4, {int(RefFrame.LAST_FRAME): rec0},
    enable_dlf=False, enable_cdef=False)

# frame 2: B-frame LAST=rec0 ALTREF=rec4 — the failing one
ref_hints2 = [0] * 8
for r in range(1, 8):
    ref_hints2[r] = 4 if r >= int(RefFrame.BWDREF_FRAME) else 0
p2 = FrameParams(width=W, height=H, qindex=118, bd=8, frame_is_intra=False,
                 order_hint=2, ref_hints=tuple(ref_hints2))
refs2 = {int(RefFrame.LAST_FRAME): rec0, int(RefFrame.ALTREF_FRAME): rec4}
plan2, rec2, _f, _pl2 = inter_device.encode_inter_frame_device(
    pad(frames[2]), p2, refs2, enable_dlf=False, enable_cdef=False)

# walk-encode + decode frame 2
tc = TileCodec(p2, FrameContext(p2.qindex))
payload = tc.encode(plan2)
aw, ah = p2.aligned_width, p2.aligned_height
drec = [np.zeros((ah, aw), np.int32), np.zeros((ah >> 1, aw >> 1), np.int32),
        np.zeros((ah >> 1, aw >> 1), np.int32)]
mi = MiState(p2.mi_rows, p2.mi_cols)
tcd = TileCodec(p2, FrameContext(p2.qindex), refs=refs2, mi=mi)
tcd.decode(payload, drec)

plan2.materialize()
print("=== plan2 blocks ===")
for (r, c, bs), d in sorted(plan2.blocks.items()):
    bw, bh = int(BLOCK_W[bs]), int(BLOCK_H[bs])
    y, x = r * 4, c * 4
    ok = np.array_equal(rec2[0][y : y + bh, x : x + bw], drec[0][y : y + bh, x : x + bw])
    if not ok:
        print(f"mi({r},{c}) {bw}x{bh} mode={d.y_mode} ref={d.ref_frame} mv={d.mv} "
              f"skip={d.skip} tx={d.tx_type} MISMATCH")
print("total luma diff px:", int((rec2[0] != drec[0]).sum()))

from svtav1_tpu.ops import convolve as conv_ops
from svtav1_tpu.ops import quantize as quant_ops
from svtav1_tpu.ops import transforms as txfm_ops

bs08 = [bs for (r, c, bs) in plan2.blocks if (r, c) == (0, 8)][0]
d = plan2.blocks[(0, 8, bs08)]
print("block:", d.y_mode, d.ref_frame, d.mv, d.tx_type, d.skip)
pred = conv_ops.convolve_2d_scalar(rec4[0], 32, 0, 32, 32, d.mv[1] * 2, d.mv[0] * 2,
                                   which=p2.interp_filter, bd=8)
lv = d.levels_y
dqc = quant_ops.dequantize_np(lv, p2.qindex, lv.shape[1], lv.shape[0], 8)
rh = txfm_ops.inv_txfm2d_add_np(dqc[None], pred[None], d.tx_type, 8)[0]
dev = rec2[0][0:32, 32:64]
dcd = drec[0][0:32, 32:64]
print("host vs device:", int((rh != dev).sum()), "host vs decoder:", int((rh != dcd).sum()))
print("max |host-dev|:", int(np.abs(rh - dev).max()), "max |host-dcd|:", int(np.abs(rh - dcd).max()))
