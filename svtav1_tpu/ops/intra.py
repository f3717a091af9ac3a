"""Batched intra prediction (AV1 spec 7.11.2).

TPU-first: each predictor maps a batch of edge vectors
(above: (B, W), left: (B, H), topleft: (B,)) to predictions (B, H, W) with
pure elementwise/broadcast math — no per-block branching. Works with numpy
or jax.numpy via the `xp` module argument (behavioral reference:
Source/Lib/Codec/intra_prediction.c:1029-1140, enc_intra_prediction.c:120-185).

Edge construction rules (reference enc_intra_prediction.c:124-183):
  - missing left  -> fill with above[0] if available else 129 (base+1)
  - missing above -> fill with left[0] if available else 127 (base-1)
  - topleft: both -> real pixel; above only -> above[0]; left only -> left[0];
    neither -> 128 (base); values are for bd=8 and scale as base = 128<<(bd-8).
"""
from __future__ import annotations

import numpy as np

from ..constants.av1 import PredMode

# Normative smooth-predictor weights (AV1 spec "Smooth prediction process",
# reference intra_prediction.c:26-45), indexed by block dimension.
SM_WEIGHTS = {
    4: np.array([255, 149, 85, 64], np.int32),
    8: np.array([255, 197, 146, 105, 73, 50, 37, 32], np.int32),
    16: np.array([255, 225, 196, 170, 145, 123, 102, 84, 68, 54, 43, 33, 26, 20, 17, 16], np.int32),
    32: np.array([255, 240, 225, 210, 196, 182, 169, 157, 145, 133, 122, 111, 101, 92, 83, 74,
                  66, 59, 52, 45, 39, 34, 29, 25, 21, 17, 14, 12, 10, 9, 8, 8], np.int32),
    64: np.array([255, 248, 240, 233, 225, 218, 210, 203, 196, 189, 182, 176, 169, 163, 156,
                  150, 144, 138, 133, 127, 121, 116, 111, 106, 101, 96, 91, 86, 82, 77, 73, 69,
                  65, 61, 57, 54, 50, 47, 44, 41, 38, 35, 32, 29, 27, 25, 22, 20, 18, 16, 15,
                  13, 12, 10, 9, 8, 7, 6, 6, 5, 5, 4, 4, 4], np.int32),
}


def dc_pred(above, left, have_above: bool, have_left: bool, bd: int = 8, xp=np):
    """(B, W), (B, H) -> (B, H, W). Availability is uniform across the batch."""
    B, W = above.shape
    H = left.shape[1]
    if have_above and have_left:
        s = xp.sum(above, axis=1) + xp.sum(left, axis=1)
        dc = (s + ((W + H) >> 1)) // (W + H)
    elif have_above:
        dc = (xp.sum(above, axis=1) + (W >> 1)) >> int(np.log2(W))
    elif have_left:
        dc = (xp.sum(left, axis=1) + (H >> 1)) >> int(np.log2(H))
    else:
        dc = xp.full((B,), 1 << (bd - 1), xp.int32)
    return xp.broadcast_to(dc[:, None, None], (B, H, W)).astype(xp.int32)


def v_pred(above, left, topleft, xp=np):
    B, W = above.shape
    H = left.shape[1]
    return xp.broadcast_to(above[:, None, :], (B, H, W)).astype(xp.int32)


def h_pred(above, left, topleft, xp=np):
    B, W = above.shape
    H = left.shape[1]
    return xp.broadcast_to(left[:, :, None], (B, H, W)).astype(xp.int32)


def paeth_pred(above, left, topleft, xp=np):
    B, W = above.shape
    H = left.shape[1]
    t = above[:, None, :].astype(xp.int32)  # (B,1,W)
    l = left[:, :, None].astype(xp.int32)  # (B,H,1)
    tl = topleft[:, None, None].astype(xp.int32)
    base = t + l - tl
    pt = xp.abs(base - t)
    pl = xp.abs(base - l)
    ptl = xp.abs(base - tl)
    use_l = (pl <= pt) & (pl <= ptl)
    use_t = (pt <= ptl)
    return xp.where(use_l, l + 0 * pt, xp.where(use_t, t + 0 * pl, tl + 0 * pl)).astype(xp.int32)


def smooth_pred(above, left, topleft, xp=np):
    B, W = above.shape
    H = left.shape[1]
    wh = xp.asarray(SM_WEIGHTS[H])[None, :, None]  # (1,H,1)
    ww = xp.asarray(SM_WEIGHTS[W])[None, None, :]  # (1,1,W)
    below = left[:, -1, None, None].astype(xp.int32)
    right = above[:, -1, None, None].astype(xp.int32)
    t = above[:, None, :].astype(xp.int32)
    l = left[:, :, None].astype(xp.int32)
    s = wh * t + (256 - wh) * below + ww * l + (256 - ww) * right
    return ((s + 256) >> 9).astype(xp.int32)


def smooth_v_pred(above, left, topleft, xp=np):
    B, W = above.shape
    H = left.shape[1]
    wh = xp.asarray(SM_WEIGHTS[H])[None, :, None]
    below = left[:, -1, None, None].astype(xp.int32)
    t = above[:, None, :].astype(xp.int32)
    s = wh * t + (256 - wh) * below
    return xp.broadcast_to((s + 128) >> 8, (B, H, W)).astype(xp.int32)


def smooth_h_pred(above, left, topleft, xp=np):
    B, W = above.shape
    H = left.shape[1]
    ww = xp.asarray(SM_WEIGHTS[W])[None, None, :]
    right = above[:, -1, None, None].astype(xp.int32)
    l = left[:, :, None].astype(xp.int32)
    s = ww * l + (256 - ww) * right
    return xp.broadcast_to((s + 128) >> 8, (B, H, W)).astype(xp.int32)


def predict(mode: int, above, left, topleft, have_above: bool, have_left: bool, bd: int = 8, xp=np):
    """Dispatch one mode for a batch of blocks with shared availability."""
    m = PredMode(mode)
    if m == PredMode.DC_PRED:
        return dc_pred(above, left, have_above, have_left, bd, xp)
    fn = {
        PredMode.V_PRED: v_pred,
        PredMode.H_PRED: h_pred,
        PredMode.PAETH_PRED: paeth_pred,
        PredMode.SMOOTH_PRED: smooth_pred,
        PredMode.SMOOTH_V_PRED: smooth_v_pred,
        PredMode.SMOOTH_H_PRED: smooth_h_pred,
    }[m]
    return fn(above, left, topleft, xp=xp)


def build_edges(recon: np.ndarray, x: int, y: int, w: int, h: int, bd: int = 8,
                have_above: bool | None = None, have_left: bool | None = None):
    """Build (above, left, topleft) for one block from the recon plane
    (single-block helper used by the scalar encoder/decoder paths).

    recon: (H, W) plane holding decoded samples for all blocks before this one
    in coding order. Availability defaults to frame-boundary rules; pass
    explicit flags for tile boundaries. Returns above (w,), left (h,), topleft.
    """
    base = 1 << (bd - 1)
    if have_above is None:
        have_above = y > 0
    if have_left is None:
        have_left = x > 0
    if have_above:
        above = recon[y - 1, x : x + w].astype(np.int32)
        if above.shape[0] < w:  # replicate last (frame edge)
            above = np.concatenate([above, np.full(w - above.shape[0], above[-1], np.int32)])
    else:
        above = np.full(w, np.int32(recon[y, x - 1]) if have_left else base - 1, np.int32)
    if have_left:
        left = recon[y : y + h, x - 1].astype(np.int32)
        if left.shape[0] < h:
            left = np.concatenate([left, np.full(h - left.shape[0], left[-1], np.int32)])
    else:
        left = np.full(h, np.int32(recon[y - 1, x]) if have_above else base + 1, np.int32)
    if have_above and have_left:
        topleft = np.int32(recon[y - 1, x - 1])
    elif have_above:
        topleft = np.int32(above[0])
    elif have_left:
        topleft = np.int32(left[0])
    else:
        topleft = np.int32(base)
    return above, left, topleft
