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


# ---------------------------------------------------------------------------
# Directional prediction (AV1 spec 7.11.2.4; behavior intra_prediction.c:314-413)
# ---------------------------------------------------------------------------

import functools
import os as _os

_DATA = _os.path.join(_os.path.dirname(__file__), "..", "constants", "data")

# base angles for the 8 directional modes, enum order V..D67
MODE_ANGLE = {int(PredMode.V_PRED): 90, int(PredMode.H_PRED): 180, int(PredMode.D45_PRED): 45,
              int(PredMode.D135_PRED): 135, int(PredMode.D113_PRED): 113, int(PredMode.D157_PRED): 157,
              int(PredMode.D203_PRED): 203, int(PredMode.D67_PRED): 67}


@functools.lru_cache(maxsize=None)
def _avail_tables() -> dict:
    with np.load(_os.path.join(_DATA, "intra_avail.npz")) as z:
        return {k: z[k].copy() for k in z.files}


def _dr_derivative(angle: int) -> tuple[int, int]:
    """(dx, dy) per reference get_dx/get_dy (intra_prediction.c:286-300)."""
    d = _avail_tables()["eb_dr_intra_derivative"]
    if 0 < angle < 90:
        dx = int(d[angle])
    elif 90 < angle < 180:
        dx = int(d[180 - angle])
    else:
        dx = 1
    if 90 < angle < 180:
        dy = int(d[angle - 90])
    elif 180 < angle < 270:
        dy = int(d[270 - angle])
    else:
        dy = 1
    return dx, dy


@functools.lru_cache(maxsize=None)
def dr_tables(angle: int, w: int, h: int):
    """Constant gather tables for directional prediction (upsample==0).

    Returns (src_sel, base, shift) as (h, w) int32 arrays:
      src_sel 0 -> gather from above_ext at [base] (index -1 == topleft,
      so stored offset +1); 1 -> from left_ext likewise. `shift` in 0..31.
      base is clamped to the max extension; positions past max replicate
      the last extension pixel (base points at it with shift 0).
    """
    dx, dy = _dr_derivative(angle)
    rr, cc = np.mgrid[0:h, 0:w]
    if angle < 90:  # zone 1: above only
        x = (rr + 1) * dx
        base = (x >> 6) + cc
        shift = (x & 0x3F) >> 1
        maxb = w + h - 1
        over = base >= maxb
        base = np.where(over, maxb, base)
        shift = np.where(over, 0, shift)
        return np.zeros_like(base), base.astype(np.int32), shift.astype(np.int32)
    if angle > 180:  # zone 3: left only
        y = (cc + 1) * dy
        base = (y >> 6) + rr
        shift = (y & 0x3F) >> 1
        maxb = w + h - 1
        over = base >= maxb
        base = np.where(over, maxb, base)
        shift = np.where(over, 0, shift)
        return np.ones_like(base), base.astype(np.int32), shift.astype(np.int32)
    # zone 2: above for base_x >= -1 else left
    xrow = -(rr + 1) * dx
    base1 = (xrow >> 6) + cc
    shift1 = (xrow & 0x3F) >> 1
    yy = (rr << 6) - (cc + 1) * dy
    base2 = yy >> 6
    shift2 = (yy & 0x3F) >> 1
    use_above = base1 >= -1
    base = np.where(use_above, base1, base2)
    shift = np.where(use_above, shift1, shift2)
    return np.where(use_above, 0, 1).astype(np.int32), base.astype(np.int32), shift.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _dr_matrix(angle: int, w: int, h: int) -> np.ndarray:
    """Directional prediction as one constant matrix: pred = E @ M where
    E = [topleft, above_ext (w+h), left_ext (h+w)] per batch row and
    M (1+2(w+h), w*h) float32 carries the two-tap 5-bit interpolation
    weights. TPU-first form: gathers from tiny per-lane edge vectors lower
    to slow paths, while an MXU matmul with a static (sparse) matrix is
    fast — and exact, since every product/sum stays below 2^24."""
    src_sel, base, shift = dr_tables(angle, w, h)
    e = w + h
    M = np.zeros((1 + 2 * e, w * h), np.float32)
    pos = np.arange(w * h)
    for sel_val, off in ((0, 0), (1, e)):
        m = (src_sel.reshape(-1) == sel_val)
        bi = base.reshape(-1) + 1  # slot 0 = topleft
        bs = shift.reshape(-1)
        i0 = np.where(bi == 0, 0, bi + off)
        i1 = np.minimum(bi + 1, e) + off
        i1 = np.where(bi + 1 == 0, 0, i1)
        np.add.at(M, (i0[m], pos[m]), (32 - bs[m]).astype(np.float32))
        np.add.at(M, (i1[m], pos[m]), bs[m].astype(np.float32))
    return M


def dr_pred(above_ext, left_ext, topleft, angle: int, w: int, h: int, xp=np):
    """Directional prediction for a batch.

    above_ext: (B, w + h) above row incl. top-right extension (replicated
    per availability); left_ext: (B, h + w); topleft (B,).
    """
    B = above_ext.shape[0]
    if xp is not np:  # device path: one MXU matmul against a static matrix
        E = xp.concatenate([topleft[:, None], above_ext, left_ext], axis=1)
        M = xp.asarray(_dr_matrix(angle, w, h))
        val = (E.astype(xp.float32) @ M).astype(xp.int32)
        return ((val + 16) >> 5).reshape(B, h, w)
    src_sel, base, shift = dr_tables(angle, w, h)
    # prepend topleft so index -1 maps to slot 0
    a = xp.concatenate([topleft[:, None], above_ext], axis=1)  # (B, 1+w+h)
    l = xp.concatenate([topleft[:, None], left_ext], axis=1)
    bi = xp.asarray(base) + 1
    bs = xp.asarray(shift)
    sel = xp.asarray(src_sel)
    va = a[:, bi] * (32 - bs) + a[:, xp.minimum(bi + 1, a.shape[1] - 1)] * bs
    vl = l[:, bi] * (32 - bs) + l[:, xp.minimum(bi + 1, l.shape[1] - 1)] * bs
    val = xp.where(sel[None] == 0, va, vl)
    return ((val + 16) >> 5).astype(xp.int32)


def intra_has_top_right(bsize: int, mi_row: int, mi_col: int, have_top: bool, right_available: bool) -> bool:
    """Square-block, whole-block-tx subset of the reference rule
    (intra_prediction.c svt_aom_intra_has_top_right; 64px superblocks)."""
    if not have_top or not right_available:
        return False
    from ..constants.av1 import BLOCK_W as _BW

    bw_mi_log2 = int(np.log2(_BW[bsize] // 4))
    sb_mi_size = 16
    blk_row_in_sb = (mi_row & (sb_mi_size - 1)) >> bw_mi_log2
    blk_col_in_sb = (mi_col & (sb_mi_size - 1)) >> bw_mi_log2
    if blk_row_in_sb == 0:
        return True
    if ((blk_col_in_sb + 1) << bw_mi_log2) >= sb_mi_size:
        return False
    name = {8: "has_tr_8x8", 16: "has_tr_16x16", 32: "has_tr_32x32", 64: "has_tr_64x64"}[int(_BW[bsize])]
    tbl = _avail_tables()[name]
    idx = (blk_row_in_sb << (4 - bw_mi_log2)) + blk_col_in_sb
    return bool((int(tbl[idx // 8]) >> (idx % 8)) & 1)


def intra_has_bottom_left(bsize: int, mi_row: int, mi_col: int, bottom_available: bool, have_left: bool) -> bool:
    """Square-block subset of svt_aom_intra_has_bottom_left."""
    if not bottom_available or not have_left:
        return False
    from ..constants.av1 import BLOCK_W as _BW

    bw_mi_log2 = int(np.log2(_BW[bsize] // 4))
    sb_mi_size = 16
    blk_row_in_sb = (mi_row & (sb_mi_size - 1)) >> bw_mi_log2
    blk_col_in_sb = (mi_col & (sb_mi_size - 1)) >> bw_mi_log2
    # leftmost column of superblock: available only while the needed rows
    # stay inside the left superblock
    if blk_col_in_sb == 0:
        return ((blk_row_in_sb + 1) << bw_mi_log2) < sb_mi_size
    name = {8: "has_bl_8x8", 16: "has_bl_16x16", 32: "has_bl_32x32", 64: "has_bl_64x64"}[int(_BW[bsize])]
    tbl = _avail_tables()[name]
    idx = (blk_row_in_sb << (4 - bw_mi_log2)) + blk_col_in_sb
    return bool((int(tbl[idx // 8]) >> (idx % 8)) & 1)


def build_edges_ext(recon, x: int, y: int, w: int, h: int, bd: int,
                    have_above: bool, have_left: bool,
                    n_topright: int, n_bottomleft: int):
    """Extended edges for directional modes.

    Returns (above_ext (w+h,), left_ext (h+w,), topleft) with the
    normative replication rules (reference enc_intra_prediction.c:124-183):
    real above pixels [x, x+w+n_topright), then replicate; same for left.
    """
    base = 1 << (bd - 1)
    na, nl = w + h, h + w
    if have_above:
        avail = w + max(n_topright, 0)
        row = recon[y - 1, x : x + avail].astype(np.int32)
        above = np.empty(na, np.int32)
        above[: row.shape[0]] = row
        above[row.shape[0] :] = row[-1]
    else:
        above = np.full(na, np.int32(recon[y, x - 1]) if have_left else base - 1, np.int32)
    if have_left:
        avail = h + max(n_bottomleft, 0)
        col = recon[y : y + avail, x - 1].astype(np.int32)
        left = np.empty(nl, np.int32)
        left[: col.shape[0]] = col
        left[col.shape[0] :] = col[-1]
    else:
        left = np.full(nl, np.int32(recon[y - 1, x]) if have_above else base + 1, np.int32)
    if have_above and have_left:
        topleft = np.int32(recon[y - 1, x - 1])
    elif have_above:
        topleft = np.int32(above[0])
    elif have_left:
        topleft = np.int32(left[0])
    else:
        topleft = np.int32(base)
    return above, left, topleft


# ---------------------------------------------------------------- filter intra

FILTER_INTRA_MODES = 5
_FI_DATA = _os.path.join(_os.path.dirname(__file__), "..", "constants", "data", "filter_intra.npz")


@functools.lru_cache(maxsize=None)
def filter_intra_taps() -> np.ndarray:
    """(5, 8, 8) int32 taps (AV1 spec Intra_Filter_Taps; reference
    C_DEFAULT/filterintra_c.c eb_av1_filter_intra_taps)."""
    with np.load(_FI_DATA) as z:
        return z["taps"].astype(np.int32)


def filter_intra_pred(above: np.ndarray, left: np.ndarray, topleft: int, mode: int,
                      w: int, h: int, bd: int = 8) -> np.ndarray:
    """Recursive filter-intra predictor (spec 7.11.2.3; reference
    svt_aom_highbd_filter_intra_predictor intra_prediction.c:2474):
    4x2 sub-blocks predicted from 7 neighbors with per-mode taps."""
    assert w <= 32 and h <= 32
    taps = filter_intra_taps()[mode]
    buf = np.zeros((h + 1, w + 1), np.int64)
    buf[0, 0] = topleft
    buf[0, 1 : w + 1] = above[:w]
    buf[1 : h + 1, 0] = left[:h]
    hi = (1 << bd) - 1
    for r in range(1, h + 1, 2):
        for c in range(1, w + 1, 4):
            p = np.array([buf[r - 1, c - 1], buf[r - 1, c], buf[r - 1, c + 1], buf[r - 1, c + 2],
                          buf[r - 1, c + 3], buf[r, c - 1], buf[r + 1, c - 1], 0], np.int64)
            s = taps @ p  # (8,)
            # ROUND_POWER_OF_TWO_SIGNED(x, 4)
            v = np.sign(s) * ((np.abs(s) + 8) >> 4)
            v = np.clip(v, 0, hi)
            for k in range(8):
                buf[r + (k >> 2), c + (k & 3)] = v[k]
    return buf[1 : h + 1, 1 : w + 1].astype(np.int32)
