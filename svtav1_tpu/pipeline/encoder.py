"""Top-level encoder (round-1 profile: intra + low-delay-P inter, CQP).

API shape mirrors the reference's library API (EbSvtAv1Enc.h:966-1076
svt_av1_enc_init/_send_picture/_get_packet): construct with a config, feed
frames, receive AV1 temporal units. GOP/DPB logic is the (simplified)
analog of pd_process.c av1_generate_rps_info: key frame every `keyint`
frames, inter frames reference the previous frame (LAST) from DPB slot 0.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..codec.tile_codec import FrameParams, TileCodec
from ..constants.av1 import RefFrame
from ..constants.cdf import FrameContext
from ..entropy.bitstream import FrameConfig, SequenceConfig, frame_obu, sequence_header_obu, temporal_delimiter_obu
from . import intra_md


@dataclass
class EncoderConfig:
    width: int
    height: int
    qindex: int = 120  # base_q_idx (CQP)
    bd: int = 8
    mode_decision: str = "numpy"  # "numpy" (reference) or "jax" (device path)
    tile_cols_log2: int = 0
    tile_rows_log2: int = 0
    keyint: int = 1  # key frame every N frames (1 = all-intra)
    enable_dlf: bool = True  # in-loop deblocking (by-q levels)
    enable_cdef: bool = True  # CDEF (frame-wide searched strength set)


def mi_from_plan(plan, params: FrameParams):
    """Build the frame-wide mi grid from MD decisions (loop filter input)."""
    from ..codec.mvp import MiState

    plan.materialize()
    mi = MiState(params.mi_rows, params.mi_cols)
    for (r, c, bsize), d in plan.blocks.items():
        mi.set_block(r, c, bsize, d.y_mode, d.ref_frame, int(RefFrame.NONE),
                     (int(d.mv[0]), int(d.mv[1])), skip=d.skip)
    return mi


def pad_to_aligned(plane: np.ndarray, aw: int, ah: int) -> np.ndarray:
    """Replicate-pad a plane to aligned dims (reference
    pic_analysis_process.c pad_picture_to_multiple_of_min_blk_size)."""
    h, w = plane.shape
    out = np.zeros((ah, aw), np.int32)
    out[:h, :w] = plane
    if w < aw:
        out[:h, w:] = plane[:, -1:]
    if h < ah:
        out[h:, :] = out[h - 1 : h, :]
    return out


class Encoder:
    def __init__(self, cfg: EncoderConfig):
        assert cfg.width % 8 == 0 and cfg.height % 8 == 0, "round-1 profile: dims multiple of 8"
        self.cfg = cfg
        self.seq = SequenceConfig(width=cfg.width, height=cfg.height, bd=cfg.bd,
                                  enable_cdef=cfg.enable_cdef)
        if (cfg.tile_cols_log2 or cfg.tile_rows_log2) and cfg.mode_decision != "jax":
            raise ValueError("multi-tile encoding requires the jax mode-decision backend")
        if (cfg.tile_cols_log2 or cfg.tile_rows_log2) and cfg.keyint != 1:
            raise ValueError("round-1 profile: inter frames are single-tile")
        self.frame_idx = 0
        self.dpb = [None] * 8  # slot -> {planes, order_hint}

    def _params(self, is_intra: bool, order_hint: int, ref_hints) -> FrameParams:
        cfg = self.cfg
        lf_levels = (0, 0, 0, 0)
        if cfg.enable_dlf:
            from ..filters import dlf

            lf_levels = dlf.pick_filter_levels(cfg.qindex, cfg.bd, is_intra, cfg.height)
        return FrameParams(width=cfg.width, height=cfg.height, qindex=cfg.qindex, bd=cfg.bd,
                           tile_cols_log2=cfg.tile_cols_log2, tile_rows_log2=cfg.tile_rows_log2,
                           frame_is_intra=is_intra, order_hint=order_hint,
                           ref_hints=tuple(ref_hints), lf_levels=lf_levels)

    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> tuple[bytes, list]:
        """Encode the next frame per the GOP structure. Returns
        (temporal_unit_bytes, recon_planes at aligned dims)."""
        cfg = self.cfg
        is_key = cfg.keyint <= 1 or (self.frame_idx % cfg.keyint == 0)
        order_hint = self.frame_idx & 0x7F
        ref_hints = [0] * 8
        refs = None
        if not is_key:
            entry = self.dpb[0]
            assert entry is not None
            refs = {int(RefFrame.LAST_FRAME): entry["planes"]}
            for ref in range(1, 8):
                ref_hints[ref] = entry["order_hint"]
        p = self._params(is_key, order_hint, ref_hints)

        aw, ah = p.aligned_width, p.aligned_height
        src = [
            pad_to_aligned(np.asarray(y, np.int32), aw, ah),
            pad_to_aligned(np.asarray(u, np.int32), aw >> 1, ah >> 1),
            pad_to_aligned(np.asarray(v, np.int32), aw >> 1, ah >> 1),
        ]
        if is_key:
            if self.cfg.mode_decision == "jax":
                from . import intra_device

                plan, recon = intra_device.encode_intra_frame(src, p)
            else:
                plan, recon = intra_md.encode_intra_frame(src, p)
        else:
            from . import inter_md

            plan, recon = inter_md.encode_inter_frame(src, p, refs)

        payloads = []
        for tile in p.tiles():
            tc = TileCodec(p, FrameContext(p.qindex), tile=tile)
            payloads.append(tc.encode(plan))
        tile_payload = payloads if len(payloads) > 1 else payloads[0]

        # in-loop filters on the encoder's recon (decoder does the same)
        frame_mi = None
        if any(p.lf_levels) or cfg.enable_cdef:
            frame_mi = mi_from_plan(plan, p)
        if any(p.lf_levels):
            from ..filters import dlf

            dlf.loop_filter_frame(recon, frame_mi, p.qindex, p.bd,
                                  is_key, levels=p.lf_levels, sharpness=p.lf_sharpness)
        cdef_y, cdef_uv, cdef_damping = ((0, 0),), ((0, 0),), 3
        if cfg.enable_cdef:
            from ..filters import cdef as cdef_mod

            ypri, ysec, upri, usec, cdef_damping = cdef_mod.search_strengths(
                recon, src, frame_mi, p.qindex, p.bd)
            cdef_y, cdef_uv = ((ypri, ysec),), ((upri, usec),)
            if ypri or ysec or upri or usec:
                cdef_mod.cdef_frame(recon, frame_mi, ypri, ysec, upri, usec, cdef_damping, bd=p.bd)

        fr = FrameConfig(qindex=p.qindex, disable_cdf_update=p.disable_cdf_update,
                         tile_cols_log2=p.tile_cols_log2, tile_rows_log2=p.tile_rows_log2,
                         frame_type=0 if is_key else 1, order_hint=order_hint,
                         refresh_frame_flags=0xFF if is_key else 0x01,
                         ref_frame_idx=(0,) * 7,
                         lf_levels=p.lf_levels, lf_sharpness=p.lf_sharpness,
                         cdef_damping=cdef_damping, cdef_y=cdef_y, cdef_uv=cdef_uv)
        tu = temporal_delimiter_obu()
        if self.frame_idx == 0:
            tu += sequence_header_obu(self.seq)
        tu += frame_obu(self.seq, fr, tile_payload)

        # DPB update (low-delay: every frame lands in slot 0; key refreshes all)
        entry = {"planes": recon, "order_hint": order_hint}
        for slot in range(8):
            if is_key or slot == 0:
                self.dpb[slot] = entry
        self.frame_idx += 1
        return tu, recon
