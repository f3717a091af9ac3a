"""Top-level encoder (round-1 profile: intra-only, CQP).

API shape mirrors the reference's library API (EbSvtAv1Enc.h:966-1076
svt_av1_enc_init/_send_picture/_get_packet): construct with a config, feed
frames, receive AV1 temporal units.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..codec.tile_codec import FrameParams, TileCodec
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
        self.seq = SequenceConfig(width=cfg.width, height=cfg.height, bd=cfg.bd)
        self.params = FrameParams(width=cfg.width, height=cfg.height, qindex=cfg.qindex, bd=cfg.bd,
                                  tile_cols_log2=cfg.tile_cols_log2, tile_rows_log2=cfg.tile_rows_log2)
        if (cfg.tile_cols_log2 or cfg.tile_rows_log2) and cfg.mode_decision != "jax":
            raise ValueError("multi-tile encoding requires the jax mode-decision backend")
        self._wrote_seq_hdr = False

    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> tuple[bytes, list]:
        """Encode one frame as a key frame. Returns (temporal_unit_bytes,
        recon_planes at aligned dims)."""
        p = self.params
        aw, ah = p.aligned_width, p.aligned_height
        src = [
            pad_to_aligned(np.asarray(y, np.int32), aw, ah),
            pad_to_aligned(np.asarray(u, np.int32), aw >> 1, ah >> 1),
            pad_to_aligned(np.asarray(v, np.int32), aw >> 1, ah >> 1),
        ]
        if self.cfg.mode_decision == "jax":
            from . import intra_device

            plan, recon = intra_device.encode_intra_frame(src, p)
        else:
            plan, recon = intra_md.encode_intra_frame(src, p)

        payloads = []
        for tile in p.tiles():
            tc = TileCodec(p, FrameContext(p.qindex), tile=tile)
            payloads.append(tc.encode(plan))
        tile_payload = payloads if len(payloads) > 1 else payloads[0]

        fr = FrameConfig(qindex=p.qindex, disable_cdf_update=p.disable_cdf_update,
                         tile_cols_log2=p.tile_cols_log2, tile_rows_log2=p.tile_rows_log2)
        tu = temporal_delimiter_obu()
        tu += sequence_header_obu(self.seq)
        tu += frame_obu(self.seq, fr, tile_payload)
        return tu, recon
