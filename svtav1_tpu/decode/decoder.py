"""Conformance-oracle decoder for the streams this encoder emits.

Full spec-order parse of the OBU layer, sequence header, key-frame header,
then TileCodec.decode for the tile payload. Mirrors the reference's e2e test
strategy (test/e2e_test/RefDecoder + recon compare): every encoded stream
must decode here with recon bit-identical to the encoder's own recon.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..codec.tile_codec import FrameParams, TileCodec
from ..constants.av1 import ObuType
from ..constants.cdf import FrameContext
from ..entropy.bitstream import BitReader, read_leb128


@dataclass
class SeqInfo:
    width: int
    height: int
    bd: int


def parse_sequence_header(payload: bytes) -> SeqInfo:
    r = BitReader(payload)
    assert r.f(3) == 0, "profile 0 only"
    r.f(1)  # still_picture
    assert r.f(1) == 0, "reduced_still_picture_header unsupported"
    assert r.f(1) == 0  # timing_info
    r.f(1)  # initial_display_delay
    assert r.f(5) == 0  # operating points cnt
    r.f(12)
    lvl = r.f(5)
    if lvl > 7:
        r.f(1)
    wbits = r.f(4) + 1
    hbits = r.f(4) + 1
    w = r.f(wbits) + 1
    h = r.f(hbits) + 1
    assert r.f(1) == 0  # frame_id_numbers
    assert r.f(1) == 0  # use_128x128_superblock
    r.f(2)  # filter_intra, intra_edge_filter
    r.f(4)  # interintra, masked, warped, dual_filter
    assert r.f(1) == 0  # enable_order_hint
    if r.f(1) == 0:  # seq_choose_screen_content_tools
        assert r.f(1) == 0
    assert r.f(1) == 0  # enable_superres
    assert r.f(1) == 0  # enable_cdef
    assert r.f(1) == 0  # enable_restoration
    high_bd = r.f(1)
    assert r.f(1) == 0  # mono_chrome
    assert r.f(1) == 0  # color_description_present
    r.f(1)  # color_range
    r.f(2)  # chroma_sample_position
    assert r.f(1) == 0  # separate_uv_delta_q
    assert r.f(1) == 0  # film_grain
    return SeqInfo(width=w, height=h, bd=10 if high_bd else 8)


@dataclass
class FrameInfo:
    qindex: int
    disable_cdf_update: bool
    header_bytes: int  # size of frame header portion (byte aligned)
    tile_cols_log2: int = 0
    tile_rows_log2: int = 0


def parse_frame_header(payload: bytes, seq: SeqInfo) -> FrameInfo:
    r = BitReader(payload)
    assert r.f(1) == 0  # show_existing_frame
    assert r.f(2) == 0  # KEY_FRAME
    show_frame = r.f(1)
    assert show_frame == 1
    disable_cdf_update = r.f(1)
    assert r.f(1) == 0  # frame_size_override
    assert r.f(1) == 0  # render_and_frame_size_different
    if not disable_cdf_update:
        assert r.f(1) == 1  # disable_frame_end_update_cdf
    assert r.f(1) == 1  # uniform_tile_spacing
    tcl = 0
    while r.f(1) == 1:
        tcl += 1
    trl = 0
    while r.f(1) == 1:
        trl += 1
    if tcl or trl:
        r.f(tcl + trl)  # context_update_tile_id
        tsb = r.f(2) + 1
        assert tsb == 4, tsb
    qindex = r.f(8)
    assert r.f(1) == 0  # delta_q_y_dc
    assert r.f(1) == 0  # delta_q_u_dc
    assert r.f(1) == 0  # delta_q_u_ac
    assert r.f(1) == 0  # using_qmatrix
    assert r.f(1) == 0  # segmentation_enabled
    if qindex > 0:
        assert r.f(1) == 0  # delta_q_present
    assert r.f(6) == 0 and r.f(6) == 0  # lf levels
    r.f(3)  # sharpness
    assert r.f(1) == 0  # lf delta enabled
    assert r.f(1) == 0  # tx_mode_select -> LARGEST
    assert r.f(1) == 0  # reduced_tx_set
    if tcl or trl:
        assert r.f(1) == 0  # tile_start_and_end_present_flag
    r.byte_alignment()
    return FrameInfo(qindex=qindex, disable_cdf_update=bool(disable_cdf_update),
                     header_bytes=r.pos // 8, tile_cols_log2=tcl, tile_rows_log2=trl)


def decode_temporal_unit(data: bytes):
    """Decode one TU -> (y, u, v) planes cropped to display size."""
    pos = 0
    seq = None
    out = None
    while pos < len(data):
        header = data[pos]
        obu_type = (header >> 3) & 0xF
        has_size = (header >> 1) & 1
        assert (header & 0x80) == 0 and has_size
        pos += 1
        size, pos = read_leb128(data, pos)
        payload = data[pos : pos + size]
        pos += size
        if obu_type == int(ObuType.OBU_SEQUENCE_HEADER):
            seq = parse_sequence_header(payload)
        elif obu_type == int(ObuType.OBU_FRAME):
            assert seq is not None
            fi = parse_frame_header(payload, seq)
            tile_data = payload[fi.header_bytes :]
            params = FrameParams(width=seq.width, height=seq.height, qindex=fi.qindex, bd=seq.bd,
                                 disable_cdf_update=fi.disable_cdf_update,
                                 tile_cols_log2=fi.tile_cols_log2, tile_rows_log2=fi.tile_rows_log2)
            tiles = params.tiles()
            aw, ah = params.aligned_width, params.aligned_height
            recon = [np.zeros((ah, aw), np.int32), np.zeros((ah >> 1, aw >> 1), np.int32),
                     np.zeros((ah >> 1, aw >> 1), np.int32)]
            off = 0
            for i, tile in enumerate(tiles):
                if i < len(tiles) - 1:
                    tsz = int.from_bytes(tile_data[off : off + 4], "little") + 1
                    off += 4
                else:
                    tsz = len(tile_data) - off
                tc = TileCodec(params, FrameContext(fi.qindex), tile=tile)
                tc.decode(tile_data[off : off + tsz], recon)
                off += tsz
            w, h = seq.width, seq.height
            out = (recon[0][:h, :w], recon[1][: h >> 1, : w >> 1], recon[2][: h >> 1, : w >> 1], recon)
    return out
