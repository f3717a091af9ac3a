"""HDR metadata OBUs (CLL / mastering display / ITU-T T.35) — spec 5.8.1 /
6.7.x; reference Source/Lib/Globals/metadata_handle.c."""
from __future__ import annotations

import numpy as np

from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.entropy.bitstream import (METADATA_HDR_CLL, METADATA_HDR_MDCV,
                                          METADATA_ITUT_T35, content_light_obu,
                                          itut_t35_obu, mastering_display_obu)


def _parse_obu(data: bytes):
    header = data[0]
    obu_type = (header >> 3) & 0xF
    pos = 1
    size = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        size |= (b & 0x7F) << shift
        shift += 7
        if not (b & 0x80):
            break
    return obu_type, data[pos : pos + size], pos + size


def test_metadata_obu_layout():
    o = content_light_obu(1000, 400)
    t, payload, _ = _parse_obu(o)
    assert t == 5  # OBU_METADATA
    assert payload[0] == METADATA_HDR_CLL
    assert int.from_bytes(payload[1:3], "big") == 1000
    assert int.from_bytes(payload[3:5], "big") == 400
    assert payload[-1] == 0x80  # trailing bits

    m = mastering_display_obu(((0.708, 0.292), (0.170, 0.797), (0.131, 0.046)),
                              (0.3127, 0.3290), 1000.0, 0.005)
    t, payload, _ = _parse_obu(m)
    assert t == 5 and payload[0] == METADATA_HDR_MDCV
    assert int.from_bytes(payload[1:3], "big") == round(0.708 * 65536)
    assert len(payload) == 1 + 8 * 2 + 8 + 1

    u = itut_t35_obu(0xB5, b"\x01\x02payload")
    t, payload, _ = _parse_obu(u)
    assert t == 5 and payload[0] == METADATA_ITUT_T35 and payload[1] == 0xB5


def test_metadata_in_stream_decodes():
    """Key-frame TUs carry the metadata; the decoder skips it cleanly."""
    from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig

    rng = np.random.default_rng(0)
    w = h = 64
    y = rng.integers(0, 255, (h, w)).astype(np.int32)
    u = rng.integers(0, 255, (h // 2, w // 2)).astype(np.int32)
    v = rng.integers(0, 255, (h // 2, w // 2)).astype(np.int32)
    enc = Encoder(EncoderConfig(
        width=w, height=h, qindex=120,
        content_light=(1000, 400),
        mastering_display=(((0.708, 0.292), (0.170, 0.797), (0.131, 0.046)),
                           (0.3127, 0.3290), 1000.0, 0.005),
        itut_t35=b"\x00\x01hdr10plus-ish"))
    pkts = enc.send_frame(y, u, v) + enc.flush()
    assert len(pkts) == 1
    tu = pkts[0].tu
    # three metadata OBUs present
    n_meta = 0
    pos = 0
    while pos < len(tu):
        t, _p, consumed = _parse_obu(tu[pos:])
        n_meta += t == 5
        pos += consumed
    assert n_meta == 3
    dy, du, dv, drecon = Decoder().decode_tu(tu)
    for pl, ours in enumerate(pkts[0].recon):
        assert np.array_equal(np.asarray(ours), drecon[pl])
