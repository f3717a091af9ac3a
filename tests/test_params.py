"""String parameter API tests (svt_av1_enc_parse_parameter analog)."""
import pytest

from svtav1_tpu.params import ParamError, config_from_params, parse_parameter
from svtav1_tpu.pipeline.encoder import EncoderConfig


def test_parse_basic():
    cfg = config_from_params({"qp": "96", "keyint": "16", "hierarchical-levels": "2",
                              "rc": "cbr", "tbr": "800", "enable-cdef": "0"},
                             width=64, height=64)
    assert cfg.qindex == 96 and cfg.keyint == 16 and cfg.minigop == 4
    assert cfg.rc_mode == "cbr" and cfg.target_kbps == 800.0
    assert cfg.enable_cdef is False


def test_range_and_unknown_rejected():
    cfg = EncoderConfig(width=64, height=64)
    with pytest.raises(ParamError):
        parse_parameter(cfg, "qp", "300")
    with pytest.raises(ParamError):
        parse_parameter(cfg, "no-such-key", "1")
    with pytest.raises(ParamError):
        parse_parameter(cfg, "enable-dlf", "maybe")


def test_config_encodes():
    import numpy as np

    from svtav1_tpu.decode.decoder import Decoder
    from svtav1_tpu.pipeline.encoder import Encoder

    cfg = config_from_params({"qp": "120", "keyint": "2"}, width=64, height=64)
    enc = Encoder(cfg)
    dec = Decoder()
    y = np.full((64, 64), 100, np.int32)
    u = v = np.full((32, 32), 120, np.int32)
    for _ in range(2):
        tu, recon = enc.encode_frame(y, u, v)
        _, _, _, drecon = dec.decode_tu(tu)
        for pl in range(3):
            assert np.array_equal(recon[pl], drecon[pl])
