"""Multi-chip tile sharding on the virtual 8-device CPU mesh (conftest):
the production decide pass runs as ONE shard_map step over the mesh, the
assembled multi-tile bitstream must decode with recon identical to the
encoder's. Mirrors SURVEY §2.5 tile-parallel axis / ec_process.c per-tile EC."""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from svtav1_tpu.codec.tile_codec import FrameParams
from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.entropy.bitstream import (FrameConfig, SequenceConfig, frame_obu,
                                          sequence_header_obu, temporal_delimiter_obu)
from svtav1_tpu.parallel import tiles as ptiles
from svtav1_tpu.pipeline.encoder import pad_to_aligned


@pytest.mark.parametrize("ndev", [4, 8])
def test_mesh_tile_encode_decodes(ndev):
    devs = jax.devices("cpu")
    assert len(devs) >= ndev, "conftest must provide 8 virtual devices"
    mesh = Mesh(np.array(devs[:ndev]), ("tile",))

    w, h = 64 * ndev, 64
    p = FrameParams(width=w, height=h, qindex=110, frame_is_intra=True,
                    tile_cols_log2=int(np.log2(ndev)))
    rng = np.random.default_rng(4)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (110 + 60 * np.sin(xx / 9.0) + 35 * np.cos(yy / 7.0)
         + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.int32)
    u = rng.integers(70, 180, (h // 2, w // 2)).astype(np.int32)
    v = rng.integers(70, 180, (h // 2, w // 2)).astype(np.int32)
    aw, ah = p.aligned_width, p.aligned_height
    src = [pad_to_aligned(y, aw, ah), pad_to_aligned(u, aw // 2, ah // 2),
           pad_to_aligned(v, aw // 2, ah // 2)]

    payloads, recon, p_out = ptiles.encode_intra_frame_mesh(src, p, mesh)
    assert len(payloads) == ndev

    seq = SequenceConfig(width=w, height=h, bd=8, enable_cdef=False)
    fr = FrameConfig(qindex=p.qindex, disable_cdf_update=False, show_frame=True,
                     tile_cols_log2=p_out.tile_cols_log2, frame_type=0)
    tu = temporal_delimiter_obu() + sequence_header_obu(seq) + frame_obu(seq, fr, payloads)
    dy, du, dv, drecon = Decoder().decode_tu(tu)
    for pl in range(3):
        assert np.array_equal(recon[pl], drecon[pl]), f"plane {pl}"
