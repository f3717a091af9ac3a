"""10-bit profile tests: e2e roundtrips with filters + inter, IO."""
import numpy as np

from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.io.y4m import read_y4m, write_y4m
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig


def _clip10(w, h, n, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 1024, (h + 8 * n, w + 8 * n), np.int32)
    out = []
    for t in range(n):
        y = base[t : t + h, 2 * t : 2 * t + w].astype(np.int32)
        u = (base[t : t + h : 2, 2 * t : 2 * t + w : 2] // 2 + 256).astype(np.int32)
        v = (base[t : t + h : 2, 2 * t : 2 * t + w : 2] // 3 + 320).astype(np.int32)
        out.append((y, u, v))
    return out


def test_10bit_e2e_inter_with_filters():
    frames = _clip10(64, 48, 4)
    enc = Encoder(EncoderConfig(width=64, height=48, qindex=100, keyint=4, bd=10))
    dec = Decoder()
    for i, (y, u, v) in enumerate(frames):
        tu, recon = enc.encode_frame(y, u, v)
        dy, du, dv, drecon = dec.decode_tu(tu)
        for pl in range(3):
            assert np.array_equal(recon[pl], drecon[pl]), (i, pl)
        assert int(dy.max()) > 255  # genuinely 10-bit samples survive
        mse = ((dy.astype(float) - y) ** 2).mean()
        assert 10 * np.log10(1023 ** 2 / max(mse, 1e-9)) > 30


def test_10bit_hierarchical():
    frames = _clip10(64, 64, 5, seed=3)
    enc = Encoder(EncoderConfig(width=64, height=64, qindex=120, keyint=32, minigop=4, bd=10))
    dec = Decoder()
    pkts = []
    for f in frames:
        pkts += enc.send_frame(*f)
    pkts += enc.flush()
    shown = 0
    for p in pkts:
        dy, du, dv, drecon = dec.decode_tu(p.tu)
        if p.recon is not None:
            for pl in range(3):
                assert np.array_equal(p.recon[pl], drecon[pl])
        if dy is not None:
            shown += 1
    assert shown == len(frames)


def test_y4m_10bit_roundtrip(tmp_path):
    frames = [(np.full((16, 16), 700, np.uint16), np.full((8, 8), 300, np.uint16),
               np.full((8, 8), 900, np.uint16))]
    path = str(tmp_path / "t.y4m")
    write_y4m(path, frames, 16, 16, bd=10)
    rd, w, h, fps, bd = read_y4m(path)
    assert (w, h, bd) == (16, 16, 10)
    assert np.array_equal(rd[0][0], frames[0][0])
    assert np.array_equal(rd[0][2], frames[0][2])


def test_10bit_device_path():
    """10-bit through the jax device pipeline (intra + inter + filters),
    conformant via both decoders (the device path was 8-bit only in r3)."""
    from svtav1_tpu.utils import aomdec

    w, h = 96, 64
    frames = _clip10(w, h, 4)
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=100, keyint=4, bd=10,
                                mode_decision="jax"))
    dec = Decoder()
    tus, shown = [], []
    for i, (y, u, v) in enumerate(frames):
        tu, recon = enc.encode_frame(y, u, v)
        dy, du, dv, drec = dec.decode_tu(tu)
        for pl in range(3):
            assert np.array_equal(recon[pl], drec[pl]), (i, pl)
        mse = ((dy.astype(float) - y) ** 2).mean()
        assert 10 * np.log10(1023 ** 2 / max(mse, 1e-9)) > 30.0
        tus.append(tu)
        shown.append((dy, du, dv))
    aomdec.verify_tus(tus, shown)
