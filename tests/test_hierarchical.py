"""Hierarchical-B mini-GoP tests: scheduling, reordering, multi-ref e2e.

Behavior model: pd_process.c mini-GoP construction + show_existing_frame
display semantics (packetization_process.c :820-833)."""
import numpy as np

from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.pipeline import gop
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig


def test_schedule_minigop4():
    sched = gop.schedule_minigop(0, 4)
    order = [f.disp_idx for f in sched]
    assert order == [4, 2, 1, 3]
    shows = {f.disp_idx: f.show for f in sched}
    assert shows == {4: False, 2: False, 1: True, 3: True}
    se = {f.disp_idx: f.show_existing for f in sched}
    assert se[1] == [2] and se[3] == [4]
    layers = {f.disp_idx: f.layer for f in sched}
    assert layers == {4: 0, 2: 1, 1: 2, 3: 2}
    refs = {f.disp_idx: (f.past_idx, f.future_idx) for f in sched}
    assert refs == {4: (0, None), 2: (0, 4), 1: (0, 2), 3: (2, 4)}


def test_schedule_minigop_sizes():
    assert [f.disp_idx for f in gop.schedule_minigop(10, 1)] == [11]
    assert gop.schedule_minigop(10, 1)[0].show
    s2 = gop.schedule_minigop(4, 2)
    assert [f.disp_idx for f in s2] == [6, 5]
    assert s2[1].show_existing == [6]


def _clip(w, h, n, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h + 8 * n, w + 8 * n), np.int32)
    out = []
    for t in range(n):
        y = base[t : t + h, 2 * t : 2 * t + w].astype(np.int32)
        u = (base[t : t + h : 2, 2 * t : 2 * t + w : 2] // 2 + 64).astype(np.int32)
        v = (base[t : t + h : 2, 2 * t : 2 * t + w : 2] // 3 + 80).astype(np.int32)
        out.append((y, u, v))
    return out


def _run(frames, w, h, minigop, keyint=64, qindex=100):
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=qindex, keyint=keyint, minigop=minigop))
    dec = Decoder()
    packets = []
    for f in frames:
        packets += enc.send_frame(*f)
    packets += enc.flush()
    displayed, shown_yuv, total = [], [], 0
    for pkt in packets:
        dy, du, dv, drecon = dec.decode_tu(pkt.tu)
        if pkt.recon is not None:
            for pl in range(3):
                assert np.array_equal(pkt.recon[pl], drecon[pl])
        assert (dy is not None) == (pkt.shown_disp_idx is not None)
        if dy is not None:
            displayed.append(dy)
            shown_yuv.append((dy, du, dv))
        total += len(pkt.tu)
    assert len(displayed) == len(frames)
    from svtav1_tpu.utils import aomdec

    aomdec.verify_tus([pkt.tu for pkt in packets], shown_yuv)  # libaom oracle
    psnrs = []
    for i, dy in enumerate(displayed):
        mse = ((dy.astype(float) - frames[i][0]) ** 2).mean()
        psnrs.append(10 * np.log10(255 ** 2 / max(mse, 1e-9)))
    return total, psnrs


def test_hierarchical_e2e_and_gain():
    frames = _clip(64, 48, 9)
    size_hier, psnr_hier = _run(frames, 64, 48, minigop=4)
    size_ld, psnr_ld = _run(frames, 64, 48, minigop=1)
    assert min(psnr_hier) > 30
    # hierarchical-B with future refs should not be larger than low-delay
    assert size_hier < 1.1 * size_ld


def test_flush_partial_minigop():
    frames = _clip(64, 48, 6, seed=3)  # key + 5 pending -> groups 4 + 1
    total, psnrs = _run(frames, 64, 48, minigop=4)
    assert len(psnrs) == 6 and min(psnrs) > 30
