"""Rate control + scene detection tests (rc_process.c / pd_process.c analogs)."""
import numpy as np

from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig
from svtav1_tpu.pipeline.rc import CbrController, SceneDetector


def test_cbr_controller_converges():
    rc = CbrController(target_bps=100_000, fps=30, qindex_init=60)
    # simulate: bits halve for every +~40 qindex (rough monotone model)
    for _ in range(120):
        q = rc.frame_qindex(False, 0)
        bits = 60_000 * (0.5 ** (q / 40.0)) * 30 / 30  # per frame at 30fps
        rc.update(bits)
    q = rc.frame_qindex(False, 0)
    bits = 60_000 * (0.5 ** (q / 40.0))
    target = 100_000 / 30
    assert 0.4 * target < bits < 2.5 * target, (q, bits, target)


def test_scene_detector():
    det = SceneDetector()
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (64, 64))
    b = rng.integers(0, 255, (64, 64))
    assert not det.is_cut(a)  # first frame: no reference
    assert not det.is_cut(a + rng.integers(-3, 4, (64, 64)))  # small change
    assert det.is_cut(b)  # full scene change


def test_cbr_e2e_adapts_q():
    rng = np.random.default_rng(9)
    W = H = 64
    frames = []
    base = rng.integers(0, 255, (H + 32, W + 32), np.int32)
    for t in range(8):
        frames.append((base[t : t + H, t : t + W].astype(np.int32),
                       np.full((H // 2, W // 2), 120, np.int32),
                       np.full((H // 2, W // 2), 130, np.int32)))
    enc = Encoder(EncoderConfig(width=W, height=H, qindex=200, keyint=32,
                                rc_mode="cbr", target_kbps=200, fps=30))
    dec = Decoder()
    sizes = []
    for f in frames:
        for pkt in enc.send_frame(*f):
            dy, du, dv, drecon = dec.decode_tu(pkt.tu)
            if pkt.recon is not None:
                for pl in range(3):
                    assert np.array_equal(pkt.recon[pl], drecon[pl])
            sizes.append(len(pkt.tu))
    # target 200kbps/30fps = ~833 B/frame; starting at q200 the controller
    # must push q DOWN (bigger frames) rather than stay tiny
    assert enc.rc.q < 200


def test_scene_cut_inserts_key():
    rng = np.random.default_rng(1)
    W = H = 64
    a = rng.integers(0, 255, (H, W), np.int32)
    b = rng.integers(0, 255, (H, W), np.int32)  # unrelated scene
    u = np.full((H // 2, W // 2), 128, np.int32)
    enc = Encoder(EncoderConfig(width=W, height=H, qindex=120, keyint=1000, scene_cut=True))
    dec = Decoder()
    pkts = []
    for y in (a, a, b, b):
        pkts += enc.send_frame(y, u, u)
    pkts += enc.flush()
    # frame 2 (scene change) must be coded as a key frame: decode must not
    # require refs and the TU is key-sized (largest among inter frames)
    for pkt in pkts:
        dy, du, dv, drecon = dec.decode_tu(pkt.tu)
        if pkt.recon is not None:
            for pl in range(3):
                assert np.array_equal(pkt.recon[pl], drecon[pl])
    sizes = [len(p.tu) for p in pkts if p.disp_idx is not None]
    assert sizes[2] > 3 * sizes[1], sizes  # key at the cut vs cheap inter
