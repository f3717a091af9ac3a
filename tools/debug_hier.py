"""Localize the hierarchical-B device-inter conformance mismatch."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_inter_device import moving_clip  # noqa: E402


def run(w, h, n, minigop, keyint, dlf, cdef, step=(0, 1), qindex=110):
    frames = moving_clip(w, h, n, step=step)
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=qindex, keyint=keyint,
                                minigop=minigop, mode_decision="jax",
                                enable_dlf=dlf, enable_cdef=cdef))
    dec = Decoder()
    pkts = []
    for y, u, v in frames:
        pkts += enc.send_frame(y, u, v)
    pkts += enc.flush()
    bad = []
    for i, pkt in enumerate(pkts):
        dy, du, dv, drecon = dec.decode_tu(pkt.tu)
        if pkt.recon is None:
            continue
        for pl in range(3):
            if not np.array_equal(pkt.recon[pl], drecon[pl]):
                diff = pkt.recon[pl] != drecon[pl]
                rr, cc = np.nonzero(diff)
                bad.append((i, pl, rr.min(), cc.min(), int(diff.sum()),
                            rr.max(), cc.max()))
    return pkts, bad


if __name__ == "__main__":
    cfgs = [
        ("mg2-nofilt", dict(w=64, h=64, n=3, minigop=2, keyint=3, dlf=False, cdef=False)),
        ("mg2-filt", dict(w=64, h=64, n=3, minigop=2, keyint=3, dlf=True, cdef=True)),
    ]
    for name, kw in cfgs:
        pkts, bad = run(**kw)
        print(f"{name}: {'OK' if not bad else bad}")
