"""Determinism invariants — the lp1-vs-lpN analog (Docs/CommonQuestions.md:139).

The reference promises identical output for any worker count. The TPU
build's parallel axes are the frame pipeline (host walk overlapping device
work) and all-intra frame batching; both must be bit-invisible: the same
clip encodes to the SAME bytes whichever path runs it.
"""
from __future__ import annotations

import numpy as np
import pytest

from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig
from tools.make_test_video import make_frames

W, H, N = 128, 128, 5


def _encode(cfg_kwargs, pipeline=True):
    frames = make_frames(W, H, N)
    enc = Encoder(EncoderConfig(width=W, height=H, qindex=120,
                                mode_decision="jax", **cfg_kwargs))
    if not pipeline:
        enc._pipeline_ok = False
    tus = []
    for f in frames:
        tus += [p.tu for p in enc.send_frame(*f)]
    tus += [p.tu for p in enc.flush()]
    return tus


def test_pipeline_invariant_inter():
    """Pipelined (overlapped) vs synchronous inter path: identical TUs."""
    a = _encode(dict(keyint=N, minigop=4), pipeline=True)
    b = _encode(dict(keyint=N, minigop=4), pipeline=False)
    assert len(a) == len(b)
    for i, (x, y) in enumerate(zip(a, b)):
        assert x == y, f"TU {i} differs between pipelined and sync paths"


def test_batch_invariant_intra():
    """intra_batch=1 vs =4 produce identical all-intra streams."""
    a = _encode(dict(keyint=1, intra_batch=1))
    b = _encode(dict(keyint=1, intra_batch=4))
    assert len(a) == len(b)
    for i, (x, y) in enumerate(zip(a, b)):
        assert x == y, f"TU {i} differs between batch sizes"
