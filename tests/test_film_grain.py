"""Film grain synthesis: params syntax, fgs tables, noise model, and
bit-exact grain application vs the libaom oracle (spec 5.9.30 / 7.18.3;
reference grainSynthesis.c + noise_model.c + entropy_coding.c:3054)."""
from __future__ import annotations

import numpy as np
import pytest

from svtav1_tpu.decode.decoder import Decoder
from svtav1_tpu.entropy.bitstream import BitReader, BitWriter
from svtav1_tpu.filters import film_grain as fg
from svtav1_tpu.pipeline.encoder import Encoder, EncoderConfig


def _roundtrip(p: fg.FilmGrainParams, is_inter: bool) -> fg.FilmGrainParams:
    w = BitWriter()
    fg.write_params(w, p, is_inter)
    w.byte_alignment()
    return fg.parse_params(BitReader(w.bytes()), is_inter)


def test_params_syntax_roundtrip():
    cases = [
        fg.synthetic_params(10),
        fg.synthetic_params(50, seed=0x1234),
        fg.FilmGrainParams(grain_seed=42, y_points=((0, 20), (128, 40), (255, 10)),
                           cb_points=((0, 8), (255, 12)), cr_points=((0, 6),),
                           ar_coeff_lag=2, ar_coeffs_y=tuple(range(-6, 6)),
                           ar_coeffs_cb=tuple(range(-6, 7)), ar_coeffs_cr=(0,) * 13,
                           ar_coeff_shift=7, grain_scale_shift=1, scaling_shift=9,
                           cb_mult=140, cb_luma_mult=180, cb_offset=300,
                           cr_mult=120, cr_luma_mult=200, cr_offset=200,
                           overlap_flag=0, clip_to_restricted_range=1),
        # luma-only grain: chroma point counts are not coded (4:2:0 rule)
        fg.FilmGrainParams(grain_seed=7, y_points=((0, 30), (255, 30)),
                           ar_coeff_lag=1, ar_coeffs_y=(1, 2, 3, 4)),
        fg.FilmGrainParams(apply_grain=0),
    ]
    for p in cases:
        for is_inter in (False, True):
            q = _roundtrip(p, is_inter)
            if not p.apply_grain:
                assert not q.apply_grain
                continue
            assert q == p, (p, q)


def test_params_update_grain_ref():
    p = fg.FilmGrainParams(grain_seed=99, update_grain=0, film_grain_params_ref_idx=5)
    q = _roundtrip(p, is_inter=True)
    assert q.update_grain == 0 and q.film_grain_params_ref_idx == 5
    assert q.grain_seed == 99


def test_fgs_table_roundtrip(tmp_path):
    segs = [(0, 30, fg.synthetic_params(14)),
            (30, 9999999, fg.FilmGrainParams(
                grain_seed=10956, y_points=((0, 5), (98, 4), (255, 5)),
                ar_coeff_lag=0, scaling_shift=8))]
    path = tmp_path / "t.tbl"
    fg.save_fgs_table(str(path), segs)
    back = fg.load_fgs_table(str(path))
    assert len(back) == 2
    for (s0, e0, p0), (s1, e1, p1) in zip(segs, back):
        assert (s0, e0) == (s1, e1)
        assert p1 == p0
    assert fg.select_params(back, 10) == segs[0][2]
    assert fg.select_params(back, 31) == segs[1][2]


def test_synthesis_shapes_and_determinism():
    p = fg.synthetic_params(12)
    n1 = fg.synthesize_noise(p, 96, 64, 8)
    n2 = fg.synthesize_noise(p, 96, 64, 8)
    assert n1[0].shape == (64, 96) and n1[1].shape == (32, 48)
    for a, b in zip(n1, n2):
        assert np.array_equal(a, b)
    assert np.abs(n1[0]).max() > 0  # grain is actually non-zero
    # different seed -> different pattern
    n3 = fg.synthesize_noise(fg.synthetic_params(12, seed=1), 96, 64, 8)
    assert not np.array_equal(n1[0], n3[0])


def test_estimator_on_noisy_source():
    rng = np.random.default_rng(3)
    h, w = 128, 128
    base = np.full((h, w), 120.0)
    noisy = np.clip(base + rng.normal(0, 6.0, (h, w)), 0, 255).astype(np.int32)
    u = np.full((h // 2, w // 2), 100, np.int32)
    v = np.full((h // 2, w // 2), 140, np.int32)
    p = fg.estimate_params((noisy, u, v), bd=8)
    assert p is not None and p.y_points
    assert max(s for _, s in p.y_points) > 0
    # clean source -> no grain
    clean = base.astype(np.int32)
    assert fg.estimate_params((clean, u, v), bd=8) is None


def _clip(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(n):
        y = (64 + 60 * np.sin(xx / 9.0 + t * 0.4) + 50 * np.cos(yy / 7.0)
             + rng.normal(0, 2.0, (h, w))).clip(0, 255).astype(np.int32)
        u = (96 + 30 * np.sin((xx[::2, ::2] + yy[::2, ::2]) / 11.0 + t * 0.2)).astype(np.int32)
        v = (160 - 30 * np.cos(xx[::2, ::2] / 13.0 - t * 0.3)).astype(np.int32)
        frames.append((y, u, v))
    return frames


@pytest.mark.slow
def test_grain_e2e_vs_libaom():
    """Grain-applied display output must match libaom bit-exactly — the
    independent conformance oracle for template generation, overlap
    blending, and the scaling LUT path."""
    from svtav1_tpu.utils import aomdec

    w = h = 64
    frames = _clip(4, w, h)
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=100, keyint=2,
                                film_grain=12))
    pkts = []
    for y, u, v in frames:
        pkts += enc.send_frame(y, u, v)
    pkts += enc.flush()
    tus = [p.tu for p in pkts]
    dec = Decoder()
    shown = []
    raw_recons = []
    for tu in tus:
        dy, du, dv, recon = dec.decode_tu(tu)
        if dy is not None:
            shown.append((dy, du, dv))
        if recon is not None:
            raw_recons.append(recon)
    assert len(shown) == len(frames)
    # grain actually changes the output vs the clean recon
    assert any(not np.array_equal(s[0], r[0][:h, :w])
               for s, r in zip(shown, raw_recons))
    checked = aomdec.verify_tus(tus, shown)
    if checked:
        assert checked == len(frames)


@pytest.mark.slow
def test_grain_e2e_10bit():
    from svtav1_tpu.utils import aomdec

    w = h = 64
    frames = [(y.astype(np.int64) * 4, u * 4, v * 4) for y, u, v in _clip(2, w, h)]
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=100, bd=10,
                                film_grain=10))
    pkts = []
    for y, u, v in frames:
        pkts += enc.send_frame(y, u, v)
    pkts += enc.flush()
    tus = [p.tu for p in pkts]
    dec = Decoder()
    shown = []
    for tu in tus:
        dy, du, dv, _ = dec.decode_tu(tu)
        if dy is not None:
            shown.append((dy, du, dv))
    assert len(shown) == len(frames)
    aomdec.verify_tus(tus, shown)


@pytest.mark.slow
def test_grain_from_fgs_table(tmp_path):
    from svtav1_tpu.utils import aomdec

    w = h = 64
    path = tmp_path / "grain.tbl"
    fg.save_fgs_table(str(path), [(0, 9999999, fg.FilmGrainParams(
        grain_seed=10956, y_points=((0, 24), (128, 32), (255, 24)),
        cb_points=((0, 10), (255, 10)), cr_points=((0, 10), (255, 10)),
        ar_coeff_lag=1, ar_coeffs_y=(12, 24, -8, 30),
        ar_coeffs_cb=(6, 12, -4, 15, 20), ar_coeffs_cr=(6, 12, -4, 15, -20)))])
    frames = _clip(2, w, h)
    enc = Encoder(EncoderConfig(width=w, height=h, qindex=100,
                                film_grain_table=str(path)))
    pkts = []
    for y, u, v in frames:
        pkts += enc.send_frame(y, u, v)
    pkts += enc.flush()
    tus = [p.tu for p in pkts]
    dec = Decoder()
    shown = []
    for tu in tus:
        dy, du, dv, _ = dec.decode_tu(tu)
        if dy is not None:
            shown.append((dy, du, dv))
    aomdec.verify_tus(tus, shown)
