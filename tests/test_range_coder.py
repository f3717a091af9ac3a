"""Range coder roundtrip + adaptation tests (model: reference test/BitstreamWriterTest.cc)."""
import numpy as np
import pytest

from svtav1_tpu.entropy.range_coder import RangeDecoder, RangeEncoder, update_cdf


def random_icdf(rng, nsyms):
    """Random valid inverse CDF: strictly decreasing Q15 values then 0."""
    cuts = np.sort(rng.choice(np.arange(1, 32768), size=nsyms - 1, replace=False))
    icdf = (32768 - cuts).astype(np.int32)  # strictly decreasing
    return np.concatenate([icdf, [0, 0]]).astype(np.int32)


@pytest.mark.parametrize("nsyms", [2, 3, 4, 8, 13, 16])
def test_roundtrip_static_cdf(nsyms):
    rng = np.random.default_rng(nsyms)
    icdf = random_icdf(rng, nsyms)
    syms = rng.integers(0, nsyms, size=2000)
    enc = RangeEncoder()
    for s in syms:
        enc.encode_symbol_n(int(s), icdf, nsyms)
    data = enc.done()
    dec = RangeDecoder(data)
    out = [dec.decode_symbol_n(icdf, nsyms) for _ in syms]
    assert np.array_equal(out, syms)


def test_roundtrip_adaptive():
    rng = np.random.default_rng(0)
    nsyms = 5
    icdf_e = random_icdf(rng, nsyms)
    icdf_d = icdf_e.copy()
    syms = rng.integers(0, nsyms, size=3000)
    enc = RangeEncoder()
    for s in syms:
        enc.encode_symbol_n(int(s), icdf_e, nsyms)
        update_cdf(icdf_e, int(s), nsyms)
    data = enc.done()
    dec = RangeDecoder(data)
    for s in syms:
        got = dec.decode_symbol_n(icdf_d, nsyms)
        assert got == s
        update_cdf(icdf_d, got, nsyms)
    assert np.array_equal(icdf_e, icdf_d)


def test_roundtrip_bools_and_literals():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=500)
    lits = rng.integers(0, 255, size=100)
    enc = RangeEncoder()
    for b in bits:
        enc.encode_bool_q15(int(b), 11000)
    for v in lits:
        enc.encode_literal(int(v), 8)
    data = enc.done()
    dec = RangeDecoder(data)
    for b in bits:
        assert dec.decode_bool_q15(11000) == b
    for v in lits:
        assert dec.decode_literal(8) == v


def test_extreme_probabilities():
    """Heavily skewed CDFs must still roundtrip (EC_MIN_PROB floor)."""
    icdf = np.array([32767, 32766, 32765, 0, 0], np.int32)  # p(3) huge
    enc = RangeEncoder()
    seq = [3] * 1000 + [0, 1, 2] + [3] * 1000
    for s in seq:
        enc.encode_symbol_n(s, icdf, 4)
    data = enc.done()
    dec = RangeDecoder(data)
    assert [dec.decode_symbol_n(icdf, 4) for _ in seq] == seq

    icdf2 = np.array([1, 0, 0], np.int32)  # p(0) ~ 1
    enc = RangeEncoder()
    seq2 = [0] * 5000 + [1] + [0] * 100
    for s in seq2:
        enc.encode_symbol_n(s, icdf2, 2)
    data = enc.done()
    # near-deterministic stream must compress very well
    assert len(data) < 220
    dec = RangeDecoder(data)
    assert [dec.decode_symbol_n(icdf2, 2) for _ in seq2] == seq2


def test_compression_sanity():
    """~H(p) bits for iid symbols from the CDF's own distribution."""
    rng = np.random.default_rng(2)
    p = np.array([0.5, 0.25, 0.125, 0.125])
    cdf = np.cumsum(p) * 32768
    icdf = np.concatenate([(32768 - cdf[:-1]).astype(np.int32), [0, 0]])
    syms = rng.choice(4, p=p, size=8000)
    enc = RangeEncoder()
    for s in syms:
        enc.encode_symbol_n(int(s), icdf, 4)
    data = enc.done()
    entropy_bits = 8000 * 1.75
    assert len(data) * 8 < entropy_bits * 1.1


def test_default_cdf_tables_loaded():
    from svtav1_tpu.constants import cdf as cdfmod

    tables = cdfmod.load_default_cdfs()
    assert "svt_aom_default_kf_y_mode_cdf" in tables
    kf = tables["svt_aom_default_kf_y_mode_cdf"]
    assert kf.shape == (5, 5, 14)
    # entries decrease to 0 (icdf form), counter 0
    row = kf[0, 0]
    assert row[0] == 32768 - 15588 and row[12] == 0 and row[13] == 0
