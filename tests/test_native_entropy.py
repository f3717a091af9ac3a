"""Native C entropy coder parity with the Python reference (byte-exact)."""
import numpy as np
import pytest

from svtav1_tpu.constants.cdf import FrameContext
from svtav1_tpu.entropy import native
from svtav1_tpu.entropy.range_coder import RangeDecoder, RangeEncoder, update_cdf

pytestmark = pytest.mark.skipif(not native.available(), reason="no C compiler")


def test_symbol_stream_parity():
    rng = np.random.default_rng(0)
    fc_py = FrameContext(100)
    fc_c = FrameContext(100)
    py = RangeEncoder()
    ce = native.NativeRangeEncoder()
    for i in range(2000):
        t = i % 3
        if t == 0:
            n, cdf_py, cdf_c = 10, fc_py["partition"][3], fc_c["partition"][3]
        elif t == 1:
            n, cdf_py, cdf_c = 2, fc_py["skip"][1], fc_c["skip"][1]
        else:
            n, cdf_py, cdf_c = 13, fc_py["kf_y_mode"][0][0], fc_c["kf_y_mode"][0][0]
        s = int(rng.integers(0, n))
        py.encode_symbol_n(s, cdf_py, n)
        update_cdf(cdf_py, s, n)
        ce.encode_symbol_update(s, cdf_c, n, True)
        lit = int(rng.integers(0, 256))
        py.encode_literal(lit, 8)
        ce.encode_literal(lit, 8)
    b_py, b_c = py.done(), ce.done()
    assert b_py == b_c
    assert all(np.array_equal(fc_py.tables[k], fc_c.tables[k]) for k in fc_py.tables)


def test_txb_body_parity():
    from svtav1_tpu.codec import txb as txb_mod
    from svtav1_tpu.constants.av1 import TxSize, TxType

    rng = np.random.default_rng(1)
    for tx_size, tx_type in [(TxSize.TX_32X32, TxType.DCT_DCT), (TxSize.TX_16X16, TxType.ADST_ADST),
                             (TxSize.TX_8X8, TxType.DCT_DCT), (TxSize.TX_4X4, TxType.IDTX),
                             (TxSize.TX_64X64, TxType.DCT_DCT), (TxSize.TX_16X8, TxType.H_DCT),
                             (TxSize.TX_4X16, TxType.V_ADST)]:
        adj = txb_mod.adjusted_tx_size(tx_size)
        from svtav1_tpu.constants.av1 import TX_H, TX_W

        h, w = int(TX_H[adj]), int(TX_W[adj])
        fc_py, fc_c = FrameContext(80), FrameContext(80)
        py, ce = RangeEncoder(), native.NativeRangeEncoder()
        for rep in range(8):
            # sparse-ish coefficients with occasional huge values (golomb path)
            coeffs = (rng.integers(-4, 5, (h, w)) * (rng.random((h, w)) < 0.3)).astype(np.int32)
            coeffs[0, 0] = int(rng.integers(-300, 300))
            if not np.any(coeffs):
                coeffs[0, 0] = 5
            cul1 = txb_mod.write_coeffs_txb_body(py, fc_py, coeffs, int(tx_size), int(tx_type), 0, rep % 3, True)
            cul2 = txb_mod.write_coeffs_txb_body(ce, fc_c, coeffs, int(tx_size), int(tx_type), 0, rep % 3, True)
            assert cul1 == cul2, (tx_size, tx_type, rep)
        assert py.done() == ce.done(), (tx_size, tx_type)
        assert all(np.array_equal(fc_py.tables[k], fc_c.tables[k]) for k in fc_py.tables)


def test_native_stream_decodable():
    fc = FrameContext(60)
    fc_d = FrameContext(60)
    ce = native.NativeRangeEncoder()
    rng = np.random.default_rng(2)
    syms = [(int(rng.integers(0, 10))) for _ in range(300)]
    for s in syms:
        ce.encode_symbol_update(s, fc["partition"][5], 10, True)
    data = ce.done()
    dec = RangeDecoder(data)
    for s in syms:
        got = dec.decode_symbol_n(fc_d["partition"][5], 10)
        update_cdf(fc_d["partition"][5], got, 10)
        assert got == s


def test_tile_walk_parity():
    """C tile walker is byte-exact with the Python TileCodec walk."""
    import numpy as np

    from svtav1_tpu.codec.tile_codec import FrameParams, TileCodec
    from svtav1_tpu.pipeline import intra_md
    from svtav1_tpu.pipeline.encoder import pad_to_aligned

    rng = np.random.default_rng(7)
    w, h = 96, 72  # forces boundary partitions + strips
    p = FrameParams(width=w, height=h, qindex=90)
    aw, ah = p.aligned_width, p.aligned_height
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 60 * np.sin(xx / 9.0) + 50 * ((xx + yy) % 23 < 10) + rng.normal(0, 4, (h, w))).clip(0, 255)
    src = [pad_to_aligned(y.astype(np.int32), aw, ah),
           pad_to_aligned(np.full((h // 2, w // 2), 100, np.int32), aw >> 1, ah >> 1),
           pad_to_aligned(np.full((h // 2, w // 2), 160, np.int32), aw >> 1, ah >> 1)]
    plan, recon = intra_md.encode_intra_frame(src, p)
    from svtav1_tpu.constants.cdf import FrameContext

    tc1 = TileCodec(p, FrameContext(p.qindex))
    b_native = tc1.encode(plan, use_native=True)
    tc2 = TileCodec(p, FrameContext(p.qindex))
    b_python = tc2.encode(plan, use_native=False)
    assert b_native == b_python


def test_tile_walk_parity_inter():
    """C tile walker is byte-exact with the Python walk on INTER frames:
    exercises the C MVP stack, single-ref tree, mode flags, DRL and NMV
    coding against codec/mvp + codec/mv (NEWMV, NEAREST/NEAR, GLOBALMV,
    intra-in-inter blocks)."""
    import numpy as np

    from svtav1_tpu.codec.tile_codec import FrameParams, TileCodec
    from svtav1_tpu.constants.cdf import FrameContext
    from svtav1_tpu.constants.av1 import RefFrame
    from svtav1_tpu.pipeline import inter_md
    from svtav1_tpu.pipeline.encoder import pad_to_aligned

    rng = np.random.default_rng(11)
    w, h = 96, 72
    base = rng.normal(0, 55, ((h + 32) // 4 + 2, (w + 32) // 4 + 2))
    base = np.kron(base, np.ones((4, 4)))[: h + 32, : w + 32]
    base = (128 + base + rng.normal(0, 4, (h + 32, w + 32))).clip(0, 255).astype(np.int32)

    def planes(dy, dx):
        y = base[8 + dy : 8 + dy + h, 8 + dx : 8 + dx + w]
        u = (base[8 + dy : 8 + dy + h : 2, 8 + dx : 8 + dx + w : 2] // 2 + 64)
        v = (base[8 + dy : 8 + dy + h : 2, 8 + dx : 8 + dx + w : 2] // 3 + 80)
        return y, u, v

    p = FrameParams(width=w, height=h, qindex=90, frame_is_intra=False)
    aw, ah = p.aligned_width, p.aligned_height

    def padded(pl):
        y, u, v = pl
        return [pad_to_aligned(y.astype(np.int32), aw, ah),
                pad_to_aligned(u.astype(np.int32), aw >> 1, ah >> 1),
                pad_to_aligned(v.astype(np.int32), aw >> 1, ah >> 1)]

    ref = padded(planes(0, 0))
    src = padded(planes(2, 3))
    plan, recon = inter_md.encode_inter_frame(src, p, {int(RefFrame.LAST_FRAME): ref})
    modes = {d.y_mode for d in plan.blocks.values() if d.is_inter}
    assert modes, "plan has no inter blocks"

    tc1 = TileCodec(p, FrameContext(p.qindex))
    b_native = tc1.encode(plan, use_native=True)
    tc2 = TileCodec(p, FrameContext(p.qindex))
    b_python = tc2.encode(plan, use_native=False)
    assert b_native == b_python
