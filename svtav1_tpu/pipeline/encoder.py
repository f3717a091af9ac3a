"""Top-level encoder: intra + inter (low-delay P or hierarchical-B), CQP
with per-layer qindex offsets.

API shape mirrors the reference's library API (EbSvtAv1Enc.h:966-1076
svt_av1_enc_send_picture / _get_packet): `send_frame` buffers display-order
frames and returns the packets that become ready (coding order), `flush`
drains the tail. GOP/DPB logic is the simplified analog of pd_process.c
(set_mini_gop_structure / av1_generate_rps_info): dyadic mini-GoPs, hidden
base frames, show_existing_frame at display time.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..codec.tile_codec import FrameParams, TileCodec
from ..constants.av1 import RefFrame
from ..constants.cdf import FrameContext
from ..entropy.bitstream import (FrameConfig, SequenceConfig, frame_obu, sequence_header_obu,
                                 show_existing_frame_obu, temporal_delimiter_obu)
from . import gop, intra_md


@dataclass
class EncoderConfig:
    width: int
    height: int
    qindex: int = 120  # base_q_idx (CQP, layer offsets applied)
    bd: int = 8
    mode_decision: str = "numpy"  # "numpy" (reference) or "jax" (device path)
    tile_cols_log2: int = 0
    tile_rows_log2: int = 0
    keyint: int = 1  # key frame every N frames (1 = all-intra)
    minigop: int = 1  # 1 = low-delay; 2/4/8 = hierarchical-B mini-GoPs
    enable_dlf: bool = True  # in-loop deblocking (by-q levels)
    enable_cdef: bool = True  # CDEF (frame-wide searched strength set)
    enable_filter_intra: bool = False  # recursive filter-intra (numpy MD path)
    rc_mode: str = "cqp"  # "cqp" | "cbr" | "crf" (TPL r0-based q assignment)
    # loop restoration (Wiener + self-guided): per-unit search after CDEF
    # (restoration_pick.c analog). Runs host-side in-loop filters; the
    # entropy walk (incl. LR unit syntax) uses the native C walker.
    enable_restoration: bool = False
    # batched device RDOQ in the commit pass (svt_av1_optimize_b analog)
    enable_rdoq: bool = True
    target_kbps: float = 0.0  # CBR target (kbit/s)
    fps: float = 30.0
    scene_cut: bool = False  # adaptive key frames on scene changes
    lookahead: int = 16  # CRF: TPL sliding-window size (frames buffered)
    # all-intra frame batching through the device pipeline (keyint==1, jax
    # MD, CQP only): amortizes wavefront latency + host<->device transfers
    intra_batch: int = 1
    # CDF lifecycle: seed each inter frame's symbol CDFs from the primary
    # ref's saved frame context instead of defaults, and store the adapted
    # end-of-frame CDFs with every refreshed DPB slot (the reference seeds
    # from the primary ref: md_config_process.c:676-695; spec primary_ref_frame)
    cdf_inheritance: bool = True
    # MCTF: motion-compensated temporal filtering of scheduled key frames
    # (ALT-REF filter analog, temporal_filtering.c:2752) — filters the
    # SOURCE with +-N neighbors before encoding; needs keyint > 1
    enable_tf: bool = False
    # max reference frames per inter frame (reference uses up to 7;
    # 3 = LAST + GOLDEN (last key / mini-GoP anchor) + ALTREF (future))
    n_refs: int = 3
    # compound (BIDIR average) prediction for hierarchical-B frames with a
    # future ALTREF (reference_select syntax + NEW_NEWMV candidates)
    enable_compound: bool = True
    # speed/quality preset (the enc_mode_config.c ladder at honest scale):
    # maps to candidate counts, subpel lattice, tx search and CDEF ladder
    preset: str = "medium"  # "fast" | "medium" | "slow"
    # global motion (TRANSLATION): host pyramid estimation vs the LAST ref's
    # source + a gm-MV GLOBALMV lane in the device decide + spec
    # global_motion_params coding (codec/gm.py; global_me.c analog).
    # Active on the jax single-tile inter path.
    enable_gm: bool = True
    # HDR metadata attached to key-frame TUs (metadata_handle.c analog):
    # content_light = (max_cll, max_fall); mastering_display =
    # (((rx,ry),(gx,gy),(bx,by)), (wx,wy), max_lum, min_lum); t35 = bytes
    content_light: tuple | None = None
    mastering_display: tuple | None = None
    itut_t35: bytes | None = None
    # two-pass: pass-1 stats records (pipeline/firstpass.read_stats) for
    # complexity-weighted VBR allocation (FIRSTPASS_STATS analog)
    stats_in: list | None = None
    # film grain synthesis (spec 5.9.30/7.18.3; grainSynthesis.c +
    # noise_model.c analogs): 0 = off; 1..50 = estimate the source's noise
    # (flat-block model) scaled by the knob, falling back to a synthetic
    # table on clean sources (SvtAv1EncApp --film-grain)
    film_grain: int = 0
    # explicit aomenc "filmgrn1" table (the Mod's --fgs-table): overrides
    # the estimator; segments select per-frame params by display index
    film_grain_table: str | None = None


# preset -> speed features (monotonic speed/quality ladder; the reference
# spreads this over ~hundreds of levels in enc_mode_config.c:684-8339)
PRESETS = {
    "fast": dict(sf_nmodes_inter=4, sf_nmodes_key=7, sf_tx_ntypes=1,
                 sf_fast_subpel=1, sf_cdef_fast=1, sf_dlf_search=0, rdoq=False),
    # medium: 25-pt exhaustive subpel (measured RD-neutral vs the 49-pt
    # two-step on the bench clip — exhaustive +-0.5px beats sequential)
    "medium": dict(sf_nmodes_inter=7, sf_nmodes_key=13, sf_tx_ntypes=4,
                   sf_fast_subpel=1, sf_cdef_fast=0, sf_dlf_search=1, rdoq=True),
    "slow": dict(sf_nmodes_inter=13, sf_nmodes_key=13, sf_tx_ntypes=4,
                 sf_fast_subpel=0, sf_cdef_fast=0, sf_dlf_search=1, rdoq=True),
}


@dataclass
class Packet:
    """One temporal unit out of the encoder (coding order)."""

    tu: bytes
    disp_idx: int | None = None  # display idx of the frame coded in this TU
    recon: list | None = None  # encoder recon (aligned planes; None for SE)
    shown_disp_idx: int | None = None  # display idx output by this TU


def mi_from_plan(plan, params: FrameParams):
    """Build the frame-wide mi grid from MD decisions (loop filter input)."""
    from ..codec.mvp import MiState

    plan.materialize()
    mi = MiState(params.mi_rows, params.mi_cols)
    for (r, c, bsize), d in plan.blocks.items():
        mi.set_block(r, c, bsize, d.y_mode, d.ref_frame, int(d.ref_frame1),
                     (int(d.mv[0]), int(d.mv[1])),
                     mv1=(int(d.mv1[0]), int(d.mv1[1])), skip=d.skip)
    return mi


def replicate_display_edges(planes: list, width: int, height: int) -> None:
    """Overwrite each plane's mi-alignment padding with replicated display-edge
    pixels, in place. Run after in-loop filters, before a frame enters the DPB.

    Spec 7.11.3.4 clamps MC reference coordinates at the *display* dims
    (RefUpscaledWidth-1 / FrameHeight-1); the reference achieves the same by
    re-padding the recon from the display edge before it is used as a
    reference (pic_analysis_process.c
    svt_aom_pad_picture_to_multiple_of_min_blk_size_dimensions). Without this
    MC would read decoded alignment padding for non-multiple-of-8 dims."""
    dims = [(height, width), (height >> 1, width >> 1), (height >> 1, width >> 1)]
    for plane, (h, w) in zip(planes, dims):
        if w < plane.shape[1]:
            plane[:, w:] = plane[:, w - 1 : w]
        if h < plane.shape[0]:
            plane[h:, :] = plane[h - 1 : h, :]


def pad_to_aligned(plane: np.ndarray, aw: int, ah: int) -> np.ndarray:
    """Replicate-pad a plane to aligned dims (reference
    pic_analysis_process.c pad_picture_to_multiple_of_min_blk_size)."""
    h, w = plane.shape
    out = np.zeros((ah, aw), np.int32)
    out[:h, :w] = plane
    if w < aw:
        out[:h, w:] = plane[:, -1:]
    if h < ah:
        out[h:, :] = out[h - 1 : h, :]
    return out


class Encoder:
    def __init__(self, cfg: EncoderConfig):
        # 4:2:0 needs even dims; sources are padded to the mi-aligned size
        # (always a multiple of 8) and cropped at display per the spec
        assert cfg.width % 2 == 0 and cfg.height % 2 == 0, "4:2:0 requires even dims"
        assert cfg.minigop in (1, 2, 4, 8)  # dyadic mini-GoPs (5L max)
        assert cfg.preset in PRESETS, cfg.preset
        self.cfg = cfg
        self._sf = dict(PRESETS[cfg.preset])
        if not self._sf.pop("rdoq"):
            cfg.enable_rdoq = False
        self._grain_table = None
        if cfg.film_grain_table:
            from ..filters.film_grain import load_fgs_table

            self._grain_table = load_fgs_table(cfg.film_grain_table)
        self._grain_est = None  # noise-model result (estimated once)
        self._grain_src0 = None  # first source frame held for estimation
        self.seq = SequenceConfig(width=cfg.width, height=cfg.height, bd=cfg.bd,
                                  enable_cdef=cfg.enable_cdef,
                                  enable_restoration=cfg.enable_restoration,
                                  enable_filter_intra=cfg.enable_filter_intra,
                                  film_grain_params_present=bool(
                                      cfg.film_grain or cfg.film_grain_table))
        if cfg.enable_filter_intra and cfg.mode_decision == "jax":
            raise ValueError("filter-intra uses the numpy mode-decision path")
        if (cfg.tile_cols_log2 or cfg.tile_rows_log2) and cfg.mode_decision != "jax":
            raise ValueError("multi-tile encoding requires the jax mode-decision backend")
        if (cfg.tile_cols_log2 or cfg.tile_rows_log2) and (cfg.keyint != 1):
            raise ValueError("round-1 profile: inter frames are single-tile")
        self.next_disp = 0  # next display index expected from the caller
        self.anchor = -1  # display idx of the last coded anchor
        self.pending: list = []  # buffered (disp_idx, src_planes)
        self._ibatch: list = []  # all-intra device batch queue
        self._batching = (cfg.intra_batch > 1 and cfg.keyint <= 1
                          and cfg.mode_decision == "jax"
                          and cfg.rc_mode == "cqp" and not cfg.scene_cut
                          and not cfg.enable_restoration)
        self.dpb: dict = {}  # display idx -> {planes, order_hint, slot}
        self._cdf_slots: list = [None] * 8  # per-slot saved frame contexts
        # global motion: per-slot saved gm params (PrevGmParams source) +
        # source-luma cache for the translation estimation
        self._gm_slots: list = [((0, 0),) * 8] * 8
        self._gm_src: dict = {}
        self._use_gm = bool(cfg.enable_gm and cfg.mode_decision == "jax"
                            and not (cfg.tile_cols_log2 or cfg.tile_rows_log2)
                            and cfg.keyint != 1)
        self._wrote_seq = False
        from . import rc

        self.rc = None
        if cfg.rc_mode == "cbr":
            assert cfg.target_kbps > 0, "cbr needs target_kbps"
            self.rc = rc.CbrController(cfg.target_kbps * 1000.0, cfg.fps, cfg.qindex)
        elif cfg.rc_mode == "vbr":
            assert cfg.target_kbps > 0, "vbr needs target_kbps"
            if cfg.stats_in:
                from .firstpass import TwoPassVbrController

                self.rc = TwoPassVbrController(cfg.stats_in,
                                               cfg.target_kbps * 1000.0, cfg.fps,
                                               cfg.qindex, keyint=cfg.keyint,
                                               minigop=cfg.minigop, bd=cfg.bd)
            else:
                self.rc = rc.VbrController(cfg.target_kbps * 1000.0, cfg.fps,
                                           cfg.qindex, keyint=cfg.keyint,
                                           minigop=cfg.minigop, bd=cfg.bd)
            self.rc.set_frame_geometry(cfg.width, cfg.height)
        self.scene = rc.SceneDetector() if cfg.scene_cut else None
        # CRF: TPL lookahead queue of (disp, src, is_key) + anchor source for
        # window chaining (rc_process.c crf_qindex_calc / src_ops TPL group)
        self._crf = cfg.rc_mode == "crf"
        self._crf_pending: list = []
        self._anchor_src = None
        # MCTF lookahead queue (scheduled keys filtered with +-N neighbors)
        self._tf = cfg.enable_tf and (cfg.keyint > 1 or cfg.minigop > 1)
        self._tf_q: list = []
        self._tf_hist: list = []
        self._tf_emitted = 0
        self._golden_disp = None  # last key's display idx (GOLDEN ref)
        self._slot_occupant: dict = {}  # DPB slot -> display idx
        # frame pipeline: FIFO of in-flight work; at most ONE frame's device
        # programs outstanding. Host entropy walk / OBU packing of frame N
        # runs while the device executes frame N+1's decide (the throughput
        # half of the reference SRM's job — stage overlap across pictures)
        self._pipe: list = []
        self._pipeline_ok = (cfg.mode_decision == "jax"
                             and not cfg.enable_restoration
                             and cfg.tile_cols_log2 == 0
                             and cfg.tile_rows_log2 == 0)

    # ------------------------------------------------------------------- API

    TF_PAST, TF_FUT = 2, 3  # MCTF window (reference derive_tf_window_params)

    def _grain_for(self, disp_idx: int):
        """Film grain params for one display frame (None when grain is off).

        Table segments select by display index; otherwise the flat-block
        noise model runs once on the first source frame (refreshed never —
        grain character is a sequence property), with the synthetic 1..50
        table as the clean-source fallback. Seeds advance per frame so the
        grain pattern decorrelates temporally (the reference re-seeds per
        picture the same way, pic_analysis_process.c grain path)."""
        cfg = self.cfg
        if not (cfg.film_grain or self._grain_table):
            return None
        from dataclasses import replace

        from ..filters import film_grain as fg

        if self._grain_table is not None:
            p = fg.select_params(self._grain_table, disp_idx)
            if p is None or not p.apply_grain:
                return None
            return replace(p, update_grain=1,
                           grain_seed=(p.grain_seed + disp_idx * 3083) & 0xFFFF)
        if self._grain_est is None:
            est = None
            if self._grain_src0 is not None:
                est = fg.estimate_params(self._grain_src0, bd=cfg.bd,
                                         strength_scale=cfg.film_grain / 8.0)
            self._grain_est = est or fg.synthetic_params(cfg.film_grain)
            self._grain_src0 = None
        return replace(self._grain_est,
                       grain_seed=(7391 + disp_idx * 3083) & 0xFFFF)

    def send_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> list:
        """Feed one display-order frame; returns ready packets. With MCTF
        enabled, frames pass through a short lookahead queue so scheduled
        key frames can be filtered with future neighbors."""
        if (self.cfg.film_grain and self._grain_table is None
                and self._grain_est is None and self._grain_src0 is None):
            self._grain_src0 = (np.asarray(y), np.asarray(u), np.asarray(v))
        if not self._tf:
            return self._send_frame_inner(y, u, v)
        self._tf_q.append((np.asarray(y, np.int32), np.asarray(u, np.int32),
                           np.asarray(v, np.int32)))
        return self._tf_drain(final=False)

    def _tf_drain(self, final: bool) -> list:
        from ..ops import tf_jax

        cfg = self.cfg
        packets = []
        while self._tf_q:
            d = self._tf_emitted
            # filter key frames AND mini-GoP anchors (base pictures) — the
            # reference temporally filters all base pics, not just keys
            # (pd_process.c derive_tf_window_params / mctf_frame)
            is_sched_key = (d % cfg.keyint == 0
                            or (cfg.minigop > 1 and d % cfg.minigop == 0))
            head = self._tf_q[0]
            if is_sched_key:
                if not final and len(self._tf_q) < 1 + self.TF_FUT:
                    break
                neigh = list(self._tf_hist) + list(self._tf_q[1 : 1 + self.TF_FUT])
                if neigh:
                    h, w = head[0].shape
                    H64, W64 = -(-h // 64) * 64, -(-w // 64) * 64

                    def pad64(fr):
                        return [pad_to_aligned(fr[0], W64, H64),
                                pad_to_aligned(fr[1], W64 // 2, H64 // 2),
                                pad_to_aligned(fr[2], W64 // 2, H64 // 2)]

                    f = tf_jax.filter_frame(pad64(head), [pad64(x) for x in neigh],
                                            cfg.qindex, cfg.bd)
                    head = (f[0][:h, :w], f[1][: h // 2, : w // 2],
                            f[2][: h // 2, : w // 2])
            self._tf_hist.append(self._tf_q.pop(0))
            self._tf_hist = self._tf_hist[-self.TF_PAST:]
            self._tf_emitted += 1
            packets += self._send_frame_inner(*head)
        return packets

    def _send_frame_inner(self, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> list:
        cfg = self.cfg
        d = self.next_disp
        self.next_disp += 1
        src = self._pad(y, u, v)
        packets = []
        is_key = cfg.keyint <= 1 or (d % cfg.keyint == 0)
        if self.scene is not None and self.scene.is_cut(src[0]) and d > 0:
            is_key = True
        if self._batching:
            self._ibatch.append((d, src))
            if len(self._ibatch) >= cfg.intra_batch:
                packets = self._encode_intra_batch()
            return packets
        if self._crf:
            self._crf_pending.append((d, src, is_key))
            if len(self._crf_pending) >= max(cfg.lookahead, cfg.minigop + 1):
                packets = self._drain_crf(final=False)
            return packets
        if is_key:
            packets += self._drain_pending()
            packets += self._pipe_drain()
            packets.append(self._encode_one(d, src, True, True, 0, None, None))
            self.anchor = d
            return packets
        self.pending.append((d, src))
        if len(self.pending) == cfg.minigop:
            packets += self._code_minigop(self.pending)
            self.pending = []
        return packets

    def flush(self) -> list:
        packets = []
        if self._tf and self._tf_q:
            packets += self._tf_drain(final=True)
        if self._batching and self._ibatch:
            return packets + self._encode_intra_batch()
        if self._crf:
            return packets + self._drain_crf(final=True) + self._pipe_drain()
        return packets + self._drain_pending() + self._pipe_drain()

    def _encode_intra_batch(self) -> list:
        """Encode the queued all-intra frames through the batched device
        pipeline (decide+commit amortized over the batch), then finish each
        frame (filters, headers, entropy) in display order."""
        from ..codec.tile_codec import FrameParams
        from . import device_commit

        cfg = self.cfg
        batch, self._ibatch = self._ibatch, []
        qindex = self._frame_qindex(True, 0)
        p = FrameParams(width=cfg.width, height=cfg.height, qindex=qindex, bd=cfg.bd,
                        tile_cols_log2=cfg.tile_cols_log2, tile_rows_log2=cfg.tile_rows_log2,
                        frame_is_intra=True, enable_filter_intra=cfg.enable_filter_intra,
                        enable_rdoq=cfg.enable_rdoq, **self._sf)
        walk_fcs = [FrameContext(qindex) for _ in batch]
        outs = device_commit.encode_intra_frames(
            [src for _, src in batch], p,
            apply_filters=cfg.enable_dlf or cfg.enable_cdef,
            enable_dlf=cfg.enable_dlf, enable_cdef=cfg.enable_cdef,
            walk_fcs=walk_fcs)
        packets = []
        for (d, src), (plan, recon, filt, payloads), fc in zip(batch, outs, walk_fcs):
            packets.append(self._encode_one(d, src, True, True, 0, None, None,
                                            plan_recon=(plan, recon, payloads),
                                            filt=filt, walk_fc=fc))
            self.anchor = d
        return packets

    def encode_frame(self, y, u, v):
        """Synchronous helper for low-delay configs (minigop == 1):
        returns (tu_bytes, recon_planes) for this display frame."""
        assert self.cfg.minigop == 1 and not self._tf
        pkts = self.send_frame(y, u, v) + self._pipe_drain()
        assert len(pkts) == 1
        return pkts[0].tu, pkts[0].recon

    # ------------------------------------------------------------- scheduling

    def _tpl_r0(self, window_lumas: list) -> np.ndarray:
        """TPL dispenser+synthesizer over a luma window, following the
        coded prediction structure (dyadic mini-GoPs when minigop > 1 —
        the src_ops tpl_mc_flow decode-order walk; padded to 64-multiples
        for the SB-granular ME pyramid)."""
        from . import tpl as tpl_mod

        h, w = window_lumas[0].shape
        H, W = -(-h // 64) * 64, -(-w // 64) * 64
        padded = [pad_to_aligned(y, W, H) for y in window_lumas]
        stats = tpl_mod.tpl_window(padded, self.cfg.qindex, self.cfg.bd,
                                   minigop=self.cfg.minigop)
        return tpl_mod.synthesize(stats)

    def _drain_crf(self, final: bool) -> list:
        """Code buffered frames with TPL-derived per-frame qindex (the
        reference's TPL group + crf_qindex_calc flow: src_ops_process.c
        tpl_mc_flow, rc_process.c:782)."""
        from . import tpl as tpl_mod

        cfg = self.cfg
        la = max(cfg.lookahead, cfg.minigop + 1)
        hl = int(np.log2(max(cfg.minigop, 1)))
        packets = []
        while self._crf_pending and (final or len(self._crf_pending) >= la):
            pend = self._crf_pending
            if pend[0][2]:  # key frame: window starts at the key itself
                packets += self._pipe_drain()
                window = [s[0] for (_d, s, _k) in pend[:la]]
                r0s = self._tpl_r0(window)
                d, src, _ = pend.pop(0)
                q = tpl_mod.crf_qindex(cfg.qindex, float(r0s[0]), True, 0, hl, cfg.bd)
                packets.append(self._encode_one(d, src, True, True, 0, None, None,
                                                qindex_override=q))
                self.anchor = d
                self._anchor_src = src
                continue
            # frames until the next key bound this mini-GoP
            upto = next((i for i, e in enumerate(pend) if e[2]), len(pend))
            size = 1
            while size * 2 <= upto and size * 2 <= cfg.minigop:
                size *= 2
            if not final and upto >= len(pend) and upto < cfg.minigop:
                break  # wait for a full mini-GoP
            mg = pend[:size]
            wlen = min(la - 1, upto)
            window = [self._anchor_src[0]] + [s[0] for (_d, s, _k) in pend[:wlen]]
            r0s = self._tpl_r0(window)
            r0_by_disp = {pend[i][0]: float(r0s[i + 1]) for i in range(wlen)}
            packets += self._code_minigop([(d, s) for (d, s, _k) in mg],
                                          r0_by_disp=r0_by_disp)
            self._anchor_src = mg[-1][1]
            del self._crf_pending[:size]
        return packets

    def _drain_pending(self) -> list:
        packets = []
        while self.pending:
            size = 1
            while size * 2 <= len(self.pending) and size * 2 <= self.cfg.minigop:
                size *= 2
            packets += self._code_minigop(self.pending[:size])
            self.pending = self.pending[size:]
        return packets

    def _code_minigop(self, frames: list, r0_by_disp: dict | None = None) -> list:
        from . import tpl as tpl_mod

        srcs = {d: s for d, s in frames}
        base = self.anchor
        sched = gop.schedule_minigop(base, len(frames))
        hl = int(np.log2(max(self.cfg.minigop, 1)))
        # liveness-based DPB slot assignment over slots 0..6 (slot 7 is the
        # GOLDEN key): a slot is reusable when its occupant is neither a
        # ref of a not-yet-coded frame, nor awaiting show_existing, nor the
        # mini-GoP's outgoing anchor (pic_manager availability analog)
        needed_after = [set() for _ in sched]
        need: set = {frames[-1][0]}
        for i in range(len(sched) - 1, -1, -1):
            needed_after[i] = set(need)
            f = sched[i]
            need.update(x for x in (f.past_idx, f.future_idx) if x is not None)
            need.update(f.show_existing)
            if f.show is False:
                need.add(f.disp_idx)  # hidden frame awaits its display
        packets = []
        for i, f in enumerate(sched):
            if f.disp_idx not in needed_after[i] and f.show:
                slot = None  # shown now, referenced never: skip the refresh
            else:
                # the GOLDEN key always has slot 7 (outside this allocator),
                # so its copies in 0..6 are reusable; every other live ref
                # is in needed_after by construction
                keep = needed_after[i] - {self._golden_disp}
                slot = next((s for s in range(7)
                             if self._slot_occupant.get(s) is None
                             or self._slot_occupant[s] not in keep), None)
                if slot is None:
                    raise RuntimeError(
                        f"live reference set {sorted(keep)} exceeds the 7 "
                        "rotating DPB slots (scheduler kept too many frames "
                        "alive; dyadic minigop<=8 never does this)")
                self._slot_occupant[slot] = f.disp_idx
            q = None
            if r0_by_disp is not None:
                q = tpl_mod.crf_qindex(self.cfg.qindex, r0_by_disp.get(f.disp_idx, 1.0),
                                       False, f.layer, hl, self.cfg.bd)
            packets += self._encode_push(f.disp_idx, srcs[f.disp_idx], f.show, f.layer,
                                         f.past_idx, f.future_idx, qindex_override=q,
                                         dpb_slot=slot)
            for se in f.show_existing:
                packets += self._push_done(self._show_existing(se))
        self.anchor = frames[-1][0]
        # drop DPB entries older than the new anchor (refs no longer
        # needed), except the GOLDEN key the sequence still references
        g = getattr(self, "_golden_disp", None)
        for k in [k for k in self.dpb if k < self.anchor and k != g]:
            del self.dpb[k]
        return packets

    # --------------------------------------------------------------- encoding

    def _pad(self, y, u, v):
        p = FrameParams(width=self.cfg.width, height=self.cfg.height, qindex=self.cfg.qindex,
                        bd=self.cfg.bd)
        aw, ah = p.aligned_width, p.aligned_height
        return [pad_to_aligned(np.asarray(y, np.int32), aw, ah),
                pad_to_aligned(np.asarray(u, np.int32), aw >> 1, ah >> 1),
                pad_to_aligned(np.asarray(v, np.int32), aw >> 1, ah >> 1)]

    def _metadata_obus(self) -> bytes:
        """HDR metadata OBUs for key-frame TUs (CLL / MDCV / T.35;
        reference metadata_handle.c svt_aom_copy_metadata_buffer)."""
        from ..entropy import bitstream as bs

        cfg = self.cfg
        out = b""
        if cfg.content_light is not None:
            out += bs.content_light_obu(*cfg.content_light)
        if cfg.mastering_display is not None:
            prim, wp, mx, mn = cfg.mastering_display
            out += bs.mastering_display_obu(prim, wp, mx, mn)
        if cfg.itut_t35 is not None:
            out += bs.itut_t35_obu(0xB5, cfg.itut_t35)
        return out

    def _frame_qindex(self, is_key: bool, layer: int, disp: int | None = None) -> int:
        if self.rc is not None:
            return self.rc.frame_qindex(is_key, layer, disp)
        q = self.cfg.qindex
        if self.cfg.minigop > 1 or self.cfg.keyint > 1:
            q += gop.KEY_Q_OFFSET if is_key else gop.LAYER_Q_OFFSET[min(layer, 2)]
        return max(1, min(255, q))

    def _show_existing(self, disp_idx: int) -> Packet:
        slot = self.dpb[disp_idx]["slot"]
        tu = temporal_delimiter_obu() + show_existing_frame_obu(slot)
        return Packet(tu=tu, shown_disp_idx=disp_idx)

    def _gm_estimate(self, p, disp_idx: int, is_key: bool, past_idx, src):
        """Translation global-motion estimation vs the LAST ref's source
        luma (codec/gm.py; global_me.c:126 analog).  Also maintains the
        source-luma cache used as the estimation reference."""
        if not self._use_gm or src is None:
            return
        cur = np.asarray(src[0])
        if not is_key and past_idx is not None:
            from ..codec import gm as gm_mod

            ref = self._gm_src.get(past_idx)
            if ref is not None and ref.shape == cur.shape:
                mv = gm_mod.estimate_translation(cur, ref)
                if mv != (0, 0):
                    g = [(0, 0)] * 8
                    g[int(RefFrame.LAST_FRAME)] = mv
                    p.gm_mvs = tuple(g)
        self._gm_src[disp_idx] = cur
        while len(self._gm_src) > 32:
            del self._gm_src[min(self._gm_src)]

    def _frame_setup(self, disp_idx: int, is_key: bool, layer: int,
                     past_idx, future_idx, qindex_override) -> dict:
        """Per-frame header/reference setup shared by the synchronous and
        pipelined encode paths: qindex, ref map (id -> DPB planes), ref
        slots/hints, loop-filter levels, FrameParams."""
        cfg = self.cfg
        order_hint = disp_idx & 0x7F
        qindex = (qindex_override if qindex_override is not None
                  else self._frame_qindex(is_key, layer, disp_idx))
        ref_hints = [0] * 8
        refs = None
        ref_slot = [0] * 7
        if not is_key:
            past = self.dpb[past_idx]
            fut = self.dpb[future_idx] if future_idx is not None else None
            refs = {int(RefFrame.LAST_FRAME): past["planes"]}
            entries = {int(RefFrame.LAST_FRAME): past}
            if fut is not None:
                refs[int(RefFrame.ALTREF_FRAME)] = fut["planes"]
                entries[int(RefFrame.ALTREF_FRAME)] = fut
            # GOLDEN = the sequence's last key (multi-ref single prediction;
            # the reference uses up to 7 refs, av1_generate_rps_info). Kept
            # even when it coincides with LAST so the frame pipeline's ref
            # count — and the compiled program family — stays constant
            # across the GOP.
            g = getattr(self, "_golden_disp", None)
            if (cfg.n_refs >= 3 and g is not None and g in self.dpb
                    and g != future_idx):
                gold = self.dpb[g]
                refs[int(RefFrame.GOLDEN_FRAME)] = gold["planes"]
                entries[int(RefFrame.GOLDEN_FRAME)] = gold
            for ref in range(1, 8):
                if ref in entries:
                    ent = entries[ref]
                elif ref >= int(RefFrame.BWDREF_FRAME) and fut is not None:
                    ent = fut
                else:
                    ent = past
                ref_hints[ref] = ent["order_hint"]
                ref_slot[ref - 1] = ent["slot"]

        lf_levels = (0, 0, 0, 0)
        if cfg.enable_dlf:
            from ..filters import dlf

            lf_levels = dlf.pick_filter_levels(qindex, cfg.bd, is_key, cfg.height)
        # compound availability: a real future ALTREF (hierarchical-B
        # middles) with the jax decide that injects NEW_NEWMV candidates
        ref_select = int(cfg.enable_compound and not is_key
                         and future_idx is not None
                         and cfg.mode_decision == "jax"
                         and not cfg.enable_restoration)
        p = FrameParams(width=cfg.width, height=cfg.height, qindex=qindex, bd=cfg.bd,
                        tile_cols_log2=cfg.tile_cols_log2, tile_rows_log2=cfg.tile_rows_log2,
                        frame_is_intra=is_key, order_hint=order_hint,
                        ref_hints=tuple(ref_hints), lf_levels=lf_levels,
                        reference_select=ref_select,
                        enable_filter_intra=cfg.enable_filter_intra,
                        enable_rdoq=cfg.enable_rdoq,
                        enable_gm=int(self._use_gm), **self._sf)
        return dict(p=p, refs=refs, ref_slot=ref_slot, order_hint=order_hint,
                    qindex=qindex)

    # --------------------------------------------------- pipelined inter path

    def _dpb_assign(self, disp_idx: int, is_key: bool, dpb_slot):
        """DPB slot + refresh flag; updates GOLDEN bookkeeping for keys."""
        refresh = True
        if dpb_slot == "auto":
            slot = 7 if is_key else disp_idx % 7
        elif dpb_slot is None:
            slot, refresh = 0, False
        else:
            slot = dpb_slot
        if is_key:
            self._golden_disp = disp_idx
            self._slot_occupant = {s: disp_idx for s in range(7)}
        return slot, refresh

    def _stack_refs(self, refs: dict, bd: int):
        """(NREF, ...) device plane stacks from DPB entries (device odt
        arrays from pipelined frames, numpy int32 from sync/key frames)."""
        import jax
        import jax.numpy as jnp

        dt = np.uint8 if bd == 8 else np.int16
        ref_ids = sorted(refs.keys())
        out = []
        for pl in range(3):
            parts = []
            for r in ref_ids:
                x = refs[r][pl]
                if isinstance(x, np.ndarray):
                    x = jax.device_put(np.asarray(x, dt))
                parts.append(x)
            out.append(jnp.stack(parts))
        return tuple(out), ref_ids

    def _pipe_drain(self) -> list:
        """Finish every queued pipeline item in order."""
        items, self._pipe = self._pipe, []
        out = []
        for kind, payload in items:
            out.append(payload if kind == "done" else self._pipe_finish(payload))
        return out

    def _push_done(self, pkt: Packet) -> list:
        """Order an already-built packet behind any in-flight frame."""
        if self._pipe:
            self._pipe.append(("done", pkt))
            return []
        return [pkt]

    def _encode_push(self, disp_idx: int, src: list, show: bool, layer: int,
                     past_idx, future_idx, qindex_override=None,
                     dpb_slot="auto") -> list:
        """Pipelined inter encode: dispatch this frame's decide, drain older
        host work (overlapping the device), then dispatch commit + filters
        and queue the host finish. Falls back to the synchronous path when
        the config can't pipeline (numpy MD, restoration, tiles, rate
        control with per-frame feedback)."""
        cfg = self.cfg
        if not (self._pipeline_ok and self.rc is None):
            out = self._pipe_drain()
            out.append(self._encode_one(disp_idx, src, False, show, layer,
                                        past_idx, future_idx,
                                        qindex_override=qindex_override,
                                        dpb_slot=dpb_slot))
            return out
        from . import inter_device

        setup = self._frame_setup(disp_idx, False, layer, past_idx, future_idx,
                                  qindex_override)
        p = setup["p"]
        self._gm_estimate(p, disp_idx, False, past_idx, src)
        refs_dev, ref_ids = self._stack_refs(setup["refs"], p.bd)
        pend = inter_device.inter_start_decide(src, p, refs_dev,
                                               p.interp_filter, ref_ids)
        out = self._pipe_drain()  # host walks of older frames overlap decide
        pend = inter_device.inter_start_commit(pend, enable_dlf=cfg.enable_dlf,
                                               enable_cdef=cfg.enable_cdef)
        slot, refresh = self._dpb_assign(disp_idx, False, dpb_slot)
        self.dpb[disp_idx] = {"planes": pend.dpb_planes,
                              "order_hint": setup["order_hint"], "slot": slot}
        self._pipe.append(("frame", dict(pend=pend, setup=setup, show=show,
                                         disp_idx=disp_idx, slot=slot,
                                         refresh=refresh)))
        return out

    def _pipe_finish(self, st: dict) -> Packet:
        from . import inter_device

        cfg = self.cfg
        setup, pend = st["setup"], st["pend"]
        p, ref_slot = setup["p"], setup["ref_slot"]
        slot, refresh = st["slot"], st["refresh"]
        disp_idx, show = st["disp_idx"], st["show"]
        primary_ref = 7  # PRIMARY_REF_NONE
        walk_fc = FrameContext(p.qindex)
        if cfg.cdf_inheritance:
            saved = self._cdf_slots[ref_slot[0]]
            if saved is not None:
                walk_fc = saved.clone()
                primary_ref = 0  # LAST
        plan, recon, filt, payloads = inter_device.inter_finish(pend, walk_fc)
        ypri, ysec, upri, usec, cdef_damping = filt["cdef"]
        from ..entropy.bitstream import skip_mode_allowed as _sma

        fr = FrameConfig(qindex=p.qindex, disable_cdf_update=p.disable_cdf_update,
                         show_frame=show,
                         tile_cols_log2=p.tile_cols_log2, tile_rows_log2=p.tile_rows_log2,
                         frame_type=1, order_hint=setup["order_hint"],
                         refresh_frame_flags=(1 << slot) if refresh else 0,
                         ref_frame_idx=tuple(ref_slot),
                         lf_levels=filt["lf_levels"], lf_sharpness=p.lf_sharpness,
                         cdef_damping=cdef_damping, cdef_y=((ypri, ysec),),
                         cdef_uv=((upri, usec),),
                         primary_ref_frame=primary_ref,
                         frame_end_update_cdf=cfg.cdf_inheritance,
                         reference_select=p.reference_select,
                         skip_mode_allowed=bool(p.reference_select) and _sma(
                             p.order_hint, p.order_hint_bits, list(p.ref_hints[1:])),
                         gm_mvs=p.gm_mvs,
                         prev_gm_mvs=(self._gm_slots[ref_slot[primary_ref]]
                                      if primary_ref != 7 else None),
                         film_grain=self._grain_for(disp_idx))
        tu = temporal_delimiter_obu()
        if not self._wrote_seq:
            tu += sequence_header_obu(self.seq)
            self._wrote_seq = True
        tu += frame_obu(self.seq, fr, payloads[0] if len(payloads) == 1 else payloads)
        saved_ctx = walk_fc if cfg.cdf_inheritance else None
        if saved_ctx is not None:
            saved_ctx.reset_counters()
        if refresh:
            self._cdf_slots[slot] = saved_ctx
            self._gm_slots[slot] = tuple(p.gm_mvs)
        return Packet(tu=tu, disp_idx=disp_idx, recon=recon,
                      shown_disp_idx=disp_idx if show else None)

    def _encode_one(self, disp_idx: int, src: list, is_key: bool, show: bool, layer: int,
                    past_idx, future_idx, plan_recon=None, filt=None,
                    qindex_override=None, walk_fc=None, dpb_slot="auto") -> Packet:
        cfg = self.cfg
        setup = self._frame_setup(disp_idx, is_key, layer, past_idx, future_idx,
                                  qindex_override)
        p, refs, ref_slot = setup["p"], setup["refs"], setup["ref_slot"]
        self._gm_estimate(p, disp_idx, is_key, past_idx, src)
        order_hint = setup["order_hint"]
        if refs is not None:
            # the synchronous paths (numpy MD, restoration) need host planes;
            # device-resident DPB entries (pipelined frames) download here
            refs = {r: [np.asarray(pl, np.int32) for pl in pls]
                    for r, pls in refs.items()}

        # frame-initial CDF state: inherit from the primary ref's saved
        # context when available (md_config_process.c:676-695 analog)
        primary_ref = 7  # PRIMARY_REF_NONE
        if walk_fc is None:
            walk_fc = FrameContext(p.qindex)
            if not is_key and cfg.cdf_inheritance:
                saved = self._cdf_slots[ref_slot[0]]
                if saved is not None:
                    walk_fc = saved.clone()
                    primary_ref = 0  # LAST

        use_lr = cfg.enable_restoration
        payloads = None
        if plan_recon is not None:
            plan, recon = plan_recon[0], plan_recon[1]
            if len(plan_recon) > 2:
                payloads = plan_recon[2]
        elif is_key:
            if cfg.mode_decision == "jax":
                from . import device_commit

                plan, recon, filt, payloads = device_commit.encode_intra_frames(
                    [src], p,
                    apply_filters=(cfg.enable_dlf or cfg.enable_cdef) and not use_lr,
                    enable_dlf=cfg.enable_dlf, enable_cdef=cfg.enable_cdef,
                    walk_fcs=[walk_fc],
                    use_arrays=False if use_lr else None)[0]
            else:
                plan, recon = intra_md.encode_intra_frame(src, p)
        elif cfg.mode_decision == "jax":
            from . import inter_device

            plan, recon, filt, payloads = inter_device.encode_inter_frame_device(
                src, p, refs, enable_dlf=cfg.enable_dlf, enable_cdef=cfg.enable_cdef,
                walk_fc=walk_fc, use_arrays=False if use_lr else None,
                apply_filters=not use_lr)
        else:
            from . import inter_md

            plan, recon = inter_md.encode_inter_frame(src, p, refs)

        from ..utils import profiler

        def walk_payloads():
            out = []
            tiles = p.tiles()
            fc_init = walk_fc.clone() if len(tiles) > 1 else None
            for i, tile in enumerate(tiles):
                # tile 0 adapts walk_fc in place (its end state is the
                # stored frame context); later tiles restart from the
                # frame-initial state per spec
                tc = TileCodec(p, walk_fc if i == 0 else fc_init.clone(), tile=tile)
                out.append(tc.encode(plan))
            return out

        if payloads is None and not use_lr:
            with profiler.stage("entropy_walk"):
                payloads = walk_payloads()

        # in-loop filters on the encoder's recon (decoder does the same);
        # batched device frames arrive pre-filtered with their parameters
        cdef_y, cdef_uv, cdef_damping = ((0, 0),), ((0, 0),), 3
        hdr_lf = p.lf_levels
        if filt is not None:
            hdr_lf = tuple(filt["lf_levels"])  # search may have moved Y
            ypri, ysec, upri, usec, cdef_damping = filt["cdef"]
            cdef_y, cdef_uv = ((ypri, ysec),), ((upri, usec),)
        else:
            with profiler.stage("host_filters"):
                frame_mi = None
                if any(p.lf_levels) or cfg.enable_cdef:
                    frame_mi = mi_from_plan(plan, p)
                if any(p.lf_levels):
                    from ..filters import dlf

                    dlf.loop_filter_frame(recon, frame_mi, p.qindex, p.bd, is_key,
                                          levels=p.lf_levels, sharpness=p.lf_sharpness)
                deblock = [pl.copy() for pl in recon] if use_lr else None
                if cfg.enable_cdef:
                    from ..filters import cdef as cdef_mod

                    ypri, ysec, upri, usec, cdef_damping = cdef_mod.search_strengths(
                        recon, src, frame_mi, p.qindex, p.bd)
                    cdef_y, cdef_uv = ((ypri, ysec),), ((upri, usec),)
                    if ypri or ysec or upri or usec:
                        cdef_mod.cdef_frame(recon, frame_mi, ypri, ysec, upri, usec,
                                            cdef_damping, bd=p.bd)

        if use_lr:
            # per-unit restoration search on the CDEF output, then the
            # (deferred) entropy walk with the LR decisions in the plan
            from ..filters import restoration as lr_mod
            from .intra_md import rd_lambda

            with profiler.stage("lr_search"):
                lam = float(rd_lambda(p.qindex, p.bd))
                lr_types = []
                plan.lr_units = []
                for plane in range(3):
                    sub = 1 if plane else 0
                    ftype, units = lr_mod.search_plane(
                        src[plane], recon[plane], deblock[plane],
                        p.lr_unit_size(plane), (cfg.width + sub) >> sub,
                        (cfg.height + sub) >> sub, sub, p.bd, plane > 0, lam)
                    lr_types.append(ftype)
                    plan.lr_units.append(units)
                p.lr_types = tuple(lr_types)
            with profiler.stage("entropy_walk"):
                payloads = walk_payloads()
            with profiler.stage("lr_apply"):
                for plane in range(3):
                    if p.lr_types[plane] == lr_mod.RESTORE_NONE:
                        continue
                    sub = 1 if plane else 0
                    recon[plane] = lr_mod.apply_lr_plane(
                        recon[plane], deblock[plane], plan.lr_units[plane],
                        p.lr_unit_size(plane), (cfg.width + sub) >> sub,
                        (cfg.height + sub) >> sub, sub, p.bd, plane > 0)

        tile_payload = payloads if len(payloads) > 1 else payloads[0]
        replicate_display_edges(recon, cfg.width, cfg.height)
        # keys park in slot 7 (they refresh all slots anyway) so the GOLDEN
        # reference survives the rotating non-key slots 0..6; mini-GoP
        # scheduling passes liveness-assigned slots (or None = droppable,
        # refresh_frame_flags 0)
        refresh = True
        if dpb_slot == "auto":
            slot = 7 if is_key else disp_idx % 7
        elif dpb_slot is None:
            slot, refresh = 0, False
        else:
            slot = dpb_slot
        if is_key:
            self._golden_disp = disp_idx
            self._slot_occupant = {s: disp_idx for s in range(7)}
        from ..entropy.bitstream import skip_mode_allowed as _sma

        fr = FrameConfig(qindex=p.qindex, disable_cdf_update=p.disable_cdf_update,
                         show_frame=show,
                         tile_cols_log2=p.tile_cols_log2, tile_rows_log2=p.tile_rows_log2,
                         frame_type=0 if is_key else 1, order_hint=order_hint,
                         refresh_frame_flags=(0xFF if is_key
                                              else (1 << slot) if refresh else 0),
                         ref_frame_idx=tuple(ref_slot),
                         lf_levels=hdr_lf, lf_sharpness=p.lf_sharpness,
                         cdef_damping=cdef_damping, cdef_y=cdef_y, cdef_uv=cdef_uv,
                         primary_ref_frame=primary_ref,
                         frame_end_update_cdf=cfg.cdf_inheritance,
                         lr_types=p.lr_types, lr_unit_shift=p.lr_unit_shift,
                         lr_uv_shift=p.lr_uv_shift,
                         reference_select=p.reference_select,
                         skip_mode_allowed=bool(p.reference_select) and _sma(
                             p.order_hint, p.order_hint_bits, list(p.ref_hints[1:])),
                         gm_mvs=p.gm_mvs,
                         prev_gm_mvs=(self._gm_slots[ref_slot[primary_ref]]
                                      if primary_ref != 7 else None),
                         film_grain=self._grain_for(disp_idx))
        tu = temporal_delimiter_obu()
        if not self._wrote_seq:
            tu += sequence_header_obu(self.seq)
            self._wrote_seq = True
        if is_key:
            tu += self._metadata_obus()
        tu += frame_obu(self.seq, fr, tile_payload)

        self.dpb[disp_idx] = {"planes": recon, "order_hint": order_hint, "slot": slot}
        # store the frame context with every refreshed slot: tile 0's
        # adapted end state when frame_end_update_cdf, else the initial.
        # The adopted context restarts its update counters (spec frame-end
        # context adoption; av1_reset_cdf_symbol_counters)
        saved_ctx = walk_fc if cfg.cdf_inheritance else None
        if saved_ctx is not None:
            saved_ctx.reset_counters()
        if is_key:
            self._cdf_slots = [saved_ctx] * 8
            self._gm_slots = [tuple(p.gm_mvs)] * 8
        elif refresh:
            self._cdf_slots[slot] = saved_ctx
            self._gm_slots[slot] = tuple(p.gm_mvs)
        if self.rc is not None:
            self.rc.update(len(tu) * 8.0)
        return Packet(tu=tu, disp_idx=disp_idx, recon=recon,
                      shown_disp_idx=disp_idx if show else None)
