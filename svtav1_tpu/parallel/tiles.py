"""Multi-chip tile parallelism: shard the production decide pass over a
device mesh (one AV1 tile column per device) and assemble ONE multi-tile
bitstream.

The reference's analog is tile-group EncDec tasks + per-tile EC threads
(enc_dec_process.c:3203, ec_process.c:232) — shared-memory threads become a
`jax.sharding.Mesh` + `shard_map`: tiles are prediction-independent per the
AV1 spec, so the only cross-device traffic is the frame-level distortion
reduction used by rate control (a `psum` over the tile axis — SURVEY §2.5).

The batched decide program (the dominant device work, see bench stage
timings) runs as one traced step over the mesh; per-tile host partition DP,
the wavefront commit, and the native C entropy walk then consume each tile's
shard. Per-tile penalty grids are passed as SHARDED DATA (the rightmost
tile's edge-availability differs), so one traced program serves every tile.
"""
from __future__ import annotations

import functools

import numpy as np

from ..codec.tile_codec import FrameParams
from ..constants.cdf import FrameContext, get_q_ctx


def _tile_consts(p: FrameParams, qctx: int, tiles: list):
    """Per-tile penalty grids (stacked, shard axis 0) + shared mode/tx
    tables for every size present in a tile."""
    from ..pipeline.device_decide import (_penalty_grid_np, fc_for_qctx,
                                          intra_mode_cost_const,
                                          intra_txtype_cost_const, SIZES)

    fc = fc_for_qctx(qctx)
    x0, y0, rw, rh = _region_of(p, tiles[0])
    sizes = [n for n in SIZES if rh // n and rw // n]
    pens = {}
    for n in sizes:
        per_tile = []
        for t in tiles:
            tx0, ty0, trw, trh = _region_of(p, t)
            mi_end = (min((ty0 + trh) // 4, p.mi_rows), min((tx0 + trw) // 4, p.mi_cols))
            per_tile.append(_penalty_grid_np(p, ty0, tx0, trh // n, trw // n, n,
                                             (tx0, ty0), mi_end))
        pens[n] = np.stack(per_tile)  # (ndev, R, C, 13)
    mode_cost = {n: intra_mode_cost_const(fc, n, bool(p.frame_is_intra)) for n in sizes}
    txt_cost = {n: intra_txtype_cost_const(fc, n) for n in sizes}
    return sizes, pens, mode_cost, txt_cost


def _region_of(p: FrameParams, tile) -> tuple:
    r0, r1, c0, c1 = tile
    x0, y0 = c0 * 64, r0 * 64
    return (x0, y0, min(c1 * 64, p.aligned_width) - x0,
            min(r1 * 64, p.aligned_height) - y0)


@functools.lru_cache(maxsize=8)
def _mesh_decide_fn(width: int, height: int, qctx: int, bd: int, ndev: int,
                    mesh_key: int):
    """Build the shard_map'ed decide step for an ndev-tile-column frame.
    mesh_key is id(mesh) to key the cache; the mesh itself is looked up via
    _MESH_REGISTRY."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..pipeline.device_decide import _decide_intra_size

    mesh = _MESH_REGISTRY[mesh_key]
    p = FrameParams(width=width, height=height, qindex=100, bd=bd,
                    frame_is_intra=True,
                    tile_cols_log2=int(np.log2(ndev)))
    tiles = p.tiles()
    assert len(tiles) == ndev, (len(tiles), ndev)
    regions = [_region_of(p, t) for t in tiles]
    rw, rh = regions[0][2], regions[0][3]
    assert all(r[2] == rw and r[3] == rh for r in regions), \
        "mesh tile sharding needs equal tile dims"
    sizes, _pens, mode_cost, txt_cost = _tile_consts(p, qctx, tiles)
    layout = [(n, rh // n, rw // n) for n in sizes]

    def tile_step(sy8, su8, sv8, pens, dqv, lam):
        # shapes: sy8 (1, rh, rw) — this device's tile column; pens: tuple of
        # (1, R, C, 13) penalty grids
        sy = sy8.astype(jnp.int32)
        su = su8.astype(jnp.int32)
        sv = sv8.astype(jnp.int32)
        dq = (dqv[0], dqv[1])
        packed = []
        total = jnp.float32(0)
        for (n, R, C), pen in zip(layout, pens):
            cost, mode, tx = _decide_intra_size(
                sy, su, sv, pen[0], jnp.asarray(mode_cost[n]),
                jnp.asarray(txt_cost[n]), n, qctx, dq, bd, bool(p.frame_is_intra),
                R, C, lam)
            packed += [cost.ravel(), mode.astype(jnp.float32).ravel(),
                       tx.astype(jnp.float32).ravel()]
            total = total + jnp.sum(cost)
        # frame-level RC reduction across tiles rides the mesh (ICI on TPU)
        total = jax.lax.psum(total, "tile")
        return jnp.concatenate(packed)[None], total

    fn = shard_map(
        tile_step, mesh=mesh,
        in_specs=(P("tile"), P("tile"), P("tile"),
                  tuple(P("tile") for _ in layout), P(), P()),
        out_specs=(P("tile"), P()))
    return jax.jit(fn), layout, tiles, regions


_MESH_REGISTRY: dict = {}


def encode_intra_frame_mesh(src_planes: list, p_base: FrameParams, mesh):
    """Encode ONE intra frame with the decide pass sharded over `mesh`
    (tile columns), per-tile DP/commit/walk on host, returning
    (payloads, recon_planes, frame_params). The caller wraps payloads in a
    multi-tile frame OBU; the stream must decode bit-exactly."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..codec import array_plan
    from ..codec.tile_walk_native import run_tile_ops
    from ..entropy import native
    from ..pipeline import device_commit, device_decide
    from ..pipeline.device_decide import TX_SEARCH, MODES, qparams_np
    from ..pipeline.intra_md import rd_lambda

    ndev = int(np.prod([d for d in mesh.devices.shape]))
    qctx = get_q_ctx(p_base.qindex)
    _MESH_REGISTRY[id(mesh)] = mesh
    fn, layout, tiles, regions = _mesh_decide_fn(
        p_base.width, p_base.height, qctx, p_base.bd, ndev, id(mesh))
    p = FrameParams(width=p_base.width, height=p_base.height, qindex=p_base.qindex,
                    bd=p_base.bd, frame_is_intra=True,
                    tile_cols_log2=int(np.log2(ndev)))
    fc = FrameContext(p.qindex)
    lam = float(rd_lambda(p.qindex, p.bd))
    dqv, lam_op = qparams_np(p.qindex, p.bd)

    # stack per-tile slabs on the shard axis and place them on the mesh
    dt = np.uint8 if p.bd == 8 else np.int16
    y = np.asarray(src_planes[0], dt)
    u = np.asarray(src_planes[1], dt)
    v = np.asarray(src_planes[2], dt)
    sy = np.stack([y[r[1] : r[1] + r[3], r[0] : r[0] + r[2]] for r in regions])
    su = np.stack([u[r[1] // 2 : (r[1] + r[3]) // 2, r[0] // 2 : (r[0] + r[2]) // 2]
                   for r in regions])
    sv = np.stack([v[r[1] // 2 : (r[1] + r[3]) // 2, r[0] // 2 : (r[0] + r[2]) // 2]
                   for r in regions])
    sizes, pens, _mc, _tc = _tile_consts(p, qctx, tiles)
    shard = NamedSharding(mesh, P("tile"))
    sy = jax.device_put(sy, shard)
    su = jax.device_put(su, shard)
    sv = jax.device_put(sv, shard)
    pens_dev = tuple(jax.device_put(jnp.asarray(pens[n]), shard) for n in sizes)

    packed, total = fn(sy, su, sv, pens_dev, dqv, lam_op)
    packed_np = np.asarray(packed)  # (ndev, L)
    assert float(total) >= 0.0

    # host per-tile: unpack -> DP -> commit -> ops -> native walk
    src_dev = device_decide.put_frames([src_planes], p.bd)
    aw, ah = p.aligned_width, p.aligned_height
    payloads = []
    ry = jnp.zeros((1, ah, aw), jnp.int32)
    ru = jnp.zeros((1, ah // 2, aw // 2), jnp.int32)
    rv = jnp.zeros((1, ah // 2, aw // 2), jnp.int32)
    assert native.available()
    for ti, (tile, region) in enumerate(zip(tiles, regions)):
        dec = {}
        off = 0
        for n, R, C in layout:
            sz = R * C
            dec[n] = dict(
                cost=packed_np[ti, off : off + sz].reshape(R, C).astype(np.float64),
                mode=packed_np[ti, off + sz : off + 2 * sz].reshape(R, C).astype(np.int32),
                tx=packed_np[ti, off + 2 * sz : off + 3 * sz].reshape(R, C).astype(np.int32))
            off += 3 * sz
        partitions, leaves, tree = device_decide.partition_dp(dec, p, fc, lam, region)
        try_, tru, trv, _skip8, aux = device_commit.commit_regions(
            src_dev, p, [leaves], [dec], [None], region, array_out=True)
        x0, y0, rw, rh = region
        ry = ry.at[:, y0 : y0 + rh, x0 : x0 + rw].set(try_)
        ru = ru.at[:, y0 // 2 : (y0 + rh) // 2, x0 // 2 : (x0 + rw) // 2].set(tru)
        rv = rv.at[:, y0 // 2 : (y0 + rh) // 2, x0 // 2 : (x0 + rw) // 2].set(trv)
        ops, _k = array_plan.build_tile_ops(p, tree, aux["sched"], aux["level_base"],
                                            0, region, tile, None, TX_SEARCH, MODES)
        payloads.append(run_tile_ops(p, FrameContext(p.qindex), ops,
                                     aux["levels_i32"], tile))
    recon = [np.asarray(ry[0]), np.asarray(ru[0]), np.asarray(rv[0])]
    return payloads, recon, p


# ---------------------------------------------------------------- inter mesh

HALO = 128  # per-tile ref halo (columns) — covers the full HME reach
# (L2 +-16 @ quarter res = +-64 full-pel, + refinements +-2+-2+-4 and the
# 8-tap/subpel margin), so every sample a tile's MC can touch is genuine


@functools.lru_cache(maxsize=8)
def _mesh_inter_fn(width: int, height: int, qctx: int, bd: int, ndev: int,
                   nref: int, which: int, mesh_key: int):
    """shard_map'ed INTER decide over tile columns: per-tile ME/MC against
    halo-cropped reference slabs (sharded data), per-tile intra candidates,
    psum frame-cost reduction. One traced program serves every tile."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..codec import rate_jax
    from ..ops import me_jax
    from ..pipeline.device_decide import (_decide_intra_size, _blocks_of,
                                          intra_mode_cost_const,
                                          intra_txtype_cost_const, fc_for_qctx)
    from ..pipeline.inter_device import (MAX_MV_ABS, _decide_inter_size,
                                         inter_cand_cost_const,
                                         inter_txtype_cost_const)

    mesh = _MESH_REGISTRY[mesh_key]
    p = FrameParams(width=width, height=height, qindex=100, bd=bd,
                    frame_is_intra=False, tile_cols_log2=int(np.log2(ndev)))
    tiles = p.tiles()
    assert len(tiles) == ndev, (len(tiles), ndev)
    regions = [_region_of(p, t) for t in tiles]
    rw, rh = regions[0][2], regions[0][3]
    assert all(r[2] == rw and r[3] == rh for r in regions)
    fc = fc_for_qctx(qctx)
    sizes, pens, _mc, _tc = _tile_consts(p, qctx, tiles)
    layout = [(n, rh // n, rw // n) for n in sizes]
    mode_cost = {n: intra_mode_cost_const(fc, n, False) for n in sizes}
    txt_cost = {n: intra_txtype_cost_const(fc, n) for n in sizes}
    cand_bits = inter_cand_cost_const(fc, (1,))
    inter_txt = {n: inter_txtype_cost_const(fc, n) for n in sizes}
    joint = np.asarray(rate_jax.mv_joint_cost(fc))
    comp = np.asarray(rate_jax.mv_component_cost_lut(fc, MAX_MV_ABS))
    sbr, sbc = rh // 64, rw // 64

    def tile_step(sy8, su8, sv8, ry8, ru8, rv8, pens_in, dqv, lam):
        # sy8 (1, rh, rw); ry8 (1, NREF, rh(+pad), rw + 2*HALO) halo crop
        sy = sy8[0].astype(jnp.int32)
        su = su8[0].astype(jnp.int32)
        sv = sv8[0].astype(jnp.int32)
        refs_y = ry8[0].astype(jnp.int32)
        refs_u = ru8[0].astype(jnp.int32)
        refs_v = rv8[0].astype(jnp.int32)
        dq = (dqv[0], dqv[1])
        mv_by_ref = {n: [] for n in sizes}
        mc_by_ref = {n: [] for n in sizes}
        sb_pred = []
        for ri in range(nref):
            mvs_fp, mv_sb = me_jax.me_fullpel_frame(sy, refs_y[ri], sbr, sbc,
                                                    ref_off_x=HALO)
            sb_pred.append(mv_sb.reshape(sbr, sbc, 2) * 8)
            for n, R, C in layout:
                fp = mvs_fp[n][:R, :C].reshape(R * C, 2)
                r_idx = jnp.repeat(jnp.arange(R), C)
                c_idx = jnp.tile(jnp.arange(C), R)
                srcb = _blocks_of(sy[None], n, R, C)
                mv8, mc8 = me_jax.subpel_pred_lanes(
                    srcb, refs_y[ri], r_idx * n, c_idx * n + HALO, fp, which, bd)
                mv_by_ref[n].append(jnp.clip(mv8, -MAX_MV_ABS, MAX_MV_ABS))
                mc_by_ref[n].append(mc8)
        packed = []
        total = jnp.float32(0)
        for (n, R, C), pen in zip(layout, pens_in):
            intra_out = _decide_intra_size(
                sy[None], su[None], sv[None], pen[0],
                jnp.asarray(mode_cost[n]), jnp.asarray(txt_cost[n]), n, qctx,
                dq, bd, False, R, C, lam, nmodes=7)
            k = 64 // n
            preds = []
            for ri in range(nref):
                pr = jnp.repeat(jnp.repeat(sb_pred[ri], k, axis=0), k, axis=1)
                preds.append(pr[:R, :C].reshape(R * C, 2))
            consts = (jnp.asarray(joint), jnp.asarray(comp), cand_bits,
                      jnp.asarray(inter_txt[n]))
            outs = _decide_inter_size(
                sy, su, sv, refs_y, refs_u, refs_v,
                mv_by_ref[n], preds, intra_out, consts, n, qctx, dq, bd,
                R, C, lam, which, mc_by_ref=mc_by_ref[n], ref_off_x=HALO)
            cost = outs[0]
            total = total + jnp.sum(cost)
            packed += [o.astype(jnp.float32).ravel() for o in outs]
        total = jax.lax.psum(total, "tile")
        return jnp.concatenate(packed)[None], total

    fn = shard_map(
        tile_step, mesh=mesh,
        in_specs=(P("tile"), P("tile"), P("tile"),
                  P("tile"), P("tile"), P("tile"),
                  tuple(P("tile") for _ in layout), P(), P()),
        out_specs=(P("tile"), P()))
    return jax.jit(fn), layout, tiles, regions


def encode_inter_frame_mesh(src_planes: list, p_base: FrameParams, refs: dict,
                            mesh, walk_fc=None):
    """Encode ONE inter frame multi-tile over the mesh: sharded decide
    (per-tile ME against halo-cropped refs + psum cost reduction), per-tile
    host DP + wavefront commit + native walk. Returns (payloads, recon,
    params). Filters are left to the caller (frame-wide stage)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..codec import array_plan
    from ..codec.tile_codec import Plan
    from ..codec.tile_walk_native import run_tile_ops
    from ..entropy import native
    from ..pipeline import device_commit, device_decide
    from ..pipeline.device_decide import TX_SEARCH, MODES, qparams_np
    from ..pipeline.intra_md import rd_lambda

    ndev = int(np.prod([d for d in mesh.devices.shape]))
    qctx = get_q_ctx(p_base.qindex)
    _MESH_REGISTRY[id(mesh)] = mesh
    ref_ids = sorted(refs.keys())
    nref = len(ref_ids)
    which = p_base.interp_filter
    fn, layout, tiles, regions = _mesh_inter_fn(
        p_base.width, p_base.height, qctx, p_base.bd, ndev, nref, which, id(mesh))
    p = p_base
    fc = FrameContext(p.qindex)
    lam = float(rd_lambda(p.qindex, p.bd))
    dqv, lam_op = qparams_np(p.qindex, p.bd)
    dt = np.uint8 if p.bd == 8 else np.int16
    aw, ah = p.aligned_width, p.aligned_height

    def tile_slabs(plane, sub):
        return np.stack([np.asarray(plane, dt)[
            r[1] >> sub : (r[1] + r[3]) >> sub,
            r[0] >> sub : (r[0] + r[2]) >> sub] for r in regions])

    shard = NamedSharding(mesh, P("tile"))
    sy = jax.device_put(tile_slabs(src_planes[0], 0), shard)
    su = jax.device_put(tile_slabs(src_planes[1], 1), shard)
    sv = jax.device_put(tile_slabs(src_planes[2], 1), shard)

    def halo_of(plane_idx, sub):
        halo = HALO >> sub
        out = []
        for r in regions:
            x0, y0, rw, rh = r[0] >> sub, r[1] >> sub, r[2] >> sub, r[3] >> sub
            per_ref = []
            for rid in ref_ids:
                plane = np.asarray(refs[rid][plane_idx], dt)
                padded = np.pad(plane, ((0, 0), (halo, halo)), mode="edge")
                per_ref.append(padded[y0 : y0 + rh, x0 : x0 + rw + 2 * halo])
            out.append(np.stack(per_ref))
        return jax.device_put(np.stack(out), shard)

    ry = halo_of(0, 0)
    ru = halo_of(1, 1)
    rv = halo_of(2, 1)
    sizes = [n for n, _r, _c in layout]
    _s, pens, _mc2, _tc2 = _tile_consts(
        FrameParams(width=p.width, height=p.height, qindex=p.qindex, bd=p.bd,
                    frame_is_intra=False, tile_cols_log2=int(np.log2(ndev))),
        qctx, tiles)
    pens_dev = tuple(jax.device_put(jnp.asarray(pens[n]), shard) for n in sizes)

    packed, total = fn(sy, su, sv, ry, ru, rv, pens_dev, dqv, lam_op)
    packed_np = np.asarray(packed)
    assert float(total) >= 0.0

    # host per tile: unpack -> DP -> commit (halo-cropped refs) -> walk
    src_dev = device_decide.put_frames([src_planes], p.bd)
    fields = ("cost", "is_inter", "mode", "tx", "ref", "mvy", "mvx",
              "ref2", "mv2y", "mv2x")
    payloads = []
    frame_mi = None
    recon_y = np.zeros((ah, aw), np.int32)
    recon_u = np.zeros((ah // 2, aw // 2), np.int32)
    recon_v = np.zeros((ah // 2, aw // 2), np.int32)
    assert native.available()
    fc_init = walk_fc.clone() if walk_fc is not None else FrameContext(p.qindex)
    for ti, (tile, region) in enumerate(zip(tiles, regions)):
        dec = {}
        off = 0
        for n, R, C in layout:
            sz = R * C
            g = {}
            for kname in fields:
                arr = packed_np[ti, off : off + sz].reshape(R, C)
                g[kname] = (arr.astype(np.float64) if kname == "cost"
                            else arr.astype(np.int32))
                off += sz
            dec[n] = g
        partitions, leaves, tree = device_decide.partition_dp(dec, p, fc, lam, region)
        plan = Plan()
        plan.partitions.update(partitions)
        refs_crop = (jnp.asarray(np.asarray(ry)[ti]),
                     jnp.asarray(np.asarray(ru)[ti]),
                     jnp.asarray(np.asarray(rv)[ti]))
        try_, tru, trv, _s8, aux = device_commit.commit_regions(
            src_dev, p, [leaves], [dec], [plan], region,
            refs_dev=refs_crop, ref_ids=ref_ids, which=which, array_out=True,
            ref_origin=(0, HALO))
        x0, y0, rw, rh = region
        recon_y[y0 : y0 + rh, x0 : x0 + rw] = np.asarray(try_[0])
        recon_u[y0 // 2 : (y0 + rh) // 2, x0 // 2 : (x0 + rw) // 2] = np.asarray(tru[0])
        recon_v[y0 // 2 : (y0 + rh) // 2, x0 // 2 : (x0 + rw) // 2] = np.asarray(trv[0])
        ops, _k = array_plan.build_tile_ops(p, tree, aux["sched"], aux["level_base"],
                                            0, region, tile, ref_ids, TX_SEARCH, MODES)
        frame_mi = array_plan.mi_from_sched(p, aux["sched"], 0, region, ref_ids,
                                            MODES, mi=frame_mi)
        fc_t = walk_fc if (ti == 0 and walk_fc is not None) else fc_init.clone()
        payloads.append(run_tile_ops(p, fc_t, ops, aux["levels_i32"], tile))
    return payloads, [recon_y, recon_u, recon_v], p, frame_mi
