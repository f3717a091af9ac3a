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
