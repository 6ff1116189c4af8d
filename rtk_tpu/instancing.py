"""Two-level TLAS/BLAS instancing.

The reference is single-level (one scene blob, no instancing); this is the
scale-out path the BASELINE 10M-tri config requires.  TPU-first design:

  * All BLAS scenes are merged into ONE concatenated node/triangle space
    (child ids and leaf ids offset per BLAS), so a single traversal program
    serves every instance — the per-ray BLAS root is just a start node.
  * The top level is not a pointer-chasing tree walk: instance candidates
    are found by testing rays against ALL instance world AABBs as one dense
    (rays x instances) slab computation, keeping the nearest `C` candidates
    per ray via top_k.  For the instance counts the config targets (tens to
    thousands), this is faster on TPU than a divergent TLAS descent, and
    it is trivially batchable/shardable.
  * Phase two walks candidates nearest-first: each round transforms rays
    into the candidate's object space (affine inverse, direction left
    unnormalised so object-space t == world-space t) and traces the merged
    BLAS from that instance's root with the current best t as the upper
    bound — instance-level early-out exactly like rtk's node pop-culling
    (rtk.c:432-437), lifted to the instance level.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rtk_tpu.config import TraceConfig
from rtk_tpu.scene import Scene
from rtk_tpu.trace import stack as _stack
from rtk_tpu.types import Hits, Rays

Array = jax.Array


class InstancedScene(struct.PyTreeNode):
    """Merged BLAS forest + instance table."""

    merged: Scene  # concatenated BLAS scenes (multi-root)
    roots: Array  # (B,) i32 wide-root node id per BLAS
    instance_blas: Array  # (I,) i32
    world_from_object: Array  # (I, 3, 4) affine
    object_from_world: Array  # (I, 3, 4) affine inverse
    inst_lo: Array  # (I, 3) world AABB of each instance
    inst_hi: Array  # (I, 3)
    # Real (unpadded) triangle count per unique BLAS, static host-side.
    blas_tris: tuple = struct.field(pytree_node=False, default=())

    @property
    def num_instances(self) -> int:
        return self.instance_blas.shape[0]

    @property
    def total_triangles(self) -> int:
        """Effective triangle count: sum over instances of their BLAS size."""
        if not self.blas_tris:
            return 0
        counts = np.asarray(self.blas_tris)
        return int(counts[np.asarray(self.instance_blas)].sum())


def _affine_inverse(m: np.ndarray) -> np.ndarray:
    """(3,4) world-from-object -> (3,4) object-from-world."""
    lin = m[:, :3]
    t = m[:, 3]
    inv = np.linalg.inv(lin)
    return np.concatenate([inv, (-inv @ t)[:, None]], axis=1)


def merge_blas(scenes: Sequence[Scene]) -> tuple[Scene, np.ndarray]:
    """Concatenate BLAS Scenes into one multi-root Scene.

    All scenes must share leaf_size and branching.  Returns (merged, roots).
    """
    k = scenes[0].leaf_size
    w = scenes[0].branching
    for s in scenes:
        if s.leaf_size != k or s.branching != w:
            raise ValueError("BLAS scenes must share leaf_size/branching")
        if not s.has_wide:
            # The merge offsets binary AND wide ids by node_child row
            # counts (equal only when the wide arrays are real), and the
            # instanced exactness residual traverses the merged scene
            # through the XLA stack engine, which needs them.
            raise ValueError(
                "BLAS scenes must be built with wide_nodes=True "
                "(the instanced path's stack-engine residual and the "
                "merge offsets need the wide node arrays)")

    node_off = np.cumsum([0] + [s.node_child.shape[0] for s in scenes])
    leaf_off = np.cumsum([0] + [s.num_padded_tris // k for s in scenes])
    tri_off = np.cumsum([0] + [s.num_padded_tris for s in scenes])

    def shift_child(child, b):
        # internal ids += node_off[b]; leaf codes shift by leaf_off[b]
        # (python-int offsets: numpy scalars would promote to int64 when
        # jax_enable_x64 is on)
        internal = child >= 0
        leaf = child <= -2
        shifted_leaf = -((-child - 2) + int(leaf_off[b])) - 2
        return jnp.where(internal, child + int(node_off[b]),
                         jnp.where(leaf, shifted_leaf, child)).astype(jnp.int32)

    merged = Scene(
        node_child=jnp.concatenate(
            [shift_child(s.node_child, b) for b, s in enumerate(scenes)]),
        node_min=jnp.concatenate([s.node_min for s in scenes]),
        node_max=jnp.concatenate([s.node_max for s in scenes]),
        bin_left=jnp.concatenate(
            [shift_child(s.bin_left, b) for b, s in enumerate(scenes)]),
        bin_right=jnp.concatenate(
            [shift_child(s.bin_right, b) for b, s in enumerate(scenes)]),
        bin_lo=jnp.concatenate(
            [s.bin_lo + int(leaf_off[b]) for b, s in enumerate(scenes)]),
        bin_hi=jnp.concatenate(
            [s.bin_hi + int(leaf_off[b]) for b, s in enumerate(scenes)]),
        bin_min=jnp.concatenate([s.bin_min for s in scenes]),
        bin_max=jnp.concatenate([s.bin_max for s in scenes]),
        leaf_min=jnp.concatenate([s.leaf_min for s in scenes]),
        leaf_max=jnp.concatenate([s.leaf_max for s in scenes]),
        tri_v=jnp.concatenate([s.tri_v for s in scenes]),
        tri_vidx=jnp.concatenate([s.tri_vidx for s in scenes]),
        tri_mesh=jnp.concatenate([s.tri_mesh for s in scenes]),
        tri_prim=jnp.concatenate([s.tri_prim for s in scenes]),
        perm=jnp.concatenate(
            [jnp.where(s.perm >= 0, s.perm + int(tri_off[b]), -1)
             for b, s in enumerate(scenes)]).astype(jnp.int32),
        bounds_min=functools.reduce(
            jnp.minimum, [s.bounds_min for s in scenes]),
        bounds_max=functools.reduce(
            jnp.maximum, [s.bounds_max for s in scenes]),
        num_tris=int(tri_off[-1]),  # padding rows are degenerate -> harmless
        leaf_size=k,
        branching=w,
        num_leaves=int(leaf_off[-1]),
    )
    return merged, node_off[:-1].astype(np.int32)


def build_instanced(
    blas: Sequence[Scene],
    instance_blas,
    transforms,
) -> InstancedScene:
    """Assemble an InstancedScene.

    Args:
      blas: unique BLAS Scenes.
      instance_blas: (I,) int — BLAS index per instance.
      transforms: (I, 3, 4) world-from-object affine per instance.
    """
    merged, roots = merge_blas(blas)
    instance_blas = np.asarray(instance_blas, np.int32)
    transforms = np.asarray(transforms, np.float32).reshape(-1, 3, 4)
    inv = np.stack([_affine_inverse(m) for m in transforms]).astype(np.float32)

    # World AABB per instance: transform the 8 corners of the BLAS bounds.
    lo = np.stack([np.asarray(blas[b].bounds_min) for b in instance_blas])
    hi = np.stack([np.asarray(blas[b].bounds_max) for b in instance_blas])
    corners = np.stack(
        [np.where([(c >> a) & 1 for a in range(3)], hi_i, lo_i)
         for lo_i, hi_i in zip(lo, hi)
         for c in range(8)]).reshape(-1, 8, 3)  # (I, 8, 3)
    world = (np.einsum("iab,icb->ica", transforms[:, :, :3], corners)
             + transforms[:, None, :, 3])
    return InstancedScene(
        merged=merged,
        roots=jnp.asarray(roots),
        instance_blas=jnp.asarray(instance_blas),
        world_from_object=jnp.asarray(transforms),
        object_from_world=jnp.asarray(inv),
        inst_lo=jnp.asarray(world.min(axis=1), jnp.float32),
        inst_hi=jnp.asarray(world.max(axis=1), jnp.float32),
        blas_tris=tuple(int(s.num_tris) for s in blas),
    )


@functools.partial(jax.jit, static_argnames=("c", "chunk"))
def _instance_candidates_impl(inst_lo, inst_hi, origin, direction, min_t,
                              max_t, *, c, chunk):
    def block(args):
        o, d, mint, maxt = args
        # NaN-free clamped reciprocal (finite huge instead of inf): a
        # zero direction component against a touching plane would give
        # 0 * inf = NaN through the slab test otherwise.
        big = jnp.where(d >= 0, 3.0e38, -3.0e38)
        rcp = jnp.where(d == 0.0, big, jnp.float32(1.0) / d)  # (chunk, 3)
        t0 = (inst_lo[None] - o[:, None]) * rcp[:, None]
        t1 = (inst_hi[None] - o[:, None]) * rcp[:, None]
        near = jnp.fmin(t0, t1)
        far = jnp.fmax(t0, t1)
        enter = jnp.fmax(jnp.fmax(near[..., 0], near[..., 1]),
                         jnp.fmax(near[..., 2], mint[:, None]))
        exit_ = jnp.fmin(jnp.fmin(far[..., 0], far[..., 1]),
                         jnp.fmin(far[..., 2], maxt[:, None]))
        hit = enter <= exit_  # (chunk, I)
        score = jnp.where(hit, enter, jnp.inf)
        iota = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
        idxs, ts = [], []
        # C passes of masked argmin: far cheaper on TPU than lax.top_k's
        # full sort over the instance axis.
        for _ in range(c):
            j = jnp.argmin(score, axis=1)
            v = jnp.min(score, axis=1)
            ok = jnp.isfinite(v)
            idxs.append(jnp.where(ok, j, -1).astype(jnp.int32))
            ts.append(v)
            score = jnp.where(iota == j[:, None], jnp.inf, score)
        # (c+1)-th entry distance: the exactness bound for the candidate
        # cap (rays whose best hit is farther must re-trace exhaustively).
        overflow = jnp.min(score, axis=1)
        return jnp.stack(idxs, axis=1), jnp.stack(ts, axis=1), overflow

    n = origin.shape[0]
    sh = (n // chunk, chunk)
    ci, ct, ov = jax.lax.map(block, (origin.reshape(sh + (3,)),
                                     direction.reshape(sh + (3,)),
                                     min_t.reshape(sh), max_t.reshape(sh)))
    return ci.reshape(n, -1), ct.reshape(n, -1), ov.reshape(n)


def _instance_candidates(iscene: InstancedScene, rays: Rays, c: int,
                         chunk: int = 16384):
    """Nearest-C instance candidates per ray by AABB entry distance.

    The TPU top level is not a pointer-chasing tree walk: a dense
    (rays x instances) slab pass in one fused dispatch (lax.map over ray
    chunks bounds the live (chunk, I) temporaries).

    Returns (cand_idx (N, C) i32 [-1 = none], cand_t (N, C) f32).
    """
    n = rays.count
    c = min(c, iscene.num_instances)
    chunk = min(chunk, max(1, n))
    pad = (-n) % chunk
    pad_one = lambda a, fill: (jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]) if pad else a)
    ci, ct, ov = _instance_candidates_impl(
        iscene.inst_lo, iscene.inst_hi,
        pad_one(jnp.asarray(rays.origin), 0.0),
        pad_one(jnp.asarray(rays.direction), 1.0),
        pad_one(jnp.asarray(rays.min_t), 0.0),
        pad_one(jnp.asarray(rays.max_t), 0.0),
        c=c, chunk=chunk)
    return ci[:n], ct[:n], ov[:n]


def trace_closest_instanced(
    iscene: InstancedScene,
    rays: Rays,
    max_candidates: int = 8,
    config: TraceConfig = TraceConfig(),
) -> tuple[Hits, Array]:
    """Closest-hit over an instanced scene.

    Returns (hits, instance_index (N,) i32, -1 on miss).  Hit vertex
    positions are in *object* space of the hit instance (use the instance
    transform for world-space shading); t/u/v/mesh/triangle follow the
    usual contract and t is a world-space distance.
    """
    n = rays.count
    cand_idx, cand_t, _ = _instance_candidates(iscene, rays,
                                               max_candidates)

    best = Hits(  # running best, start as all-miss
        hit=jnp.zeros((n,), bool),
        t=rays.max_t,
        u=jnp.zeros((n,), jnp.float32),
        v=jnp.zeros((n,), jnp.float32),
        mesh_index=jnp.full((n,), -1, jnp.int32),
        triangle_index=jnp.full((n,), -1, jnp.int32),
        vertex_position=jnp.zeros((n, 3, 3), jnp.float32),
        vertex_index=jnp.full((n, 3), -1, jnp.int32),
    )
    best_inst = jnp.full((n,), -1, jnp.int32)

    for slot in range(cand_idx.shape[1]):
        inst = cand_idx[:, slot]
        live = (inst >= 0) & (cand_t[:, slot] < best.t)
        if not bool(jnp.any(live)):
            break
        safe = jnp.clip(inst, 0, iscene.num_instances - 1)
        inv = jnp.take(iscene.object_from_world, safe, axis=0)  # (N,3,4)
        o = (jnp.einsum("nab,nb->na", inv[:, :, :3], rays.origin)
             + inv[:, :, 3])
        d = jnp.einsum("nab,nb->na", inv[:, :, :3], rays.direction)
        start = jnp.take(iscene.roots, jnp.take(iscene.instance_blas, safe))
        obj_rays = Rays(
            origin=o,
            direction=d,
            min_t=rays.min_t,
            max_t=jnp.where(live, best.t, 0.0),  # inactive rays do no work
        )
        h = _stack._trace_loop(
            iscene.merged, obj_rays, mode="closest", filter_fn=None,
            config=config, start_node=start)
        better = h.hit & (h.t < best.t) & live
        best = jax.tree.map(
            lambda new, old: jnp.where(
                better.reshape((-1,) + (1,) * (old.ndim - 1)), new, old),
            h, best)
        best_inst = jnp.where(better, inst, best_inst)

    return best, best_inst


# ---------------------------------------------------------------------------
# Packet-kernel instanced tracing: rays grouped by candidate instance so each
# 128-ray packet traverses a single BLAS root in its own object space.
# ---------------------------------------------------------------------------

class PackedInstancedScene(struct.PyTreeNode):
    iscene: InstancedScene
    packed: "object"  # PackedScene of the merged forest
    packed_roots: Array  # (B,) i32 packed node id per BLAS


def pack_instanced(iscene: InstancedScene, packed=None,
                   packed_roots=None) -> PackedInstancedScene:
    """Pack the merged BLAS forest for the packet kernel.

    packed/packed_roots: optional override tables (e.g. the host-SAH
    forest from builder.sah.build_sah_forest — static BLAS geometry
    traced many times benefits from the higher-quality topology exactly
    like flat static scenes do).  Must cover the same BLAS list in the
    same order; record contract (per-BLAS tri ids) is unchanged."""
    from rtk_tpu.trace.packed import pack_forest

    if packed is None:
        packed, packed_roots = pack_forest(iscene.merged,
                                           np.asarray(iscene.roots))
    elif packed_roots is None:
        raise ValueError("pack_instanced(packed=...) needs packed_roots")
    return PackedInstancedScene(
        iscene=iscene, packed=packed,
        packed_roots=jnp.asarray(np.asarray(packed_roots, np.int64),
                                 jnp.int32))


@functools.partial(jax.jit, static_argnames=())
def _object_rays(iscene_obw, rays_o, rays_d, inst_safe):
    inv = jnp.take(iscene_obw, inst_safe, axis=0)  # (N,3,4)
    o = jnp.einsum("nab,nb->na", inv[:, :, :3], rays_o) + inv[:, :, 3]
    d = jnp.einsum("nab,nb->na", inv[:, :, :3], rays_d)
    return o, d


def _one_round(packed, object_from_world, rays, best, best_inst,
               cand_col, cand_t_col, gidx, roots, interpret, unit):
    """One candidate round: gather the grouped rays, transform to object
    space, trace the merged BLAS, scatter improvements back.

    `best` is the slim running state dict (t, u, v, slot) — full hit
    records are materialised once after the last round, not per round.
    Rays whose candidate entry distance can no longer beat their current
    best get max_t = 0 (dead: their packets finish in a step or two) —
    the on-device replacement for the old host-synced liveness check."""
    from rtk_tpu.ops.pallas_trace import trace_packets

    n = rays.count
    num_inst = object_from_world.shape[0]
    safe_ray = jnp.clip(gidx, 0, n - 1)
    inst_of_slot = jnp.take(cand_col, safe_ray)
    o, d = _object_rays(
        object_from_world,
        jnp.take(rays.origin, safe_ray, axis=0),
        jnp.take(rays.direction, safe_ray, axis=0),
        jnp.clip(inst_of_slot, 0, num_inst - 1))
    btake = jnp.take(best["t"], safe_ray)
    live = (gidx >= 0) & (jnp.take(cand_t_col, safe_ray) < btake)
    grouped = Rays(
        origin=o,
        direction=d,
        min_t=jnp.take(rays.min_t, safe_ray),
        max_t=jnp.where(live, btake, 0.0),
    )
    h = trace_packets(packed, grouped, packet_roots=roots, pkt=unit,
                      interpret=interpret)
    improved = h.hit & (gidx >= 0) & (h.t < btake)
    tgt = jnp.where(improved, gidx, n)
    best = {k: best[k].at[tgt].set(v, mode="drop")
            for k, v in (("t", h.t), ("u", h.u), ("v", h.v),
                         ("slot", h.slot))}
    best_inst = best_inst.at[tgt].set(inst_of_slot, mode="drop")
    return best, best_inst


def _sorted_group(cand_col, cand_t_col, comps, n_bins, unit):
    """Sort-based per-round grouping (no big gathers — PERF_NOTES r2
    measured the take()-based version 30x off on TPU).

    comps: tuple of (n,) arrays to carry through the grouping (ray
    components, best-t, ...).  Appends n_bins*unit synthetic pad rows
    with runtime-assigned bins so every bin's run is whole packets, then
    ONE stable multi-operand sort lays out the grouped order.  Returns
    (idx (M,) original row id or >=n for pads, bin_of_slot (M,),
    sorted comps).  M = n + n_bins*unit, static."""
    n = cand_col.shape[0]
    npad = n_bins * unit
    valid = cand_col >= 0
    bin_r = jnp.where(valid, cand_col, n_bins).astype(jnp.int32)
    counts = jnp.bincount(bin_r, length=n_bins + 1)[:n_bins]
    need = ((-counts) % unit).astype(jnp.int32)
    cum = jnp.cumsum(need)
    j = jnp.arange(npad, dtype=jnp.int32)
    pad_bin = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    # key: bin in high bits, pads after real rays of the same bin
    key = jnp.concatenate([bin_r << 1, (pad_bin << 1) | 1])
    idx = jnp.arange(n + npad, dtype=jnp.int32)
    ext = [jnp.concatenate([c, jnp.zeros((npad,), c.dtype)])
           for c in comps]
    out = jax.lax.sort((key, idx, *ext), num_keys=1)
    key_s, idx_s, *comps_s = out
    return idx_s, (key_s >> 1), comps_s


def _unsort_merge(idx, n, fields):
    """Sort kernel outputs back to original row order by idx; returns the
    first n rows of each field (pads carry idx >= n and sink)."""
    out = jax.lax.sort((idx, *fields), num_keys=1)
    return [f[:n] for f in out[1:]]


def _instanced_packets_impl(packed, object_from_world, packed_roots,
                            inst_blas, inst_lo, inst_hi, origin, direction,
                            min_t, max_t, *, unit, M, C, n_inst, chunk,
                            interpret, leaf_loop=False, ordered=False,
                            p_pk=8, caps=None):
    """Candidates + all grouped rounds as ONE device program.

    Per round: sort rays into per-instance runs (padded to whole
    packets), transform to object space, trace with per-packet BLAS
    roots, sort results back, merge.  No host syncs and no large
    gathers.

    caps (static, optional): per-round row capacities.  Round s slices
    the grouped layout to caps[s] rows before transforming/tracing and
    scatters results back by row id — the r4 lesion showed the ROUND
    KERNELS at 64% of a C=12 trace while late rounds have few live
    rays, so full-width rounds burn the whole batch width every round.
    A live row beyond its round's cap (caps mis-sized) is marked
    unproven and lands in the caller's exactness residual — capping
    never drops a hit."""
    from rtk_tpu.ops.pallas_trace import trace_packets

    cand_idx, cand_t, overflow = _instance_candidates_impl(
        inst_lo, inst_hi, origin, direction, min_t, max_t, c=C,
        chunk=chunk)
    n = origin.shape[0]
    best = {
        "t": max_t,
        "u": jnp.zeros((n,), jnp.float32),
        "v": jnp.zeros((n,), jnp.float32),
        "slot": jnp.full((n,), -1, jnp.int32),
    }
    best_inst = jnp.full((n,), -1, jnp.int32)
    over_cap = jnp.zeros((n,), bool)
    live_counts = []  # per-round ACTUAL liveness (calibrate_round_caps)

    def round_body(s, best, best_inst, over_cap, cap):
        slim = cap is not None and cap * 8 <= M
        comps = (origin[:, 0], origin[:, 1], origin[:, 2],
                 direction[:, 0], direction[:, 1], direction[:, 2],
                 min_t, best["t"], cand_t[:, s])
        if slim:
            # Small round: sort only (key, idx) and gather the ray
            # components for the cap rows — a cap-row gather beats
            # carrying 9 extra full-width sort operands once the cap is
            # well under the batch width.
            idx_s, bin_s, _ = _sorted_group(
                jnp.where(cand_t[:, s] < best["t"], cand_idx[:, s], -1),
                cand_t[:, s], (), n_inst, unit)
        else:
            idx_s, bin_s, cs = _sorted_group(
                jnp.where(cand_t[:, s] < best["t"], cand_idx[:, s], -1),
                cand_t[:, s], comps, n_inst, unit)
        if cap is not None and cap < idx_s.shape[0]:
            if slim:
                safe_tail = jnp.clip(idx_s[cap:], 0, n - 1)
                cut_live = ((idx_s[cap:] < n) & (bin_s[cap:] < n_inst)
                            & (jnp.take(cand_t[:, s], safe_tail)
                               < jnp.take(best["t"], safe_tail)))
            else:
                cut_live = ((idx_s[cap:] < n) & (bin_s[cap:] < n_inst)
                            & (cs[8][cap:] < cs[7][cap:]))
            # Any real live row past the cap loses its trace: route it
            # to the residual (its bin sorts before the dead tail, so a
            # correctly sized cap never cuts one).
            over_cap = over_cap.at[
                jnp.where(cut_live, idx_s[cap:], n)].set(
                    True, mode="drop")
            idx_s = idx_s[:cap]
            bin_s = bin_s[:cap]
            if not slim:
                cs = [c[:cap] for c in cs]
        if slim:
            safe = jnp.clip(idx_s, 0, n - 1)
            cs = [jnp.take(c, safe) for c in comps]
        o0, o1, o2, d0, d1, d2, mnt, bt, ct = cs
        is_real = idx_s < n
        safe_bin = jnp.minimum(bin_s, n_inst - 1)
        inv = jnp.take(object_from_world, safe_bin, axis=0)  # (M,3,4)
        ow = jnp.stack([o0, o1, o2], axis=1)
        dw = jnp.stack([d0, d1, d2], axis=1)
        oo = jnp.einsum("nab,nb->na", inv[:, :, :3], ow) + inv[:, :, 3]
        od = jnp.einsum("nab,nb->na", inv[:, :, :3], dw)
        live = is_real & (bin_s < n_inst) & (ct < bt)
        grouped = Rays(origin=oo, direction=od, min_t=mnt,
                       max_t=jnp.where(live, bt, 0.0))
        roots = jnp.take(
            packed_roots,
            jnp.take(inst_blas, jnp.minimum(bin_s[::unit], n_inst - 1)))
        h = trace_packets(packed, grouped, packet_roots=roots, pkt=unit,
                          interpret=interpret, leaf_loop=leaf_loop,
                          ordered=ordered, p_pk=p_pk)
        if cap is not None:
            # Scatter-merge by row id: the capped rows no longer span
            # the batch, so the full-width unsort sort is both wasted
            # and wrong-shaped.  Improvements target their original ray
            # row; everything else targets n (dropped).
            improved = h.hit & (h.t < bt) & live
            tgt = jnp.where(improved, idx_s, n)
            best = {k: best[k].at[tgt].set(v, mode="drop")
                    for k, v in (("t", h.t), ("u", h.u), ("v", h.v),
                                 ("slot", h.slot))}
            best_inst = best_inst.at[tgt].set(bin_s, mode="drop")
            return best, best_inst, over_cap
        ht, hu, hv, hs, binb = _unsort_merge(
            idx_s, n, (h.t, h.u, h.v, h.slot, bin_s))
        improved = (hs >= 0) & (ht < best["t"])
        best = {
            "t": jnp.where(improved, ht, best["t"]),
            "u": jnp.where(improved, hu, best["u"]),
            "v": jnp.where(improved, hv, best["v"]),
            "slot": jnp.where(improved, hs, best["slot"]),
        }
        best_inst = jnp.where(improved, binb, best_inst)
        return best, best_inst, over_cap

    for s in range(C):
        # Pre-sort liveness: a candidate whose AABB entry is already past
        # the ray's best hit will be masked dead after the sort anyway —
        # binning it as dead HERE keeps it out of the instance runs, so
        # later rounds' packets hold only rays that still need tracing
        # (bounce batches resolve mostly in round 0).  Rounds with ZERO
        # live candidates skip entirely at runtime (lax.cond): most rays
        # prove within their first 1-2 candidates, so a C sized for the
        # scene's p99 overlap depth costs only the rounds that matter —
        # without the skip, every extra round paid two full-width
        # multi-operand sorts + a kernel dispatch (r4: the instanced
        # config's cost was exactly these empty rounds).
        cap = None if caps is None else min(int(caps[s]), M)
        n_live = jnp.sum((cand_t[:, s] < best["t"]).astype(jnp.int32))
        live_counts.append(n_live)
        best, best_inst, over_cap = jax.lax.cond(
            n_live > 0,
            lambda b, bi, oc, s=s, cap=cap: round_body(s, b, bi, oc, cap),
            lambda b, bi, oc: (b, bi, oc),
            best, best_inst, over_cap)
    # A ray whose (C+1)-th instance-AABB entry is still closer than its
    # best hit is unproven; the caller re-traces those exhaustively.
    # over_cap rays lost a round to their cap and are unproven too.
    unproven = (overflow < best["t"]) | over_cap
    return best, best_inst, unproven, jnp.stack(live_counts)


@functools.lru_cache(maxsize=None)
def _instanced_packets_jit(interpret: bool, tpu: bool, unit: int, M: int,
                           C: int, n_inst: int, chunk: int,
                           leaf_loop: bool = False, ordered: bool = False,
                           p_pk: int = 8, caps=None):
    # See _instanced_rounds_jit note in r1: many per-round ray blocks trip
    # the default 16 MB scoped-vmem budget; v5e has 128 MB.
    opts = {"xla_tpu_scoped_vmem_limit_kib": 120 * 1024} if tpu else None
    return jax.jit(
        functools.partial(_instanced_packets_impl, unit=unit, M=M, C=C,
                          n_inst=n_inst, chunk=chunk, interpret=interpret,
                          leaf_loop=leaf_loop, ordered=ordered, p_pk=p_pk,
                          caps=caps),
        compiler_options=opts)


def _residual_exhaustive(pscene, rays, best, best_inst, unproven):
    """Exhaustive candidate rounds over ALL instances for unproven rays,
    via the XLA stack engine (eager, early-breaking python loop — the
    residual batch is small by construction)."""
    iscene = pscene.iscene
    packed = pscene.packed
    n = rays.count
    n_inst = iscene.num_instances
    cand_idx, cand_t, _ = _instance_candidates(iscene, rays, n_inst)
    inv = jnp.zeros((packed.tri_perm.shape[0],), jnp.int32).at[
        packed.tri_perm].set(jnp.arange(packed.tri_perm.shape[0],
                                        dtype=jnp.int32))
    cfg = TraceConfig()
    best_t = best["t"]
    for s_ in range(cand_idx.shape[1]):
        inst = cand_idx[:, s_]
        live = unproven & (inst >= 0) & (cand_t[:, s_] < best_t)
        if not bool(jnp.any(live)):
            break
        safe = jnp.clip(inst, 0, n_inst - 1)
        inv_m = jnp.take(iscene.object_from_world, safe, axis=0)
        o = (jnp.einsum("nab,nb->na", inv_m[:, :, :3], rays.origin)
             + inv_m[:, :, 3])
        d = jnp.einsum("nab,nb->na", inv_m[:, :, :3], rays.direction)
        start = jnp.take(iscene.roots, jnp.take(iscene.instance_blas, safe))
        obj_rays = Rays(origin=o, direction=d, min_t=rays.min_t,
                        max_t=jnp.where(live, best_t, 0.0))
        h, sorted_slot = _stack._trace_loop(
            iscene.merged, obj_rays, mode="closest", filter_fn=None,
            config=cfg, start_node=start, return_slot=True)
        better = h.hit & (h.t < best_t) & live
        best_t = jnp.where(better, h.t, best_t)
        best["u"] = jnp.where(better, h.u, best["u"])
        best["v"] = jnp.where(better, h.v, best["v"])
        pslot = jnp.take(inv, jnp.clip(sorted_slot, 0,
                                       inv.shape[0] - 1))
        best["slot"] = jnp.where(better, pslot, best["slot"])
        best_inst = jnp.where(better, inst, best_inst)
    best["t"] = best_t
    return best, best_inst


def trace_closest_instanced_packets(
    pscene: PackedInstancedScene,
    rays: Rays,
    max_candidates: int = 8,
    interpret: bool = False,
    exact: bool = True,
    leaf_loop: bool = False,
    ordered: bool = False,
    p_pk: int = 8,
    round_caps=None,
    return_live_counts: bool = False,
    unit: int | None = None,
) -> tuple[Hits, Array]:
    """Closest-hit over an instanced scene using the Pallas packet kernel.

    Per candidate round, live rays are grouped by instance ON DEVICE
    (sort + searchsorted ranks + padded scatter), padded to 128-ray
    packets sharing that instance's BLAS root, transformed to object
    space, and traced with per-packet roots.  Candidates, grouping and
    all rounds fuse into one device program with zero host syncs.
    """
    from rtk_tpu.ops.pallas_trace import PKT
    from rtk_tpu.types import PacketHits

    iscene = pscene.iscene
    n = rays.count
    # Packet unit: per-instance ray groups pad to whole packets.  Unlike
    # flat scenes (where wider packets win with batch size), instanced
    # traversal stays union-footprint-bound — a 512-ray per-instance
    # packet spans most of its object and measured 20-30% SLOWER than
    # 128 at 512^2..1024^2 (pre-ordered/prune; unit= lets callers
    # re-probe under newer flags); default keeps the narrow unit.
    unit = PKT if unit is None else int(unit)
    n_inst = iscene.num_instances
    C = min(max_candidates, n_inst)
    chunk = min(16384, max(1, n))
    pad = (-n) % chunk
    np_ = n + pad

    def padded(a, fill):
        if pad == 0:
            return jnp.asarray(a)
        a = jnp.asarray(a)
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])

    # Static grouped size: every ray + <= unit-1 padding per nonempty
    # instance run, rounded to whole kernel blocks (p_pk packets each).
    blk = p_pk * unit
    M = (np_ + n_inst * unit + blk - 1) // blk * blk

    if round_caps == "auto":
        # Size each round's kernel width from the batch's actual
        # candidate-rank population (r5: full-width rounds were 64% of
        # the trace while late ranks hold a few % of rays).  One extra
        # candidates dispatch + a C-int readback; counts ignore best-t
        # evolution so they upper-bound every round's live set, and
        # pow2-of-block quantisation bounds the compile variants.
        ci, ct, _ = _instance_candidates(pscene.iscene, rays, C)
        cnt = np.asarray(jnp.sum(
            (ci >= 0) & (ct < jnp.asarray(rays.max_t)[:, None]), axis=0))
        caps = []
        for s in range(C):
            need = int(cnt[s]) + unit * min(int(cnt[s]), n_inst)
            q = blk
            while q < need:
                q *= 2
            caps.append(min(q, M))
        round_caps = tuple(caps)
    elif round_caps is not None:
        round_caps = tuple(int(c_) for c_ in round_caps)
        if len(round_caps) != C:
            raise ValueError(f"round_caps needs {C} entries")

    fn = _instanced_packets_jit(interpret, jax.default_backend() == "tpu",
                                unit, M, C, n_inst, chunk,
                                leaf_loop=leaf_loop, ordered=ordered,
                                p_pk=p_pk, caps=round_caps)
    best, best_inst, unproven, live_counts = fn(
        pscene.packed, iscene.object_from_world, pscene.packed_roots,
        iscene.instance_blas, iscene.inst_lo, iscene.inst_hi,
        padded(rays.origin, 0.0), padded(rays.direction, 1.0),
        padded(rays.min_t, 0.0), padded(rays.max_t, 0.0))
    if pad:
        best = {k: v[:n] for k, v in best.items()}
        best_inst = best_inst[:n]
        unproven = unproven[:n]

    if exact:
        # Exactness residual: rays the C-candidate cap cannot prove get an
        # exhaustive re-trace (all-instance candidates through the XLA
        # stack path, which exposes its internal sorted slot -> mapped to
        # a packed slot so the lazy PacketHits record stays consistent).
        # One scalar host sync.  The residual is COMPACTED first (r4):
        # the stack engine's per-round cost scales with the ray-array
        # width whether lanes are live or not, and an un-compacted
        # residual at 30% unproven (bench instanced camera, overlap
        # depth p90=9 > C=4) measured ~98 s per 262k-ray trace — the
        # whole-batch rounds were the entire cost.
        unp = np.asarray(unproven)
        idx = np.flatnonzero(unp)
        n_res = idx.size
        if n_res:
            # Pad the compacted batch to a power of two so repeated
            # traces reuse one compiled residual program per bucket
            # (the stack engine jits per shape; an exact-size batch
            # would recompile on every call).  Pad rays are dead
            # (max_t=0) and their scatter-back is masked off.
            # Cap at the full batch width: pow2 rounding can otherwise
            # exceed n (n_res just over n/2 on a non-pow2 batch), making
            # the "compacted" residual wider than the uncompacted one.
            m_res = min(max(256, 1 << (n_res - 1).bit_length()), max(n, 256))
            # Pad entries index out of bounds: gathers clip (their rows
            # are dead via max_t=0), scatters drop them — no duplicate-
            # index race against real rows.
            pad_idx = np.full(m_res, n, np.int64)
            pad_idx[:n_res] = idx
            idxj = jnp.asarray(pad_idx, jnp.int32)
            livep = jnp.asarray(np.arange(m_res) < n_res)
            gat = lambda a: jnp.asarray(a)[jnp.minimum(idxj, n - 1)]
            rays_r = Rays(origin=gat(rays.origin),
                          direction=gat(rays.direction),
                          min_t=gat(rays.min_t),
                          max_t=jnp.where(livep, gat(rays.max_t), 0.0))
            best_r = {k: gat(v) for k, v in best.items()}
            best_r, bi_r = _residual_exhaustive(
                pscene, rays_r, best_r, gat(best_inst), livep)
            best = {k: v.at[idxj].set(best_r[k], mode="drop")
                    for k, v in best.items()}
            best_inst = best_inst.at[idxj].set(bi_r, mode="drop")

    packed = pscene.packed
    hits = PacketHits(
        hit=best["slot"] >= 0,
        t=best["t"],
        u_k=best["u"],
        v_k=best["v"],
        slot=best["slot"],
        # World rays: position() yields the world-space hit point (t is a
        # world-space distance).  vertex_position stays in the hit
        # instance's object space — see the docstring.
        origin=jnp.asarray(rays.origin),
        direction=jnp.asarray(rays.direction),
        tri_v=packed.tri_v,
        tri_vidx=packed.tri_vidx,
        tri_mesh=packed.tri_mesh,
        tri_prim=packed.tri_prim,
    )
    if return_live_counts:
        # (hits, inst, per-round live counts): calibration callers need
        # the hits too (e.g. a wavefront generating its bounce batches
        # while collecting counts for a shared caps tuple).
        return hits, best_inst, live_counts
    return hits, best_inst


def calibrate_round_caps(pscene: PackedInstancedScene, rays: Rays,
                         max_candidates: int = 8, margin: float = 1.5,
                         p_pk: int = 8, unit: int | None = None, **kw):
    """Measure per-round ACTUAL liveness on a sample batch and derive
    round_caps for subsequent traces (the grid engine's calibrate_caps
    pattern).

    The 'auto' caps bound each round by its candidate-rank population,
    but a ray's rank-s AABB overlap counts whether or not an earlier
    candidate already resolved it — on the bench camera that bound
    barely shrinks (inst4 probe: 957 -> 911 ms).  True round liveness
    (cand_t[s] < best_t as best evolves) collapses much faster; this
    runs one uncapped trace that also reports those counts and sizes
    caps at margin x measured (pow2-of-block).  A hotter later batch
    only loses rows to the exactness residual, never hits.
    """
    from rtk_tpu.ops.pallas_trace import PKT

    _, _, counts = trace_closest_instanced_packets(
        pscene, rays, max_candidates=max_candidates, p_pk=p_pk,
        return_live_counts=True, unit=unit, **kw)
    return caps_from_counts(np.asarray(counts), rays.count,
                            pscene.iscene.num_instances, margin=margin,
                            p_pk=p_pk, unit=unit)


def caps_from_counts(counts, n: int, n_inst: int, margin: float = 1.5,
                     p_pk: int = 8, unit: int | None = None):
    """round_caps tuple from measured per-round live counts (callers that
    pool counts across several batches — e.g. a wavefront sharing ONE
    fused-program compile across its bounces — take an elementwise max
    first)."""
    from rtk_tpu.ops.pallas_trace import PKT

    unit = PKT if unit is None else int(unit)
    blk = p_pk * unit
    chunk = min(16384, max(1, n))
    np_ = n + ((-n) % chunk)
    M = (np_ + n_inst * unit + blk - 1) // blk * blk
    caps = []
    for c in counts:
        need = int(int(c) * margin) + unit * min(int(c), n_inst)
        q = blk
        while q < need:
            q *= 2
        caps.append(min(q, M))
    return tuple(caps)
