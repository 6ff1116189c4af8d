"""Multi-chip scaling: rays data-parallel over the device mesh.

The reference scales queries only via host threads over a shared immutable
scene blob (rtk.c:543-577 is pure w.r.t. the scene; SURVEY §2 parallelism
table).  The TPU equivalent: the scene pytree is replicated across chips,
rays are sharded along their batch axis with `shard_map`, and every chip
runs its own traversal loop independently — no collectives on the hot path
(the analogue of rtk's zero-synchronisation query parallelism).  Collectives
only appear in reductions the caller asks for (e.g. hit counts).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rtk_tpu.config import TraceConfig
from rtk_tpu.scene import Scene
from rtk_tpu.trace import stack as _stack
from rtk_tpu.types import Hits, Rays


def default_mesh(devices=None, axis_name: str = "rays") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


def _pad_rays(rays: Rays, multiple: int):
    n = rays.count
    pad = (-n) % multiple
    if pad == 0:
        return rays, n
    padded = Rays(
        origin=jnp.concatenate(
            [rays.origin, jnp.zeros((pad, 3), jnp.float32)], axis=0),
        direction=jnp.concatenate(
            [rays.direction, jnp.ones((pad, 3), jnp.float32)], axis=0),
        min_t=jnp.concatenate(
            [rays.min_t, jnp.zeros((pad,), jnp.float32)], axis=0),
        max_t=jnp.concatenate(
            [rays.max_t, jnp.zeros((pad,), jnp.float32)], axis=0),
    )
    return padded, n


def trace_sharded(
    scene: Scene,
    rays: Rays,
    mesh: Optional[Mesh] = None,
    mode: str = "closest",
    filter_fn: Optional[Callable] = None,
    config: TraceConfig = TraceConfig(),
) -> Hits:
    """Trace a ray batch sharded across the chip mesh (scene replicated).

    Rays are padded to a multiple of the mesh size (padding rays get
    max_t = 0 so they immediately finish), traced independently per chip
    under shard_map, and the Hits are returned in the caller's layout.
    """
    if mesh is None:
        mesh = default_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    padded, n = _pad_rays(rays, n_dev)

    def local_trace(scene_local, rays_local):
        return _stack._trace_loop(
            scene_local, rays_local, mode=mode, filter_fn=filter_fn,
            config=config)

    sharded = jax.shard_map(
        local_trace,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    hits = jax.jit(sharded)(scene, padded)
    if padded.count != n:
        hits = jax.tree.map(lambda a: a[:n], hits)
    return hits


def trace_closest_sharded(scene, rays, mesh=None, filter_fn=None,
                          config=TraceConfig()):
    return trace_sharded(scene, rays, mesh, "closest", filter_fn, config)


def trace_any_sharded(scene, rays, mesh=None, filter_fn=None,
                      config=TraceConfig()):
    return trace_sharded(scene, rays, mesh, "any", filter_fn, config)


def trace_packets_sharded(
    packed,
    rays: Rays,
    mesh: Optional[Mesh] = None,
    mode: str = "closest",
    watertight: bool = True,
    interpret: bool = False,
    pkt: Optional[int] = None,
    dual: bool = False,
    sort_rays: Optional[bool] = None,
) -> Hits:
    """Sharded trace on the Pallas packet engine (PackedScene replicated).

    The per-chip program is the same fused sort->kernel->unsort dispatch as
    trace_packets; shard_map only splits the ray batch, so scaling is
    embarrassingly parallel over ICI exactly like host-thread query
    parallelism in the reference (rtk.c:543-577 purity).
    """
    from rtk_tpu.ops.pallas_trace import trace_packets
    from rtk_tpu.types import PacketHits

    if mesh is None:
        mesh = default_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    padded, n = _pad_rays(rays, n_dev)

    def local_trace(packed_local, rays_local):
        return trace_packets(
            packed_local, rays_local, mode=mode, watertight=watertight,
            interpret=interpret, pkt=pkt, dual=dual, sort_rays=sort_rays)

    # PacketHits is lazy: per-ray leaves shard over the ray axis, the packed
    # triangle tables it carries stay replicated (identical on every chip).
    out_specs = PacketHits(
        hit=P(axis), t=P(axis), u=P(axis), v=P(axis), slot=P(axis),
        origin=P(axis), direction=P(axis),
        tri_v=P(), tri_vidx=P(), tri_mesh=P(), tri_prim=P())
    sharded = jax.shard_map(
        local_trace,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=out_specs,
        check_vma=False,
    )
    hits = jax.jit(sharded)(packed, padded)
    if padded.count != n:
        hits = hits[:n]
    return hits
