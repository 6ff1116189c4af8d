"""Observability: build/trace statistics and the logging callback.

The reference's only observability is a printf-style user callback invoked
at phase starts and per node (rtk.h:95,102-103; rtk.c:686-696).  Here the
callback contract is preserved (log_fn(user, build, str)) and extended with
structured statistics: tree shape and SAH cost after a build, step counts
and throughput for traces.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import numpy as np


class BuildLogger:
    """Parity: rtk_log_fn (rtk.h:95) — log_fn(user, build, message)."""

    def __init__(self, log_fn: Optional[Callable] = None, user=None,
                 build=None):
        self.log_fn = log_fn
        self.user = user
        self.build = build

    def log(self, message: str):
        if self.log_fn is not None:
            self.log_fn(self.user, self.build, message)


@dataclasses.dataclass
class SceneStats:
    """Structural statistics of a built Scene."""

    num_tris: int
    num_leaves: int
    num_wide_nodes: int  # reachable wide nodes
    max_depth: int
    avg_leaf_occupancy: float  # triangles per leaf / leaf_size
    avg_child_occupancy: float  # non-empty slots per reachable wide node
    sah_cost: float  # sum over nodes of child_area/root_area (trace cost proxy)

    def __str__(self):
        return (
            f"tris={self.num_tris} leaves={self.num_leaves} "
            f"wide_nodes={self.num_wide_nodes} depth={self.max_depth} "
            f"leaf_occ={self.avg_leaf_occupancy:.2f} "
            f"child_occ={self.avg_child_occupancy:.2f} "
            f"sah={self.sah_cost:.1f}"
        )


def log_build(scene, logger: "BuildLogger",
              per_node: bool = False) -> SceneStats:
    """Per-level build log through the rtk-style callback: the fused
    device build has no per-node callback site (rtk.c:1426 logs per
    node), so the equivalent observability is a post-build walk emitting
    one line per depth level plus the structural summary.

    per_node=True restores the reference's one-line-per-node frequency
    (node id, depth, live child slots, leaf slots) from the same walk —
    opt-in, since it is O(nodes) host formatting."""
    st = scene_stats(scene)
    logger.log(f"build: {st.num_tris} tris -> {st.num_wide_nodes} wide "
               f"nodes, {st.num_leaves} leaves, depth {st.max_depth}")
    child = np.asarray(scene.node_child)
    counts = {}
    stack = [(0, 1)]
    while stack:
        node, depth = stack.pop()
        counts[depth] = counts.get(depth, 0) + 1
        if per_node:
            slots = child[node]
            n_int = int((slots >= 0).sum())
            n_leaf = int((slots <= -2).sum())
            logger.log(f"build: node {node} depth {depth}: "
                       f"{n_int} children, {n_leaf} leaves")
        for s_ in child[node]:
            if s_ >= 0:
                stack.append((int(s_), depth + 1))
    for depth in sorted(counts):
        logger.log(f"build: level {depth}: {counts[depth]} nodes")
    logger.log(f"build: SAH cost {st.sah_cost:.2f}, child occupancy "
               f"{st.avg_child_occupancy:.2f}, leaf occupancy "
               f"{st.avg_leaf_occupancy:.2f}")
    return st


def scene_stats(scene) -> SceneStats:
    """Walk the wide tree (host-side) and report shape/cost statistics."""
    child = np.asarray(scene.node_child)
    cmin = np.asarray(scene.node_min)
    cmax = np.asarray(scene.node_max)

    def area(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                      + d[..., 2] * d[..., 0])

    root_lo = np.asarray(scene.bounds_min)
    root_hi = np.asarray(scene.bounds_max)
    root_area = max(float(area(root_lo, root_hi)), 1e-20)

    seen_nodes = 0
    occupancy = 0
    sah = 0.0
    max_depth = 0
    stack = [(0, 1)]
    while stack:
        node, depth = stack.pop()
        seen_nodes += 1
        max_depth = max(max_depth, depth)
        slots = child[node]
        live = 0
        for w, s in enumerate(slots):
            if s == -1:
                continue
            live += 1
            sah += float(area(cmin[node, w], cmax[node, w])) / root_area
            if s >= 0:
                stack.append((int(s), depth + 1))
        occupancy += live
    return SceneStats(
        num_tris=scene.num_tris,
        num_leaves=scene.num_leaves,
        num_wide_nodes=seen_nodes,
        max_depth=max_depth,
        avg_leaf_occupancy=scene.num_tris / max(
            scene.num_leaves * scene.leaf_size, 1),
        avg_child_occupancy=occupancy / max(seen_nodes, 1),
        sah_cost=sah,
    )


@dataclasses.dataclass
class TraceStats:
    rays: int
    seconds: float
    mrays_per_s: float
    steps_per_block: Optional[float] = None  # packet engine only

    def __str__(self):
        extra = (f" steps/block={self.steps_per_block:.0f}"
                 if self.steps_per_block else "")
        return f"{self.rays} rays in {self.seconds*1e3:.2f} ms = " \
               f"{self.mrays_per_s:.2f} Mrays/s{extra}"


def measure_trace(tracer, rays, iters: int = 5, mode: str = "closest",
                  with_steps: bool = False) -> TraceStats:
    """Time a trace through a Tracer; optionally collect kernel step counts.

    Measurement hazards (PERF_NOTES r3): repeated IDENTICAL dispatches
    can be served from the remote runtime's result cache, and
    block_until_ready has been observed returning at enqueue — so each
    timed call perturbs min_t by a dead epsilon and the loop syncs with
    a real 1-element readback."""
    import jax
    import jax.numpy as jnp

    from rtk_tpu.types import Rays

    run = tracer.closest if mode == "closest" else tracer.any
    base = jnp.asarray(rays.min_t)
    varied = [Rays(origin=rays.origin, direction=rays.direction,
                   min_t=base + jnp.float32(1e-7) * (i + 1),
                   max_t=rays.max_t) for i in range(iters)]
    hits = run(rays)
    np.asarray(hits.t[:1])
    t0 = time.perf_counter()
    for i in range(iters):
        hits = run(varied[i])
    np.asarray(hits.t[:1])
    dt = (time.perf_counter() - t0) / iters

    steps = None
    if with_steps and tracer.engine == "packet":
        from rtk_tpu.ops import pallas_trace as pt
        import jax.numpy as jnp

        packed = tracer.packed
        n = rays.count
        pad = (-n) % (pt.DEFAULT_P * pt.PKT)
        npad = n + pad

        def comp(a, fill):
            a = jnp.asarray(a)
            if pad:
                a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
            return a.reshape(npad // pt.PKT, pt.PKT)

        comps = (comp(rays.origin[:, 0], 0.), comp(rays.origin[:, 1], 0.),
                 comp(rays.origin[:, 2], 0.),
                 comp(rays.direction[:, 0], 1.),
                 comp(rays.direction[:, 1], 0.),
                 comp(rays.direction[:, 2], 0.),
                 comp(rays.min_t, 0.), comp(rays.max_t, 0.))
        roots = jnp.zeros((npad // pt.PKT,), jnp.int32)
        qmask = jnp.full((1,), 0xFFFFFF, jnp.int32)
        out = pt._run_kernel(packed.nodes, packed.tris, comps, roots,
                             qmask,
                             mode=mode, watertight=True,
                             interpret=jax.default_backend() != "tpu",
                             num_tris=packed.num_tris,
                             leaf_size=packed.leaf_size, stats=True)
        steps = float(np.asarray(out[4])[::pt.DEFAULT_P, 0].mean())
    return TraceStats(rays=rays.count, seconds=dt,
                      mrays_per_s=rays.count / dt / 1e6,
                      steps_per_block=steps)


# ---------------------------------------------------------------------------
# Profiler integration (SURVEY §5: "jax.profiler traces + per-kernel
# timing" — the planned-but-missing piece flagged in VERDICT r1).
# ---------------------------------------------------------------------------

import contextlib


@contextlib.contextmanager
def profiler_trace(log_dir: str, annotation: Optional[str] = None):
    """Capture a jax.profiler trace of everything inside the block.

    Wraps jax.profiler.trace (works on CPU and TPU; view with
    TensorBoard or xprof).  Optionally nests a TraceAnnotation so the
    enclosed dispatches are grouped under one label.
    """
    import jax

    with jax.profiler.trace(log_dir):
        if annotation is None:
            yield
        else:
            with jax.profiler.TraceAnnotation(annotation):
                yield


def annotate(name: str):
    """Decorator: group a function's device dispatches under `name` in
    profiler traces (jax.profiler.annotate_function)."""
    import jax

    def wrap(fn):
        return jax.profiler.annotate_function(fn, name=name)

    return wrap
