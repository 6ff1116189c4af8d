"""Tracer: engine-selecting front-end over a built Scene.

Two interchangeable traversal engines implement the same hit-record
contract (rtk_trace_ray semantics, rtk.c:543-577):

  * "packet": the Pallas TPU packet kernel (ops/pallas_trace.py) — the fast
    path for branching-8 scenes on TPU; scene tables are packed once and
    cached on this object.
  * "stack": the pure-XLA lockstep traversal (trace/stack.py) — runs on any
    backend, any branching, and supports filter callables.
  * "binned": the packet kernel behind a re-binning front-end — DEMOTED
    to rtk_tpu/testing/binned.py in r4: it loses to the flat packet
    engine on every recorded TPU bounce measurement (0.13-0.20 vs
    1.03+ Mrays/s) and is superseded by "grid" as a re-binning design;
    kept importable as a correctness/reference path.
  * "grid"/"march": the macro-grid DDA engine — DEMOTED to
    rtk_tpu/testing/grid.py in r5: both its rounds form (0.46-0.48)
    and the fused in-kernel march (0.40-0.43) lose to the flat engine
    (1.77) on every recorded TPU bounce measurement.  Kept importable
    and selectable as a correctness/reference design (disjoint-cell
    re-binning, exact-by-construction march); the flat packet engine
    is the product incoherent path.

"auto" picks packet on TPU when eligible and falls back to stack otherwise
(including any call that passes a filter, which must trace arbitrary user
code — only the XLA engine can do that).
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import jax

from rtk_tpu.config import TraceConfig
from rtk_tpu.scene import Scene
from rtk_tpu.types import Hits, PacketHits, Rays

# The packet engine returns a lazy PacketHits; the XLA engines return an
# eager Hits.  Both satisfy the same hit-record property surface, but the
# pytree structures differ (PacketHits carries ray + triangle-table
# leaves) — call .full() on a PacketHits if you need the stable Hits
# pytree for jax.tree.map.
AnyHits = Union[Hits, PacketHits]


def jit_filter(fn: Callable) -> Callable:
    """Mark a filter callable as jax-traceable so the Tracer keeps it on
    the packet fast path (rtk_filter_fn intent, rtk.h:117,130).

    The predicate receives a HitCandidate (trace/stack.py) of array tiles
    — t, u, v, mesh_index, triangle_index, ray_index — and must return a
    bool mask using only jax-traceable ops; it is inlined into the packet
    kernel's leaf phase (each distinct function compiles its own kernel).
    Unmarked callables keep routing to the XLA stack engine, which can
    trace arbitrary Python.
    """
    fn.jittable = True
    return fn


class Tracer:
    def __init__(self, scene: Scene, engine: str = "auto",
                 config: TraceConfig = TraceConfig(), tri_mask=None):
        """tri_mask: optional (num_tris,) uint32 per-triangle filter bits
        (soup order, 24 bits).  Queries passing filter_mask=m then test
        only triangles with (tri_mask & m) != 0 on the packet fast path —
        the built-in filter family; arbitrary filter_fn callables still
        route to the XLA stack engine (rtk.h:117,130)."""
        if engine not in ("auto", "packet", "stack", "stackless",
                          "binned", "grid", "march"):
            raise ValueError(f"unknown engine {engine!r}")
        self.scene = scene
        self.config = config
        self.tri_mask = tri_mask
        self._packed = None
        self._stackless = None
        self._grid = None
        on_tpu = jax.default_backend() == "tpu"
        eligible = scene.branching == 8
        if engine == "packet" and not eligible:
            raise ValueError("packet engine requires branching=8 scenes")
        self.engine = (
            engine if engine != "auto"
            else ("packet" if (on_tpu and eligible) else "stack")
        )

    @property
    def packed(self):
        if self._packed is None:
            from rtk_tpu.trace.packed import pack_scene

            self._packed = pack_scene(self.scene, tri_mask=self.tri_mask)
        return self._packed

    def refresh(self, scene: Scene) -> "Tracer":
        """Rebind to a refit Scene (same topology): repacks bounds only."""
        t = Tracer.__new__(Tracer)
        t.scene = scene
        t.config = self.config
        t.tri_mask = self.tri_mask
        t.engine = self.engine
        t._packed = None
        t._stackless = None
        t._grid = None  # grid topology depends on bounds; rebuild
        if self._packed is not None:
            from rtk_tpu.trace.packed import repack_bounds

            t._packed = repack_bounds(self._packed, scene)
        return t

    def _trace(self, rays: Rays, mode: str,
               filter_fn: Optional[Callable],
               coherent: Optional[bool] = None,
               filter_mask: Optional[int] = None) -> AnyHits:
        packet_filter_ok = (filter_fn is None
                            or getattr(filter_fn, "jittable", False))
        if self.engine == "packet" and packet_filter_ok:
            from rtk_tpu.ops.pallas_trace import trace_packets

            dual = self.config.dual_queues
            if dual is None:
                # Split-queue stepping wins on divergent (incoherent)
                # batches; callers that know their batch is a bounce pass
                # coherent=False.
                dual = coherent is False
            # Measured-default kernel flags (PERF_NOTES r4): the chunked
            # leaf phase pays everywhere lane-aligned leaves allow it
            # (headline +5%, bounce +26%, refit -39% with defer_uv), and
            # near-to-far ordering + stale-subtree pruning pays on
            # divergent dual batches (bounce 1.29 -> 1.43).  Both are
            # bit-exact.
            leaf_loop = self.scene.leaf_size % 8 == 0
            kw = {}
            if self.config.pkt is not None:
                kw["pkt"] = self.config.pkt
            if self.config.packets_per_block is not None:
                kw["p_pk"] = self.config.packets_per_block
            return trace_packets(self.packed, rays, mode=mode,
                                 watertight=self.config.watertight,
                                 dual=dual, filter_mask=filter_mask,
                                 filter_fn=filter_fn,
                                 leaf_loop=leaf_loop, ordered=dual,
                                 defer_uv=self.config.defer_uv,
                                 interpret=jax.default_backend() != "tpu",
                                 **kw)
        if filter_mask is not None and self.engine not in ("binned", "grid",
                                                           "march"):
            raise ValueError(
                "filter_mask runs on the packet-kernel engines only "
                "(packet/binned/grid/march); use filter_fn on the stack "
                "engine")
        if self.engine == "march" and filter_fn is None:
            from rtk_tpu.testing.grid import (build_grid_from_scene,
                                            trace_packets_march)

            if self._grid is None or self._grid.cells_march is None:
                self._grid = build_grid_from_scene(self.scene,
                                                   packed=self.packed,
                                                   tri_mask=self.tri_mask,
                                                   march=True)
            return trace_packets_march(
                self._grid, rays, mode=mode,
                watertight=self.config.watertight,
                filter_mask=filter_mask,
                interpret=jax.default_backend() != "tpu")
        if self.engine == "binned" and filter_fn is None:
            from rtk_tpu.testing.binned import trace_packets_binned

            return trace_packets_binned(
                self.packed, rays, mode=mode,
                watertight=self.config.watertight,
                filter_mask=filter_mask,
                interpret=jax.default_backend() != "tpu")
        if self.engine == "grid" and filter_fn is None:
            from rtk_tpu.testing.grid import (build_grid_from_scene,
                                            trace_packets_grid)

            if self._grid is None:
                # self.packed already carries the tri_mask column; the
                # per-cell tables need it packed in too.
                self._grid = build_grid_from_scene(self.scene,
                                                   packed=self.packed,
                                                   tri_mask=self.tri_mask)
            return trace_packets_grid(
                self._grid, rays, mode=mode,
                watertight=self.config.watertight,
                filter_mask=filter_mask,
                interpret=jax.default_backend() == "cpu")
        if self.engine == "stackless" and filter_fn is None:
            from rtk_tpu.trace.stackless import build_stackless, trace_stackless

            if self._stackless is None:
                self._stackless = build_stackless(self.scene)
            return trace_stackless(self._stackless, rays, mode=mode,
                                   watertight=self.config.watertight)
        from rtk_tpu.trace import stack as _stack

        fn = _stack.trace_closest if mode == "closest" else _stack.trace_any
        return fn(self.scene, rays, filter_fn=filter_fn, config=self.config)

    def closest(self, rays: Rays, filter_fn: Optional[Callable] = None,
                coherent: Optional[bool] = None,
                filter_mask: Optional[int] = None) -> AnyHits:
        """Nearest-hit query (rtk_trace_ray).  `coherent` hints the packet
        engine's stepping policy (False selects split dual queues);
        `filter_mask` runs the built-in mask filter on the fast path."""
        return self._trace(rays, "closest", filter_fn, coherent,
                           filter_mask)

    def any(self, rays: Rays, filter_fn: Optional[Callable] = None,
            coherent: Optional[bool] = None,
            filter_mask: Optional[int] = None) -> AnyHits:
        """Any-hit query (the intended rtk_trace_ray_filter semantics)."""
        return self._trace(rays, "any", filter_fn, coherent, filter_mask)
