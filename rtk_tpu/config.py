"""Build/trace configuration.

The reference (rtk.c:3-7, 586-592) exposes these as compile-time #defines:
RTK_BVH_MAX_DEPTH=64, leaf min/max items 4/64, RTK_BUILD_SPLITS=32,
RTK_MAX_CONCURRENT_TASKS=128.  Here they are dataclasses whose fields are
static under jit (they select program structure, not data).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class BuildConfig:
    """Static configuration for BVH construction.

    Attributes:
      leaf_size: triangles per leaf (rtk: RTK_BVH_LEAF_MIN_ITEMS=4).
      branching: wide-node arity W; 2, 4 or 8 (rtk builds BVH4, rtk.c:1576;
        TPUs want 8 so child slab tests fill VPU lanes).
      morton_bits: bits per axis of the Morton code (<=10 for uint32 keys).
      snap_node_counts: round dynamic node counts up to the next power of two
        bucket so repeated builds of similarly-sized scenes reuse compiles.
      wide_nodes: also build the wide (branching-ary) SoA node arrays.
        The packet-kernel product path derives its own tables from the
        binary topology (trace/packed.py), so a kernel-only user can skip
        the collapse — at build-at-scale it is the single costliest stage
        (~1.4 s of a 2.5 s 5.24M-tri build, tools/staged/build2.py).  The
        XLA stack/stackless engines and wide-array refit need True.
    """

    leaf_size: int = 4
    branching: int = 8
    morton_bits: int = 10
    wide_nodes: bool = True

    def __post_init__(self):
        if self.branching not in (2, 4, 8):
            raise ValueError("branching must be 2, 4, or 8")
        if not (1 <= self.leaf_size <= 64):
            # rtk bounds leaf items to 64 (rtk.c:588 RTK_BVH_LEAF_MAX_ITEMS)
            raise ValueError("leaf_size must be in [1, 64]")
        if not (1 <= self.morton_bits <= 10):
            raise ValueError("morton_bits must be in [1, 10]")

    @property
    def log2_branching(self) -> int:
        return {2: 1, 4: 2, 8: 3}[self.branching]


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    """Static configuration for traversal.

    Attributes:
      max_stack: per-ray traversal stack bound (rtk: RTK_BVH_MAX_DEPTH=64,
        rtk.c:5; wide nodes divide the needed depth by log2(W)).
      watertight: resolve exact-zero shear-space edge functions with
        double-word (two-float) products, mirroring rtk's f64 fallback
        (rtk.c:294-336) without needing f64 on TPU.
      max_steps: hard bound on traversal loop iterations (safety net; the
        loop normally exits when every ray's stack is empty).
      block_rays: process rays in blocks of this many to bound stack memory;
        0 traces the whole batch at once.
      dual_queues: packet engine stepping policy. None = per-call (the
        tracer's `coherent` hint decides; default single mixed stack);
        True/False forces split internal-stack + leaf-queue stepping on/off
        (split is ~1.6x faster on incoherent bounce batches, slightly
        slower on coherent primaries).
      defer_uv: packet engine only — drop the u/v hit carries and the
        rcp_det normalise from the kernel; PacketHits recomputes u/v
        lazily on access (hits/t/slot bit-equal, u/v exact up to fma
        contraction).  Measured +3.5% on the 67M headline; off by
        default because it perturbs last-bit u/v.
      pkt / packets_per_block: packet engine block geometry overrides
        (ray lanes per packet, a multiple of 128; packets per kernel
        block, a multiple of 8).  None = the measured auto policy (wide
        for coherent batches).  Incoherent bounce batches measured best
        at pkt=256 x 16 packets/block once ordering+pruning landed
        (atrium 1M bounce 1.52 -> 1.76 Mrays/s, PERF_NOTES r4).
    """

    max_stack: int = 48
    watertight: bool = True
    max_steps: int = 0  # 0 = unbounded (loop until all rays finish)
    block_rays: int = 0
    dual_queues: bool | None = None
    defer_uv: bool = False
    pkt: int | None = None
    packets_per_block: int | None = None
