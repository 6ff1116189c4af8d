"""Binned (re-binned) tracing: the incoherent-ray engine.

The packet kernel charges every ray in a packet for the UNION of the
packet's traversals; on incoherent bounce batches that union approaches
the whole tree and throughput collapses (measured 0.2-0.3 Mrays/s on the
atrium bounce — docs/PERF_NOTES.md r2).  Per-ray traversal (stackless
skip links) measured 4x worse still: TPU lanes cannot gather
independently.

This engine re-bins rays BETWEEN traversal phases instead (the fix named
by PERF_NOTES r1 limit 3):

  1. Cut the packed tree at a shallow depth: ~W^depth subtree "bins",
     each a packed node id + AABB (host-side precompute, cached).
  2. Dense candidate pass: every ray x every bin AABB, keep the C
     nearest entry distances (the instanced top-level machinery —
     one fused vector pass, no traversal).
  3. C rounds: group rays by their round-r bin ON DEVICE (sort +
     searchsorted ranks + padded scatter, shared with instancing),
     trace each group from its bin's subtree root via per-packet roots.
     Packets now share one subtree, so their unions are bounded by the
     bin, not the scene.  Rays whose round-r entry distance can no
     longer beat their best hit are dead on arrival (max_t = 0) and the
     kernel's dead-ray cull retires them in a step.
  4. Exactness: a ray that intersects more than C bin boxes closer than
     its final hit cannot be proven correct from the C rounds alone; the
     candidate pass returns the (C+1)-th entry distance, and rays with
     overflow_t < best_t are re-traced through the FULL tree (regular
     packet trace, usually a tiny residual batch).

Reference semantics preserved: nearest hit, open (min_t, max_t)
t-window, strict < tie (rtk.c:543-577).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rtk_tpu.trace.packed import PackedScene
from rtk_tpu.types import PacketHits, Rays

Array = jax.Array

_BIG = 3.0e38


def subtree_bins(packed: PackedScene, depth: int = 2, root: int = 0):
    """Cut the packed wide tree at `depth`: returns (roots (R,) i32 packed
    entry ids, lo (R,3) f32, hi (R,3) f32) — host NumPy precompute.

    Entry ids use the kernel's stack encoding: >= 0 packed node id,
    <= -2 leaf id (shallow trees can surface leaves above the cut).
    Bounds come from the parent's child rows, so each bin's AABB is exact.
    """
    nodes = np.asarray(packed.nodes).reshape(-1, 8, 8)  # (Nd, W, 8)
    bounds = nodes[:, :, :6].view(np.float32)

    entries = [(np.int64(root), None, None)]  # (entry, lo, hi)
    for _ in range(depth):
        nxt = []
        for ent, lo, hi in entries:
            if ent < 0:  # leaf already; keep as its own bin
                nxt.append((ent, lo, hi))
                continue
            row = nodes[ent]
            fc, fl = row[0, 6], row[0, 7]
            masks = row[1, 6]
            im, lm = masks & 0xFF, (masks >> 8) & 0xFF
            irank = lrank = 0
            for w in range(8):
                clo = bounds[ent, w, 0:3]
                chi = bounds[ent, w, 3:6]
                if (im >> w) & 1:
                    nxt.append((np.int64(fc + irank), clo, chi))
                    irank += 1
                elif (lm >> w) & 1:
                    nxt.append((np.int64(-(fl + lrank) - 2), clo, chi))
                    lrank += 1
        entries = nxt

    roots = np.array([e for e, _, _ in entries], np.int32)
    # The root itself has no parent row; only possible when depth == 0.
    lo = np.stack([l if l is not None else np.full(3, -np.inf, np.float32)
                   for _, l, _ in entries])
    hi = np.stack([h if h is not None else np.full(3, np.inf, np.float32)
                   for _, _, h in entries])
    return roots, lo.astype(np.float32), hi.astype(np.float32)


def _bin_candidates(lo, hi, origin, direction, min_t, max_t, *, c, chunk):
    """Nearest-c bins per ray by AABB entry distance + (c+1)-th overflow
    entry (for the exactness fallback).  The same pass as the instanced
    candidate phase — shared, not mirrored."""
    from rtk_tpu.instancing import _instance_candidates_impl

    return _instance_candidates_impl(lo, hi, origin, direction, min_t,
                                     max_t, c=c, chunk=chunk)


def _binned_impl(packed, bin_roots, bin_lo, bin_hi, origin, direction,
                 min_t, max_t, *, unit, M, C, R, chunk, mode,
                 watertight, interpret, filter_mask=None):
    from rtk_tpu.instancing import _sorted_group, _unsort_merge
    from rtk_tpu.ops.pallas_trace import trace_packets

    n = origin.shape[0]
    cand_idx, cand_t, overflow = _bin_candidates(
        bin_lo, bin_hi, origin, direction, min_t, max_t, c=C, chunk=chunk)
    best = {
        "t": max_t,
        "u": jnp.zeros((n,), jnp.float32),
        "v": jnp.zeros((n,), jnp.float32),
        "slot": jnp.full((n,), -1, jnp.int32),
    }
    for s in range(C):
        comps = (origin[:, 0], origin[:, 1], origin[:, 2],
                 direction[:, 0], direction[:, 1], direction[:, 2],
                 min_t, best["t"], cand_t[:, s])
        idx_s, bin_s, cs = _sorted_group(cand_idx[:, s], cand_t[:, s],
                                         comps, R, unit)
        o0, o1, o2, d0, d1, d2, mnt, bt, ct = cs
        is_real = idx_s < n
        live = is_real & (bin_s < R) & (ct < bt)
        grouped = Rays(
            origin=jnp.stack([o0, o1, o2], axis=1),
            direction=jnp.stack([d0, d1, d2], axis=1),
            min_t=mnt, max_t=jnp.where(live, bt, 0.0))
        roots = jnp.take(bin_roots, jnp.minimum(bin_s[::unit], R - 1))
        h = trace_packets(packed, grouped, mode=mode,
                          watertight=watertight, packet_roots=roots,
                          pkt=unit, interpret=interpret,
                          filter_mask=filter_mask)
        ht, hu, hv, hs = _unsort_merge(idx_s, n,
                                       (h.t, h.u, h.v, h.slot))
        improved = (hs >= 0) & (ht < best["t"])
        best = {
            "t": jnp.where(improved, ht, best["t"]),
            "u": jnp.where(improved, hu, best["u"]),
            "v": jnp.where(improved, hv, best["v"]),
            "slot": jnp.where(improved, hs, best["slot"]),
        }
    # Exactness residual: rays whose (C+1)-th bin entry could still beat
    # the current best must re-trace the FULL tree.
    resid = overflow < best["t"]
    resid_rays = Rays(
        origin=origin, direction=direction, min_t=min_t,
        max_t=jnp.where(resid, best["t"], 0.0))
    hr = trace_packets(packed, resid_rays, mode=mode,
                       watertight=watertight, interpret=interpret,
                       pkt=unit, sort_rays=False,
                       filter_mask=filter_mask)
    improved = hr.hit & (hr.t < best["t"])
    best = {k: jnp.where(improved, v, best[k])
            for k, v in (("t", hr.t), ("u", hr.u), ("v", hr.v),
                         ("slot", hr.slot))}
    n_resid = jnp.sum(resid)
    return best, n_resid


@functools.lru_cache(maxsize=None)
def _binned_jit(interpret: bool, tpu: bool, unit: int, M: int, C: int,
                R: int, chunk: int, mode: str, watertight: bool,
                filter_mask):
    opts = {"xla_tpu_scoped_vmem_limit_kib": 120 * 1024} if tpu else None
    return jax.jit(
        functools.partial(_binned_impl, unit=unit, M=M, C=C, R=R,
                          chunk=chunk, mode=mode, watertight=watertight,
                          interpret=interpret, filter_mask=filter_mask),
        compiler_options=opts)


class _BinsCache:
    """Per-PackedScene bin table cache (host precompute, by id).

    Each entry holds a strong reference to the keyed nodes array: an
    id() key alone is unsafe — a GC'd scene's id can be recycled by a
    new array, which would serve stale bin tables for a different tree.
    Bounded FIFO keeps the pinned arrays from accumulating."""

    MAX_ENTRIES = 16

    def __init__(self):
        self._cache = {}

    def get(self, packed: PackedScene, depth: int):
        key = (id(packed.nodes), depth)
        hit = self._cache.get(key)
        if hit is not None and hit[0] is packed.nodes:
            return hit[1]
        roots, lo, hi = subtree_bins(packed, depth)
        val = (jnp.asarray(roots), jnp.asarray(lo),
               jnp.asarray(hi), roots.shape[0])
        if len(self._cache) >= self.MAX_ENTRIES:
            self._cache.pop(next(iter(self._cache)))
        self._cache[key] = (packed.nodes, val)
        return val


_BINS = _BinsCache()


def trace_packets_binned(
    packed: PackedScene,
    rays: Rays,
    mode: str = "closest",
    watertight: bool = True,
    interpret: bool = False,
    depth: int = 2,
    max_candidates: int = 8,
    unit: int = 128,
    filter_mask: int | None = None,
) -> PacketHits:
    """Trace an incoherent ray batch by re-binning over subtree bins.

    Same hit-record contract as trace_packets; built for bounce batches
    where the flat packet kernel's union waste dominates.  Exact: a
    residual full-tree pass covers rays whose candidate list overflowed.
    """
    n = rays.count
    bin_roots, bin_lo, bin_hi, R = _BINS.get(packed, depth)
    C = min(max_candidates, R)
    chunk = min(16384, max(1, n))
    pad = (-n) % chunk
    np_ = n + pad

    def padded(a, fill):
        a = jnp.asarray(a)
        if pad == 0:
            return a
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])

    blk = 8 * unit
    M = (np_ + R * unit + blk - 1) // blk * blk

    fn = _binned_jit(interpret, jax.default_backend() == "tpu", unit, M,
                     C, R, chunk, mode, watertight,
                     None if filter_mask is None else int(filter_mask))
    best, _ = fn(packed, bin_roots, bin_lo, bin_hi,
                 padded(rays.origin, 0.0), padded(rays.direction, 1.0),
                 padded(rays.min_t, 0.0), padded(rays.max_t, 0.0))
    if pad:
        best = {k: v[:n] for k, v in best.items()}
    return PacketHits(
        hit=best["slot"] >= 0,
        t=best["t"],
        u_k=best["u"],
        v_k=best["v"],
        slot=best["slot"],
        origin=jnp.asarray(rays.origin),
        direction=jnp.asarray(rays.direction),
        tri_v=packed.tri_v,
        tri_vidx=packed.tri_vidx,
        tri_mesh=packed.tri_mesh,
        tri_prim=packed.tri_prim,
    )
