"""Pallas TPU packet-traversal kernel.

The traversal is re-architected for the VPU rather than translated from the
reference's per-ray SSE loop (rtk.c:390-539):

  * Rays are traced in *packets* of 128 (one vector lane row each); a kernel
    block advances P=8 packets in lockstep.  Slab tests run as one
    (P*8, 128) tile — every child of every packet's node against every ray
    at once (the vectorised analogue of rtk's 4-wide test, rtk.c:449-473) —
    and leaf tests as one (P*K, 128) tile of watertight shear-space edge
    functions (rtk.c:181-388 semantics).
  * Each packet owns a traversal stack in VMEM.  Pushes are vectorised:
    child entries are computed arithmetically (the BFS repack in
    trace/packed.py makes internal children and leaf children contiguous),
    sorted near-to-far by packet entry distance with an odd-even
    transposition network (the lane-level analogue of rtk's in-register
    sorting network, rtk.c:489-536), compacted, and written with one
    dynamic-slice row store per packet.
  * The scene lives in VMEM: 8 child rows per node at (Nd*8, 8) f32 with
    metadata bitcast into spare columns, triangles as (Tp, 16) f32 rows.
    Node/leaf fetches are scalar-indexed dynamic slices — no gathers.

Per-ray hit state stays on-chip for the entire traversal; the only
vector->scalar synchronisations per step are the packed push-count sums.

NOTE: the node table is int32 with bitcast f32 bounds because TPU flushes
denormal floats to zero — integer metadata bitcast into a float table gets
destroyed by XLA data movement (discovered the hard way).
"""
from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtk_tpu.trace.packed import PackedScene
from rtk_tpu.types import PacketHits, Rays

DEFAULT_P = 8  # packets per block (best measured on v5e; more packets
               # amortize fixed per-step costs but add divergence)
W = 8  # wide-node arity (branching=8 scenes only)
PKT = 128  # default rays per packet (one VPU lane row); bigger packets
           # amortize the scalar-issue cost of each node visit over more
           # rays at the price of a wider traversal union
D_INT = 96  # internal-node stack bound (wide depth ~21 * <=7 pushes)
D_LEAF = 64  # pending-leaf queue bound (rtk caps its stack similarly, rtk.c:401)
# Per-packet stack rows.  Each region carries W rows of WRITE SLACK beyond
# its logical capacity: the push block-store writes W rows unconditionally
# at min(sp, capacity), so without slack a store issued while sp sits in
# (capacity-W, capacity] would land BELOW the top and clobber pending
# entries with fillers (dropped leaves == missed hits; found by the
# islab+dual parity test).  Layout: [0, D_INT+W) internal (mixed mode uses
# the whole allocation minus slack), [D_INT+W, D_INT+W+D_LEAF+W) leaves.
STACK_D = D_INT + W + D_LEAF + W
LEAF_BASE = D_INT + W

_BIG = 3.0e38


def _iota_col(p_pk):
    return jax.lax.broadcasted_iota(jnp.int32, (p_pk, 1), 0)


def _scalars_to_col(scalars, p_pk):
    """(P, 1) i32 vector from P traced scalars."""
    iota = _iota_col(p_pk)
    acc = jnp.zeros((p_pk, 1), jnp.int32)
    for p, s in enumerate(scalars):
        acc = jnp.where(iota == p, s, acc)
    return acc


def _bits_to_col_mask(packed_bits, p_pk):
    return ((packed_bits >> _iota_col(p_pk)) & 1) > 0


def _axis_sel(k, ax, ay, az):
    return jnp.where(k == 0, ax, jnp.where(k == 1, ay, az))


def _rep(a, r):
    """(P, N) -> (P*r, N) repeating each row r times (free reshape)."""
    p_pk = a.shape[0]
    return jnp.broadcast_to(a[:, None, :], (p_pk, r, a.shape[1])).reshape(
        p_pk * r, a.shape[1])


def _edge_dw(ax, ay, bx, by):
    """Double-word exact-sign edge function ax*by - ay*bx (the TPU stand-in
    for the reference's f64 exact-zero fallback, rtk.c:306-336)."""
    c = 4097.0
    axh = c * ax - (c * ax - ax)
    axl = ax - axh
    ayh = c * ay - (c * ay - ay)
    ayl = ay - ayh
    bxh = c * bx - (c * bx - bx)
    bxl = bx - bxh
    byh = c * by - (c * by - by)
    byl = by - byh
    p1 = ax * by
    e1 = ((axh * byh - p1) + axh * byl + axl * byh) + axl * byl
    p2 = ay * bx
    e2 = ((ayh * bxh - p2) + ayh * bxl + ayl * bxh) + ayl * bxl
    s = p1 - p2
    bb = s - p1
    e3 = (p1 - (s - bb)) + (-p2 - bb)
    return s + (e3 + (e1 - e2))


def _popcount8(v):
    """SWAR popcount of 8-bit lane values (int32 arrays)."""
    v = v - ((v >> 1) & 0x55)
    v = (v & 0x33) + ((v >> 2) & 0x33)
    return (v + (v >> 4)) & 0x0F


def _popcount16(v):
    """SWAR popcount of 16-bit lane values (int32 arrays)."""
    v = v - ((v >> 1) & 0x5555)
    v = (v & 0x3333) + ((v >> 2) & 0x3333)
    v = (v + (v >> 4)) & 0x0F0F
    return (v + (v >> 8)) & 0x1F


def _oem_network(n):
    """Batcher odd-even mergesort comparator pairs for n a power of 2
    (63 comparators at n=16 — the W=16 ordered-descent sort)."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


def _make_kernel(leaf_size, mode, watertight, p_pk, stats=False,
                 hbm_tris=False, dual=False, pkt=PKT, narrow=True,
                 interpret=False, ordered=False, islab=False, lesion=None,
                 use_mask=False, filter_fn=None, march=None,
                 kz_static=None, tris128=False, leaf_loop=False,
                 w_arity=8):
    """dual=False: one mixed stack per packet (cheapest per step; best for
    coherent primaries).  dual=True: separate internal stack + leaf queue,
    one of each popped per step so both vector phases stay busy (~1.6x on
    incoherent bounce batches, slightly slower on coherent primaries).

    Pruned experiment flags (r4): kz_tables / kz_sel / dual2 / pair_pops /
    prefetch / leaf_flush all measured neutral-to-losing on TPU — their
    verdicts and the measurements live in docs/PERF_NOTES.md."""
    k_tris = leaf_size
    P = p_pk
    PKT = pkt
    # Wide arity (r5): 8 (classic) or 16 (W=16 tables for internal-pop-
    # bound configs, hl2 probe: 97.7% of headline blocks).  Shadows the
    # module constants so every W-derived size below follows.
    W = w_arity
    assert W in (8, 16), "w_arity must be 8 or 16"
    assert W == 8 or march is None, "march supports W=8 tables only"
    STACK_D = D_INT + W + D_LEAF + W
    LEAF_BASE = D_INT + W
    MMASK = (1 << W) - 1  # meta int/leaf mask width
    CB = 4 if W <= 8 else 5  # count field bits (pushes <= W)
    CMASK = (1 << CB) - 1
    _pc = _popcount8 if W <= 8 else _popcount16
    # Stale-subtree pruning rides the ordered sort (needs per-child entry
    # keys, which only exist when the sort computed them).  In dual mode
    # the compaction carries the keys into the INTERNAL queue (leaf-queue
    # entries are not culled at pop — a stale leaf still costs its step).
    prune = ordered and (narrow or islab)
    # march: the fused macro-grid DDA (VERDICT r3 item 4 — re-binning
    # INSIDE the kernel).  Packets adopt grid cells: when a packet's
    # stack drains, its rays in the just-traversed cell retire or DDA-
    # advance, and the packet pushes the next pending cell's root.  The
    # scene must be packed with ONE ROOT PER CELL (pack_multiroot with
    # -1 empties) so the root entry id IS the cell id — adoption stays
    # pure vector math + one packed-bit extract, no lookup table.
    # march = (dx, dy, dz, glo_x, glo_y, glo_z, cs_x, cs_y, cs_z).
    assert march is None or not (dual or ordered or not narrow), \
        "march composes with the plain mixed-stack kernel only"
    # kz_static: BATCH-uniform shear axis, fixed at compile time.  The
    # caller proved every ray's dominant |d| axis is kz_static (true by
    # construction for any camera whose view cone stays within 45 deg of
    # a coordinate axis) and pre-rotated the ONE triangle table to match
    # — the leaf phase then reads vertex coords directly, dropping all 18
    # per-triangle axis-select ops with none of the costs that killed the
    # dynamic kz variants (PERF_NOTES: kz_tables 3x table -> HBM DMA
    # chatter; kz_sel (P,1) column-select relayouts; kz_blocks 3x code ->
    # spills — all pruned in r4).
    assert kz_static is None or (narrow and march is None), \
        "kz_static needs the narrow tri_test path"
    # tris128: the VMEM-resident triangle table laid out (Tp*16/128, 128)
    # — 8 records per 128-lane row, exactly the HBM layout — instead of
    # (Tp, 16).  A (rows, 16) VMEM operand pads its 16 lanes to 128, so
    # the legacy layout costs 8x its logical bytes of VMEM (measured:
    # f32[114176,16] -> a 55.75 MB input window); the 128-lane layout
    # costs logical bytes only, freeing ~49 MB for bigger scenes to stay
    # VMEM-resident (the atrium's leaf phase loses ~2x to HBM DMA
    # chatter, PERF_NOTES r2 attribution).
    assert not tris128 or (not hbm_tris and narrow
                           and leaf_size % 8 == 0), \
        "tris128 is the VMEM narrow path with lane-aligned leaves"
    # leaf_loop: run the leaf phase as a lax.fori_loop over chunks of 8
    # triangles instead of a fully-unrolled K-chain.  Bounds Mosaic's
    # scheduling scope to one chunk, which is what lets kz_static's
    # select-free leaf math compile at K=16 without the register-spill
    # storm that killed it unrolled (PERF_NOTES r3 kz_static entry: the
    # 18 dynamic selects per triangle serialise the unrolled chains; with
    # them gone the scheduler interleaves all K chains -> 146.9M spill
    # slots).  Chunk-local reads: one (8, 16) dynamic-slice block per
    # packet per chunk (legacy layout) or one (1, 128) row per packet
    # (tris128/HBM layout).
    assert not leaf_loop or (narrow and leaf_size % 8 == 0), \
        "leaf_loop needs the narrow leaf path and leaf_size % 8 == 0"
    # `lesion` (perf diagnosis only — WRONG RESULTS): a set of component
    # names to disable so a TPU sweep attributes step time to kernel
    # phases.  Supported: noselk noupdv nodiv noleaf noslab.
    lesion = frozenset((lesion or "").split())
    import numpy as _np

    NEG_BIG_BITS = int(_np.float32(-_BIG).view(_np.int32))

    def kernel(roots_ref,  # (n_packets,) i32 scalar-prefetch (SMEM)
               qmask_ref,  # (1,) i32 scalar-prefetch: filter query mask
               nodes_ref, tris_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               mint_ref, maxt_ref,
               *rest):
        if filter_fn is not None:
            ridx_ref, *rest = rest  # (P, PKT) i32 caller ray indices
        out_t, out_u, out_v, out_slot, *rest = rest
        if stats:
            out_steps, *rest = rest
        if hbm_tris:
            stage_nodes, stage_tris, stack_ref, tri_sems, *rest = rest
        else:
            stage_nodes, stage_tris, stack_ref, *rest = rest
        if march is not None:
            mi_ref, mt_ref, mc_ref = rest

        ray_idx = ridx_ref[:] if filter_fn is not None else None
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        mint = mint_ref[:]
        maxt = maxt_ref[:]
        # Hoisted scalar-prefetch read: SMEM reads inside the traversal
        # while-loop body fault the chip (same hazard as the kz_bases
        # hoist below) — read once at kernel top level and close over.
        qmask_val = qmask_ref[0] if use_mask else None

        def crcp(d):
            # NaN-free clamped reciprocal (finite huge instead of inf).
            big = jnp.where(d >= 0, _BIG, -_BIG)
            return jnp.where(d == 0.0, big, 1.0 / d)

        rcpx, rcpy, rcpz = crcp(dx), crcp(dy), crcp(dz)

        # Shear basis (rtk.c:550-567).
        if kz_static is not None:
            # Batch-uniform shear axis: pure static indexing, no selects.
            # (Any axis with d_kz != 0 is mathematically valid — dominance
            # is a numerical-precision choice, which the caller's
            # uniformity proof preserves.)
            kzc_ = int(kz_static)
            kxc_ = 0 if kzc_ == 2 else kzc_ + 1
            kyc_ = 0 if kxc_ == 2 else kxc_ + 1
            dd3 = (dx, dy, dz)
            oo3 = (ox, oy, oz)
            d_kz = dd3[kzc_]
            sx = -dd3[kxc_] / d_kz
            sy = -dd3[kyc_] / d_kz
            sz = 1.0 / d_kz
            o_kx, o_ky, o_kz = oo3[kxc_], oo3[kyc_], oo3[kzc_]
        else:
            adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
            maxc = jnp.maximum(adx, jnp.maximum(ady, adz))
            kz = jnp.where(adx == maxc, 0, jnp.where(ady == maxc, 1, 2))
            kx = jnp.where(kz == 2, 0, kz + 1)
            ky = jnp.where(kx == 2, 0, kx + 1)
            d_kz = _axis_sel(kz, dx, dy, dz)
            sx = -_axis_sel(kx, dx, dy, dz) / d_kz
            sy = -_axis_sel(ky, dx, dy, dz) / d_kz
            sz = 1.0 / d_kz
            o_kx = _axis_sel(kx, ox, oy, oz)
            o_ky = _axis_sel(ky, ox, oy, oz)
            o_kz = _axis_sel(kz, ox, oy, oz)

        if not narrow:
            # Loop-invariant repeated tiles for the one-shot batched phases.
            # (narrow mode works on (P, PKT) tiles that stay in vector
            # registers instead — (P*W, PKT) values spill.)
            oxW, oyW, ozW = _rep(ox, W), _rep(oy, W), _rep(oz, W)
            rxW, ryW, rzW = _rep(rcpx, W), _rep(rcpy, W), _rep(rcpz, W)
            mintW = _rep(mint, W)
            kxK, kyK, kzK = (_rep(kx, k_tris), _rep(ky, k_tris),
                             _rep(kz, k_tris))
            sxK, syK, szK = (_rep(sx, k_tris), _rep(sy, k_tris),
                             _rep(sz, k_tris))
            oxK, oyK, ozK = (_rep(o_kx, k_tris), _rep(o_ky, k_tris),
                             _rep(o_kz, k_tris))
            mintK = _rep(mint, k_tris)
        xpos, ypos, zpos = rcpx >= 0, rcpy >= 0, rcpz >= 0

        # Loop-invariant shear-axis masks for the leaf phase (hoisted out of
        # the per-triangle axis selects: k is a ray constant).
        if kz_static is None:
            kx0, kx1 = kx == 0, kx == 1
            ky0, ky1 = ky == 0, ky == 1
            kz0, kz1 = kz == 0, kz == 1

        def selk(m0, m1, ax, ay, az):
            return jnp.where(m0, ax, jnp.where(m1, ay, az))

        if islab:
            # Packet-interval (frustum) bounds: the slab phase only needs
            # "could ANY ray in the packet hit child w", so test the
            # packet's ORIGIN/1-over-DIRECTION intervals against each child
            # box with interval arithmetic on (P, W) mini-tiles — ~8x
            # cheaper than the per-ray (P, PKT) tile test, conservative
            # (never culls a hit child).  Exact per-ray culling still
            # happens in the leaf phase via the t-window.  Incoherent
            # packets should keep the per-ray test (their direction
            # intervals are too wide): islab is selected by the caller.
            olo_x = jnp.min(ox, axis=1, keepdims=True)
            ohi_x = jnp.max(ox, axis=1, keepdims=True)
            olo_y = jnp.min(oy, axis=1, keepdims=True)
            ohi_y = jnp.max(oy, axis=1, keepdims=True)
            olo_z = jnp.min(oz, axis=1, keepdims=True)
            ohi_z = jnp.max(oz, axis=1, keepdims=True)
            rlo_x = jnp.min(rcpx, axis=1, keepdims=True)
            rhi_x = jnp.max(rcpx, axis=1, keepdims=True)
            rlo_y = jnp.min(rcpy, axis=1, keepdims=True)
            rhi_y = jnp.max(rcpy, axis=1, keepdims=True)
            rlo_z = jnp.min(rcpz, axis=1, keepdims=True)
            rhi_z = jnp.max(rcpz, axis=1, keepdims=True)
            mint_lo = jnp.min(mint, axis=1, keepdims=True)

        pid = pl.program_id(0)
        if march is None:
            for p in range(P):  # only the root rows need init (garbage
                # above each packet's sp is never read); per-packet roots
                # support multi-root (instanced/merged-BLAS) tables.
                root_row = jnp.full((1, 8), roots_ref[pid * P + p],
                                    jnp.int32)
                if prune:
                    # Column 1 carries the entry distance; the root must
                    # never look stale.
                    root_row = jnp.where(
                        jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) == 1,
                        NEG_BIG_BITS, root_row)
                stack_ref[pl.ds(p * STACK_D, 1), :] = root_row

        iota_w = jax.lax.broadcasted_iota(jnp.int32, (P, W), 1)
        assert P <= 32, "int_pack/leaf_pack bitmasks hold at most 32 packets"

        if hbm_tris:
            # One DMA descriptor per packet.  Identical t0 arguments
            # reconstruct the exact descriptor, so waits can pair with
            # starts issued earlier in the step.
            rows_per_leaf = k_tris // 8

            def leaf_dma(p, t0):
                return pltpu.make_async_copy(
                    tris_ref.at[pl.ds(t0 // 8, rows_per_leaf), :],
                    stage_tris.at[pl.ds(p * rows_per_leaf,
                                        rows_per_leaf), :],
                    tri_sems.at[p],
                )

        # Dead rays (max_t <= min_t: padding and wavefront-compaction
        # convention) must contribute NOTHING to a packet's traversal
        # union.  The closed slab test enter <= exit treats their empty
        # (0, 0) t-window as a hit for any box containing the origin, so
        # a dead ray would drag the packet down its origin's whole box
        # chain.  Loop-invariant mask; applied to the slab cull t below.
        deadm = maxt <= mint

        if march is not None:
            MDX, MDY, MDZ = march[0], march[1], march[2]
            m_glo = march[3:6]
            m_cs = march[6:9]
            m_dims = (MDX, MDY, MDZ)
            rcps3 = (rcpx, rcpy, rcpz)
            ocs3 = (ox, oy, oz)
            dcs3 = (dx, dy, dz)
            # DDA entry (same math as trace/grid.py _grid_impl init):
            # grid-entry t, first cell, per-axis next-boundary ts.
            m_near = jnp.full((P, PKT), -_BIG)
            m_far = jnp.full((P, PKT), _BIG)
            for a in range(3):
                t0_ = (m_glo[a] - ocs3[a]) * rcps3[a]
                t1_ = (m_glo[a] + m_cs[a] * m_dims[a] - ocs3[a]) * rcps3[a]
                m_near = jnp.maximum(m_near, jnp.minimum(t0_, t1_))
                m_far = jnp.minimum(m_far, jnp.maximum(t0_, t1_))
            m_s0 = jnp.maximum(m_near, 0.0)
            m_done0 = (m_near > m_far) | (m_far < 0.0) | deadm
            m_ii = []
            m_tm0 = []
            for a in range(3):
                pa = ocs3[a] + dcs3[a] * m_s0
                ia = jnp.clip(
                    jnp.floor((pa - m_glo[a]) / m_cs[a]).astype(jnp.int32),
                    0, m_dims[a] - 1)
                nb = m_glo[a] + (
                    ia + (dcs3[a] >= 0).astype(jnp.int32)).astype(
                        jnp.float32) * m_cs[a]
                m_ii.append(ia)
                m_tm0.append((nb - ocs3[a]) * rcps3[a])
            mi_ref[:] = jnp.concatenate(
                [jnp.where(m_done0, -1, m_ii[0]), m_ii[1], m_ii[2]], axis=0)
            mt_ref[:] = jnp.concatenate(m_tm0, axis=0)
            mc_ref[:] = jnp.zeros((P, PKT), jnp.int32)
            # Per-ray step sign / crossing deltas are loop constants.
            m_step = [jnp.where(dcs3[a] >= 0, 1, -1).astype(jnp.int32)
                      for a in range(3)]
            m_tdel = [m_cs[a] * jnp.abs(rcps3[a]) for a in range(3)]
            M_BIGC = jnp.int32(0x3FFFFFFF)  # "no pending cell" sentinel

        def cond(carry):
            return carry[0] > 0

        def body(carry):
            # Dual queues per packet: every step pops one INTERNAL node (for
            # the slab phase) AND one pending LEAF (for the triangle phase),
            # so both vector phases do useful work each iteration; steps per
            # packet ~= max(node visits, leaf visits) instead of their sum.
            # Hit state lives in the OUTPUT refs, not the loop carry: a
            # (P, PKT) x4 carry spills the whole register file every step.
            if march is not None:
                _, sps_i, sps_l, fin_mask = carry
            else:
                _, sps_i, sps_l = carry
            hit_t = out_t[:]
            # Slab-phase cull t: dead rays never extend the union; in
            # any-hit mode, lanes that already found a hit drop out too —
            # the packet's traversal shrinks to its unfinished rays
            # (VERDICT r1 item 6: one slow lane used to pin the whole
            # packet at full per-lane cost).  hit_t itself stays true so
            # the leaf phase's output updates are unaffected.
            cull_t = jnp.where(deadm, -_BIG, hit_t)
            if mode == "any":
                cull_t = jnp.where(out_slot[:] >= 0, -_BIG, cull_t)
            if march is not None:
                # Rays whose own march hasn't reached the packet's adopted
                # cell must not widen its traversal union: each ray's own
                # cell chain covers every cell it needs (they still take
                # free leaf hits from staged triangles).
                cull_t = jnp.where(mc_ref[:] > 0, cull_t, -_BIG)

            ents = []
            new_spi = []
            new_spl = []
            int_pack = jnp.int32(0)
            leaf_pack = jnp.int32(0)
            tri0s = []
            pop_rows = []
            raw0 = None
            for p in range(P):
                spi = sps_i[p]
                active = spi > 0
                if dual:
                    # Backpressure: an internal pop can push up to W leaves
                    # while the leaf queue drains only one per step, so a
                    # deep traversal union would overflow D_LEAF and the
                    # clamp would silently DROP leaves (missed hits — found
                    # by the islab+dual parity test).  Pause internal pops
                    # for this packet until the queue has room.
                    active = active & (sps_l[p] <= D_LEAF - W)
                row = stack_ref[
                    pl.ds(p * STACK_D + jnp.maximum(spi - 1, 0), 1), :]
                pop_rows.append(row)
                if "onepop" in lesion and p > 0:
                    raw = raw0  # DIAGNOSTIC ONLY: wrong traversal
                else:
                    raw = row[0, 0]
                if p == 0:
                    raw0 = raw
                # Overflow-clamped pushes can leave -1 fillers on the stack;
                # treat them as inactive (a negative id would index the node
                # table out of bounds and fault the chip).
                ai = active & (raw >= 0)
                ents.append(jnp.where(ai, raw, 0))
                new_spi.append(spi - active.astype(jnp.int32))
                int_pack = int_pack | (ai.astype(jnp.int32) << p)

                if dual:
                    spl = sps_l[p]
                    al = spl > 0
                    lrow = stack_ref[
                        pl.ds(p * STACK_D + LEAF_BASE
                              + jnp.maximum(spl - 1, 0), 1), :]
                    lraw = lrow[0, 0]
                    al = al & (lraw <= -2)
                    lent = jnp.where(al, lraw, -2)
                    new_spl.append(spl - (spl > 0).astype(jnp.int32))
                else:
                    # Single mixed stack: the popped entry is internal
                    # (>= 0), a leaf (<= -2), or a -1 filler.
                    al = active & (raw <= -2)
                    lent = jnp.where(al, raw, -2)
                    new_spl.append(jnp.int32(0))
                leaf_pack = leaf_pack | (al.astype(jnp.int32) << p)
                tri0s.append((-lent - 2) * k_tris)

            if stats:
                # Diagnostic accumulators (stats mode only): lane 0
                # counts steps, lane 1 internal pops, lane 2 leaf pops —
                # the dual-queue balance (steps ~= max of the two pop
                # totals) that decides whether wider nodes could pay.
                # (scalar popcount is unsupported in Mosaic: unroll the
                # P-bit sum — stats mode only, cost irrelevant)
                ip = jnp.int32(0)
                lp = jnp.int32(0)
                for p in range(P):
                    ip = ip + ((int_pack >> p) & 1)
                    lp = lp + ((leaf_pack >> p) & 1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (P, PKT), 1)
                inc = jnp.where(
                    lane == 0, 1,
                    jnp.where(lane == 1, ip, jnp.where(lane == 2, lp, 0)))
                out_steps[:] = out_steps[:] + inc

            # ---- stage node child rows + leaf triangle rows ----
            if hbm_tris:
                # Triangles live in HBM (VMEM can't hold big scenes) as
                # (Tp*16/128, 128) rows — 8 triangle records per row, so a
                # leaf's K tris are whole 128-lane-aligned rows (DMA slices
                # must be lane-aligned).  Start the copies now; they overlap
                # the slab phase below.
                dmas = []
                for p in range(P):
                    dma = leaf_dma(p, tri0s[p])
                    dma.start()
                    dmas.append(dma)
            @pl.when(int_pack != 0)
            def _stage_node_rows():
                for p in range(P):
                    stage_nodes[pl.ds(p * W, W), :] = nodes_ref[
                        pl.ds(ents[p] * W, W), :]

            if not hbm_tris:
                @pl.when(leaf_pack != 0)
                def _stage_tri_rows():
                    for p in range(P):
                        src0 = tri0s[p]
                        if tris128:
                            # 8 records per 128-lane row: a leaf's K
                            # tris are K/8 whole rows (src0 = leaf
                            # id * K, K % 8 == 0 asserted).
                            rpl = k_tris // 8
                            stage_tris[
                                pl.ds(p * rpl, rpl), :
                            ] = tris_ref[pl.ds(src0 // 8, rpl), :]
                        else:
                            stage_tris[
                                pl.ds(p * k_tris, k_tris), :
                            ] = tris_ref[pl.ds(src0, k_tris), :]

            int_vec = _bits_to_col_mask(int_pack, P)  # (P,1)
            leaf_vec = _bits_to_col_mask(leaf_pack, P)
            tri0_col = _scalars_to_col(tri0s, P)
            below = (1 << iota_w) - 1  # bits strictly below lane w
            if prune:
                # Stale-subtree pruning (the packet analogue of rtk's
                # pop-cull loop, rtk.c:432-437): every pushed entry carries
                # its packet entry-distance lower bound in stack column 1;
                # if by pop time it can no longer beat ANY ray's current
                # hit (entry_lb >= max hit_t), suppress all child pushes —
                # the subtree dies.  Pure vector ops, no scalar syncs.
                pop_t = pltpu.bitcast(
                    jnp.concatenate(pop_rows, axis=0)[:, 1:2], jnp.float32)

            # ---- slab tests; the whole phase is skipped (scalar branch,
            # predicate already on the scalar core) on steps where no packet
            # popped an internal node.  narrow=True runs one child slot per
            # iteration on (P, PKT) tiles (stay in vector registers);
            # narrow=False runs the one-shot (P*W, PKT) tile (spills at
            # large PKT) ----
            def slab_phase(hit_t_in):
                nrows = stage_nodes[:]  # (P*W, 8) i32 (bounds bitcast)
                bf = lambda s: pltpu.bitcast(s, jnp.float32)
                if islab:
                    # Frustum test on (P, W) mini-tiles: child w of packet p
                    # is lane (p, w).  Sign-aware interval arithmetic; mixed
                    # sign-direction packets fall back to the conservative
                    # 8-product envelope.  Inverted (empty-slot) bounds pass
                    # this test and are culled by the child masks below.
                    def colf(c):
                        return bf(nrows[:, c:c + 1]).reshape(P, W)

                    mnx, mny, mnz = colf(0), colf(1), colf(2)
                    mxx, mxy, mxz = colf(3), colf(4), colf(5)
                    hmax = jnp.max(hit_t_in, axis=1, keepdims=True)

                    def axis_iv(mn, mx, olo, ohi, rlo, rhi):
                        a0, a1 = mn - ohi, mn - olo
                        b0, b1 = mx - ohi, mx - olo
                        pa = (a0 * rlo, a0 * rhi, a1 * rlo, a1 * rhi)
                        pb = (b0 * rlo, b0 * rhi, b1 * rlo, b1 * rhi)
                        min4 = lambda t: jnp.minimum(jnp.minimum(t[0], t[1]),
                                                     jnp.minimum(t[2], t[3]))
                        max4 = lambda t: jnp.maximum(jnp.maximum(t[0], t[1]),
                                                     jnp.maximum(t[2], t[3]))
                        pos = rlo >= 0  # (P,1): all-ray-positive axis dir
                        neg = rhi <= 0
                        near_lo = jnp.where(
                            pos, min4(pa),
                            jnp.where(neg, min4(pb),
                                      jnp.minimum(min4(pa), min4(pb))))
                        far_hi = jnp.where(
                            pos, max4(pb),
                            jnp.where(neg, max4(pa),
                                      jnp.maximum(max4(pa), max4(pb))))
                        return near_lo, far_hi

                    nlx, fhx = axis_iv(mnx, mxx, olo_x, ohi_x, rlo_x, rhi_x)
                    nly, fhy = axis_iv(mny, mxy, olo_y, ohi_y, rlo_y, rhi_y)
                    nlz, fhz = axis_iv(mnz, mxz, olo_z, ohi_z, rlo_z, rhi_z)
                    enter_lb = jnp.maximum(jnp.maximum(nlx, nly),
                                           jnp.maximum(nlz, mint_lo))
                    exit_ub = jnp.minimum(jnp.minimum(fhx, fhy),
                                          jnp.minimum(fhz, hmax))
                    hit8 = (enter_lb <= exit_ub).astype(jnp.int32)  # (P, W)
                    if ordered:
                        dists = [enter_lb[:, w:w + 1] for w in range(W)]
                elif narrow:
                    n3 = nrows.reshape(P, W, 8)
                    hitbits = jnp.zeros((P, 1), jnp.int32)
                    dists = []
                    for w in range(W):
                        c = n3[:, w, :]  # (P, 8): child w of every packet
                        mnx, mny, mnz = (bf(c[:, 0:1]), bf(c[:, 1:2]),
                                         bf(c[:, 2:3]))
                        mxx, mxy, mxz = (bf(c[:, 3:4]), bf(c[:, 4:5]),
                                         bf(c[:, 5:6]))
                        nx = (jnp.where(xpos, mnx, mxx) - ox) * rcpx
                        fx = (jnp.where(xpos, mxx, mnx) - ox) * rcpx
                        ny = (jnp.where(ypos, mny, mxy) - oy) * rcpy
                        fy = (jnp.where(ypos, mxy, mny) - oy) * rcpy
                        nz = (jnp.where(zpos, mnz, mxz) - oz) * rcpz
                        fz = (jnp.where(zpos, mxz, mnz) - oz) * rcpz
                        enter = jnp.maximum(jnp.maximum(nx, ny),
                                            jnp.maximum(nz, mint))
                        exit_ = jnp.minimum(jnp.minimum(fx, fy),
                                            jnp.minimum(fz, hit_t_in))
                        hitw = enter <= exit_
                        anyw = jnp.max(hitw.astype(jnp.int32),
                                       axis=1, keepdims=True)  # (P, 1)
                        hitbits = hitbits | (anyw << w)
                        if ordered:
                            # Packet entry distance of child w: nearest
                            # entering ray (the packet analogue of rtk's
                            # per-child t, rtk.c:489-536).
                            dists.append(jnp.min(
                                jnp.where(hitw, enter, _BIG),
                                axis=1, keepdims=True))
                    hit8 = (hitbits >> iota_w) & 1  # (P, W)
                else:
                    mnx, mny, mnz = (bf(nrows[:, 0:1]), bf(nrows[:, 1:2]),
                                     bf(nrows[:, 2:3]))
                    mxx, mxy, mxz = (bf(nrows[:, 3:4]), bf(nrows[:, 4:5]),
                                     bf(nrows[:, 5:6]))
                    nx = (jnp.where(rxW >= 0, mnx, mxx) - oxW) * rxW
                    fx = (jnp.where(rxW >= 0, mxx, mnx) - oxW) * rxW
                    ny = (jnp.where(ryW >= 0, mny, mxy) - oyW) * ryW
                    fy = (jnp.where(ryW >= 0, mxy, mny) - oyW) * ryW
                    nz = (jnp.where(rzW >= 0, mnz, mxz) - ozW) * rzW
                    fz = (jnp.where(rzW >= 0, mxz, mnz) - ozW) * rzW
                    enter = jnp.maximum(jnp.maximum(nx, ny),
                                        jnp.maximum(nz, mintW))
                    exit_ = jnp.minimum(jnp.minimum(fx, fy),
                                        jnp.minimum(fz, _rep(hit_t_in, W)))
                    hitm = enter <= exit_  # (P*W, 128)
                    hit8 = jnp.max(hitm.astype(jnp.int32), axis=1,
                                   keepdims=True).reshape(P, W)

                # child entries: vector arithmetic from embedded meta
                nr3 = nrows.reshape(P, W, 8)
                fc = nr3[:, 0, 6:7]
                fl = nr3[:, 0, 7:8]
                masks = nr3[:, 1, 6:7]
                im = masks & MMASK
                lm = (masks >> W) & MMASK
                is_i = (im >> iota_w) & 1  # (P, W)
                is_l = (lm >> iota_w) & 1
                irank = _pc(im & below)
                lrank = _pc(lm & below)
                entries = jnp.where(is_i == 1, fc + irank,
                                    -(fl + lrank) - 2)
                # The interval test passes inverted (empty-slot) bounds;
                # the slot masks cull them (per-ray slab tests reject them
                # via the inverted slabs themselves, so the and is free).
                hitv = (hit8 == 1) & int_vec & ((is_i | is_l) == 1)
                if prune:
                    hmax_pop = jnp.max(hit_t_in, axis=1, keepdims=True)
                    hitv = hitv & ~(pop_t >= hmax_pop)

                if ordered and (narrow or islab):
                    # Sort children far-to-near by packet entry distance
                    # (descending; misses sink to the end with key -BIG):
                    # the stack pops from the top, so the nearest child is
                    # visited first and hit_t tightens earliest.  19-
                    # comparator optimal sorting network on (P, 1) columns.
                    key = [jnp.where(hitv[:, w:w + 1], dists[w], -_BIG)
                           for w in range(W)]
                    ent = [entries[:, w:w + 1] for w in range(W)]
                    net = ([(0, 1), (2, 3), (4, 5), (6, 7),
                            (0, 2), (1, 3), (4, 6), (5, 7),
                            (1, 2), (5, 6), (0, 4), (3, 7),
                            (1, 5), (2, 6), (1, 4), (3, 6),
                            (2, 4), (3, 5), (3, 4)] if W == 8
                           else _oem_network(W))
                    for a, b in net:
                        sw = key[a] < key[b]
                        key[a], key[b] = (jnp.where(sw, key[b], key[a]),
                                          jnp.where(sw, key[a], key[b]))
                        ent[a], ent[b] = (jnp.where(sw, ent[b], ent[a]),
                                          jnp.where(sw, ent[a], ent[b]))
                    entries = jnp.concatenate(ent, axis=1)
                    validm = jnp.concatenate(key, axis=1) > -_BIG * 0.5
                else:
                    validm = hitv

                def compact(valid, keys=None):
                    # Left-compact valid entries (slot order) via bitmask
                    # ranks + a where-chain scatter — no lane shuffles.
                    # keys (optional) are permuted alongside so prune can
                    # push entry distances with the compacted entries.
                    vint = valid.astype(jnp.int32)
                    vbits = jnp.sum(vint << iota_w, axis=1, keepdims=True)
                    vrank = _pc(vbits & below)
                    out = jnp.full_like(entries, -1)
                    outk = (None if keys is None
                            else jnp.full_like(keys, -_BIG))
                    for w in range(W):
                        sel = ((vrank[:, w:w + 1] == iota_w)
                               & (vint[:, w:w + 1] == 1))
                        out = jnp.where(sel, entries[:, w:w + 1], out)
                        if keys is not None:
                            outk = jnp.where(sel, keys[:, w:w + 1], outk)
                    return out, _pc(vbits), outk

                comp_k = None
                if dual:
                    if ordered and (narrow or islab):
                        keymat = (jnp.concatenate(key, axis=1) if prune
                                  else None)
                        comp_i, cnt_i, comp_k = compact(
                            validm & (entries >= 0), keymat)
                        comp_l, cnt_l, _ = compact(validm & (entries <= -2))
                    else:
                        comp_i, cnt_i, _ = compact(validm & (is_i == 1))
                        comp_l, cnt_l, _ = compact(validm & (is_l == 1))
                    counts = cnt_i | (cnt_l << CB)  # (P,1), CB bits each
                elif ordered and (narrow or islab):
                    # Valid entries are already contiguous at the front
                    # after the sort; no rank compaction needed.
                    comp_i = jnp.where(validm, entries, -1)
                    vbits = jnp.sum(validm.astype(jnp.int32) << iota_w,
                                    axis=1, keepdims=True)
                    counts = _pc(vbits)
                    comp_l = comp_i
                    if prune:
                        comp_k = jnp.concatenate(key, axis=1)
                else:
                    comp_i, counts, _ = compact(
                        validm & ((is_i | is_l) == 1))
                    comp_l = comp_i
                out = (comp_i.astype(jnp.int32), comp_l.astype(jnp.int32),
                       counts.astype(jnp.int32))
                if prune:
                    # Entry keys ride along so pushes can store them.
                    out += (comp_k,)
                return out

            def slab_skip(hit_t_in):
                none = jnp.full((P, W), -1, jnp.int32)
                out = (none, none, jnp.zeros((P, 1), jnp.int32))
                if prune:
                    out += (jnp.full((P, W), -_BIG, jnp.float32),)
                return out

            if prune:
                comp_i, comp_l, counts, comp_k = jax.lax.cond(
                    int_pack != 0, slab_phase, slab_skip, cull_t)
            else:
                comp_i, comp_l, counts = jax.lax.cond(
                    int_pack != 0, slab_phase, slab_skip, cull_t)

            # counts -> scalars: the only vector->scalar syncs per step.
            # Non-dual counts fit 4 bits (<= 8 pushes), so all 8 packets
            # pack into ONE 32-bit sum; dual carries two nibbles per packet
            # and needs one sum per 4 packets.
            pcol = _iota_col(P)
            grp = pcol // 4
            if not dual and P <= 8 and W <= 8:
                c_all = jnp.sum(counts << (4 * pcol))

                def cnt_of(p):
                    return (c_all >> (4 * p)) & 0xF
            elif W <= 8:
                c_packed = []
                for g in range(P // 4):
                    c_packed.append(jnp.sum(jnp.where(
                        grp == g, counts << (8 * (pcol % 4)), 0)))

                def cnt_of(p):
                    return (c_packed[p // 4] >> (8 * (p % 4))) & 0xFF
            else:
                # W=16: dual counts are 2xCB=10 bits — 16-bit fields,
                # two packets per scalar sum.
                grp2 = pcol // 2
                c_packed = []
                for g in range(P // 2):
                    c_packed.append(jnp.sum(jnp.where(
                        grp2 == g, counts << (16 * (pcol % 2)), 0)))

                def cnt_of(p):
                    return (c_packed[p // 2] >> (16 * (p % 2))) & 0xFFFF

            def do_push(f_all=None):
                # ---- vector push: one (8,8) block store per packet per
                # queue (stack rows hold one entry each, value broadcast
                # across lanes; entries transposed so packet p's pushes are
                # column p).  f_all (any-mode): bit p set terminates packet
                # p (its counters zero; the stores are then never read). ----
                comp_i_t = comp_i.T  # (W, P)
                comp_l_t = comp_l.T if dual else None
                if prune:
                    comp_k_t = pltpu.bitcast(comp_k, jnp.int32).T  # (W, P)
                    iota8 = jax.lax.broadcasted_iota(jnp.int32, (W, 8), 1)
                max_i = D_INT if dual else (STACK_D - W)
                total = jnp.int32(0)
                final_spi = []
                final_spl = []
                for p in range(P):
                    cnt = cnt_of(p)
                    spi = new_spi[p]
                    pos = jnp.minimum(spi, max_i)
                    if prune:
                        # Column 0: entry id; column 1: entry-distance bits.
                        push_tile = jnp.where(
                            iota8 == 1, comp_k_t[:, p:p + 1],
                            comp_i_t[:, p:p + 1])
                    else:
                        push_tile = jnp.broadcast_to(
                            comp_i_t[:, p:p + 1], (W, 8))
                    stack_ref[pl.ds(p * STACK_D + pos, W), :] = push_tile
                    # Clamp: overflowing pushes overwrite the top entries (a
                    # bounded-stack policy like rtk's fixed 64-deep stack);
                    # unclamped counters would make later pops read out of
                    # bounds and fault the chip.
                    spi = jnp.minimum(spi + (cnt & CMASK),
                                      max_i).astype(jnp.int32)
                    if dual:
                        spl = new_spl[p]
                        posl = jnp.minimum(spl, D_LEAF)
                        stack_ref[
                            pl.ds(p * STACK_D + LEAF_BASE + posl, W), :
                        ] = jnp.broadcast_to(comp_l_t[:, p:p + 1], (W, 8))
                        spl = jnp.minimum(spl + (cnt >> CB),
                                          D_LEAF).astype(jnp.int32)
                    else:
                        spl = jnp.int32(0)
                    if f_all is not None:
                        done = (f_all >> p) & 1
                        spi = jnp.where(done == 1, 0, spi).astype(jnp.int32)
                        spl = jnp.where(done == 1, 0, spl).astype(jnp.int32)
                    final_spi.append(spi)
                    final_spl.append(spl)
                    total = (total + spi + spl).astype(jnp.int32)
                return total, final_spi, final_spl

            # ---- leaf tests ----
            def leaf_uvwt(verts, kx_, ky_, kz_, sx_, sy_, sz_,
                          okx, oky, okz, mint_, lazy=False):
                # verts: 9 (rows, 1) column slices [v0x..v2z]; ray tiles
                # broadcast against them.  Watertight shear-space test,
                # rtk.c:181-388 semantics.
                xs, ys, zs = [], [], []
                for j in range(3):
                    vx, vy, vz = verts[3 * j], verts[3 * j + 1], verts[3 * j + 2]
                    px = _axis_sel(kx_, vx, vy, vz) - okx
                    py = _axis_sel(ky_, vx, vy, vz) - oky
                    pz = _axis_sel(kz_, vx, vy, vz) - okz
                    xs.append(px + sx_ * pz)
                    ys.append(py + sy_ * pz)
                    zs.append(sz_ * pz)
                u = xs[1] * ys[2] - ys[1] * xs[2]
                v = xs[2] * ys[0] - ys[2] * xs[0]
                w_ = xs[0] * ys[1] - ys[0] * xs[1]
                if watertight:
                    # Any exact-zero edge function needs the exact-sign
                    # recompute (rtk.c:294-336).  Padding triangles are NaN
                    # rows in the kernel table, so they never trigger this.
                    need = (u == 0.0) | (v == 0.0) | (w_ == 0.0)

                    def _exact(uvw):
                        uu, vv, ww = uvw
                        uu = jnp.where(
                            need, _edge_dw(xs[1], ys[1], xs[2], ys[2]), uu)
                        vv = jnp.where(
                            need, _edge_dw(xs[2], ys[2], xs[0], ys[0]), vv)
                        ww = jnp.where(
                            need, _edge_dw(xs[0], ys[0], xs[1], ys[1]), ww)
                        return uu, vv, ww

                    if lazy and not interpret:
                        # Edge crossings are rare: hoist the ~66-op exact
                        # pass behind a scalar branch (one cheap
                        # vector->scalar sync vs a full-tile recompute).
                        # Variable-predicate cond misexecutes under pallas
                        # interpret mode, so interpret runs the eager pass.
                        u, v, w_ = jax.lax.cond(
                            jnp.max(need.astype(jnp.int32)) > 0,
                            _exact, lambda x: x, (u, v, w_))
                    else:
                        u, v, w_ = _exact((u, v, w_))
                lo = jnp.minimum(jnp.minimum(u, v), w_)
                hi = jnp.maximum(jnp.maximum(u, v), w_)
                det = u + v + w_
                rcp_det = 1.0 / det
                t = (u * zs[0] + v * zs[1] + w_ * zs[2]) * rcp_det
                ok = ~((lo < 0.0) & (hi > 0.0)) & (t > mint_)
                return t, u * rcp_det, v * rcp_det, ok

            if hbm_tris:
                # DMA waits must pair with the unconditional starts issued
                # above, so they stay outside the leaf-phase gating branch.
                for dma in dmas:
                    dma.wait()
            if hbm_tris or narrow:
                # One triangle slot per iteration on (P, PKT) register-
                # resident tiles.  The exact-sign recompute is deferred:
                # the cheap pass records which lanes had an exact-zero edge
                # function; only if any exist (rare) does a scalar branch
                # redo the pass with the double-word products applied.
                # NOTE: translate-before-shear (px = v - o first) is kept
                # deliberately: folding the origin into hoisted constants
                # (xs = sel_x(v) + sx*sel_z(v) - c) saves ~9 ops/tri but
                # loses precision by cancellation when |v| >> |v - o| —
                # the reference orders it this way for the same reason
                # (rtk.c:228-240).
                def tri_test(verts, exact):
                    xs, ys, zs = [], [], []
                    for j in range(3):
                        vx, vy, vz = (verts[3 * j], verts[3 * j + 1],
                                      verts[3 * j + 2])
                        if kz_static is not None or "noselk" in lesion:
                            # kz_static: vertex coords arrive pre-rotated
                            # to the batch's static (kx, ky, kz) axes.
                            px, py, pz = vx - o_kx, vy - o_ky, vz - o_kz
                        else:
                            px = selk(kx0, kx1, vx, vy, vz) - o_kx
                            py = selk(ky0, ky1, vx, vy, vz) - o_ky
                            pz = selk(kz0, kz1, vx, vy, vz) - o_kz
                        xs.append(px + sx * pz)
                        ys.append(py + sy * pz)
                        zs.append(sz * pz)
                    u = xs[1] * ys[2] - ys[1] * xs[2]
                    v = xs[2] * ys[0] - ys[2] * xs[0]
                    w_ = xs[0] * ys[1] - ys[0] * xs[1]
                    need = None
                    if watertight:
                        # Any exact-zero edge function needs the exact-sign
                        # recompute (rtk.c:294-336): with axis-aligned
                        # geometry, even all three can round to f32 zero on
                        # a genuine interior hit.  Padding triangles are
                        # NaN rows in the kernel table, so they never
                        # trigger this (NaN == 0 is false).
                        need = (u == 0.0) | (v == 0.0) | (w_ == 0.0)
                        if exact:
                            u = jnp.where(
                                need, _edge_dw(xs[1], ys[1], xs[2], ys[2]),
                                u)
                            v = jnp.where(
                                need, _edge_dw(xs[2], ys[2], xs[0], ys[0]),
                                v)
                            w_ = jnp.where(
                                need, _edge_dw(xs[0], ys[0], xs[1], ys[1]),
                                w_)
                    lo = jnp.minimum(jnp.minimum(u, v), w_)
                    hi = jnp.maximum(jnp.maximum(u, v), w_)
                    rcp_det = (1.0 if "nodiv" in lesion
                               else 1.0 / (u + v + w_))
                    t = (u * zs[0] + v * zs[1] + w_ * zs[2]) * rcp_det
                    ok = ~((lo < 0.0) & (hi > 0.0)) & (t > mint)
                    if use_mask:
                        # Built-in filter family (rtk.h:117,130 intent):
                        # the mask column holds exact-integer float bits.
                        tm = verts[9].astype(jnp.int32)
                        ok = ok & ((tm & qmask_val) != 0)
                    un, vn = u * rcp_det, v * rcp_det
                    if filter_fn is not None:
                        # User filter callable evaluated IN the leaf phase
                        # (rtk_filter_fn intent, rtk.h:117,130): the
                        # predicate is jax-traceable and closure-inlined —
                        # each distinct filter is its own kernel build.
                        from rtk_tpu.trace.stack import HitCandidate

                        shape = t.shape
                        cand = HitCandidate(
                            t=t, u=un, v=vn,
                            mesh_index=jnp.broadcast_to(
                                verts[10].astype(jnp.int32), shape),
                            triangle_index=jnp.broadcast_to(
                                verts[11].astype(jnp.int32), shape),
                            ray_index=ray_idx)
                        ok = ok & filter_fn(cand)
                    if "noupdv" in lesion:
                        return t, u, v, ok, need
                    return t, un, vn, ok, need

                if hbm_tris or tris128:
                    # staged as (P*rows_per_leaf, 128): 8 records per row;
                    # packet p at row block p (sublane slices of a
                    # (rows, 128) scratch are free).
                    st3 = stage_tris[:].reshape(P, k_tris // 8, 128)

                    n_cols = 12 if filter_fn is not None else 10

                    def verts_of(k):
                        r, s16 = k // 8, (k % 8) * 16
                        return [st3[:, r, s16 + c:s16 + c + 1]
                                for c in range(n_cols)]
                else:
                    t3 = stage_tris[:].reshape(P, k_tris, 16)
                    n_cols = 12 if filter_fn is not None else 10

                    def verts_of(k):
                        r = t3[:, k, :]  # (P, 16)
                        return [r[:, c:c + 1] for c in range(n_cols)]

                def _tri_update(carry, verts, slot_idx, exact):
                    h_t, h_u, h_v, h_s, needv = carry
                    tk, uk, vk, okk, need = tri_test(verts, exact)
                    if watertight and not exact:
                        needv = needv | need.astype(jnp.int32)
                    upd = okk & leaf_vec & (tk < h_t)
                    h_t = jnp.where(upd, tk, h_t)
                    if "noupdv" not in lesion:
                        h_u = jnp.where(upd, uk, h_u)
                        h_v = jnp.where(upd, vk, h_v)
                    h_s = jnp.where(upd, tri0_col + slot_idx, h_s)
                    return h_t, h_u, h_v, h_s, needv

                if leaf_loop:
                    # Chunked fori_loop: 8 triangles per iteration (the
                    # scope kz_static compiles cleanly at), carries the
                    # hit state — Mosaic cannot interleave across
                    # iterations, so register pressure is one chunk's.
                    if hbm_tris or tris128:
                        def chunk_verts(r):
                            rows = [stage_tris[
                                pl.ds(p * (k_tris // 8) + r, 1), :]
                                for p in range(P)]
                            tile = jnp.concatenate(rows, axis=0)  # (P,128)
                            return [
                                [tile[:, j * 16 + c:j * 16 + c + 1]
                                 for c in range(n_cols)]
                                for j in range(8)]
                    else:
                        def chunk_verts(r):
                            blocks = [stage_tris[
                                pl.ds(p * k_tris + r * 8, 8), :]
                                for p in range(P)]
                            out = []
                            for j in range(8):
                                tile = jnp.concatenate(
                                    [b[j:j + 1, :] for b in blocks],
                                    axis=0)  # (P, 16)
                                out.append([tile[:, c:c + 1]
                                            for c in range(n_cols)])
                            return out

                    def leaf_pass(hits_in, exact):
                        h_t, h_u, h_v, h_s = hits_in
                        init = (h_t, h_u, h_v, h_s,
                                jnp.zeros((P, PKT), jnp.int32))

                        def body_r(r, carry):
                            vs = chunk_verts(r)
                            for j in range(8):
                                carry = _tri_update(carry, vs[j],
                                                    r * 8 + j, exact)
                            return carry

                        h_t, h_u, h_v, h_s, needv = jax.lax.fori_loop(
                            0, k_tris // 8, body_r, init)
                        return (h_t, h_u, h_v, h_s), needv
                else:
                    def leaf_pass(hits_in, exact):
                        h_t, h_u, h_v, h_s = hits_in
                        carry = (h_t, h_u, h_v, h_s,
                                 jnp.zeros((P, PKT), jnp.int32))
                        for k in range(k_tris):
                            carry = _tri_update(carry, verts_of(k), k,
                                                exact)
                        h_t, h_u, h_v, h_s, needv = carry
                        return (h_t, h_u, h_v, h_s), needv

                if "noleaf" in lesion:
                    pass  # lesion: leaf phase elided entirely
                else:
                  @pl.when(leaf_pack != 0)
                  def _leaf_phase():
                    hits_in = (hit_t, out_u[:], out_v[:], out_slot[:])
                    if watertight and interpret:
                        # (variable-predicate cond is unreliable under
                        # interpret mode; run the exact pass eagerly)
                        res = leaf_pass(hits_in, exact=True)[0]
                    elif not watertight:
                        res = leaf_pass(hits_in, exact=False)[0]
                    else:
                        cheap, needv = leaf_pass(hits_in, exact=False)
                        res = jax.lax.cond(
                            jnp.max(needv) > 0,
                            lambda: leaf_pass(hits_in, exact=True)[0],
                            lambda: cheap)
                    out_t[:], out_u[:], out_v[:], out_slot[:] = res
            else:
                # Whole leaf phase behind a scalar branch: steps where no
                # packet popped a leaf skip the (P*K, 128) intersection tile
                # entirely (common while packets descend internal levels).
                @pl.when(leaf_pack != 0)
                def _leaf_phase():
                    h_t, h_u = hit_t, out_u[:]
                    h_v, h_s = out_v[:], out_slot[:]
                    trows = stage_tris[:]  # (P*K, 16)
                    verts = [trows[:, c:c + 1] for c in range(9)]
                    t, u, v, ok = leaf_uvwt(
                        verts, kxK, kyK, kzK, sxK, syK, szK, oxK, oyK, ozK,
                        mintK, lazy=True)
                    if use_mask:
                        tm = trows[:, 9:10].astype(jnp.int32)
                        ok = ok & ((tm & qmask_val) != 0)
                    if filter_fn is not None:
                        from rtk_tpu.trace.stack import HitCandidate

                        cand = HitCandidate(
                            t=t, u=u, v=v,
                            mesh_index=jnp.broadcast_to(
                                trows[:, 10:11].astype(jnp.int32), t.shape),
                            triangle_index=jnp.broadcast_to(
                                trows[:, 11:12].astype(jnp.int32), t.shape),
                            ray_index=_rep(ray_idx, k_tris))
                        ok = ok & filter_fn(cand)
                    ok = ok & _rep(leaf_vec.astype(jnp.float32),
                                   k_tris).astype(bool)
                    rr_t = t.reshape(P, k_tris, PKT)
                    rr_u = u.reshape(P, k_tris, PKT)
                    rr_v = v.reshape(P, k_tris, PKT)
                    rr_ok = ok.reshape(P, k_tris, PKT)
                    for k in range(k_tris):
                        tk = rr_t[:, k, :]
                        upd = rr_ok[:, k, :] & (tk < h_t)
                        h_t = jnp.where(upd, tk, h_t)
                        if "noupdv" not in lesion:
                            h_u = jnp.where(upd, rr_u[:, k, :], h_u)
                            h_v = jnp.where(upd, rr_v[:, k, :], h_v)
                        h_s = jnp.where(upd, tri0_col + k, h_s)
                    out_t[:], out_u[:], out_v[:], out_slot[:] = (
                        h_t, h_u, h_v, h_s)

            if mode == "any":
                # A packet is done when every LIVE lane has a hit: dead
                # lanes (padding / max_t<=min_t shadow convention) can
                # never set slot>=0, and without the deadm term a single
                # dead lane pinned the whole packet to a full stack
                # drain (the bench shadow batch is ~60% dead rays).
                found = jnp.min(((out_slot[:] >= 0) | deadm)
                                .astype(jnp.int32),
                                axis=1, keepdims=True)  # (P,1)
                f_all = jnp.sum(found << pcol)  # one bit per packet

            total, final_spi, final_spl = do_push(
                f_all if mode == "any" else None)
            if march is None:
                return (total, tuple(final_spi), tuple(final_spl))

            # ---- march adoption: packets whose stack is empty retire /
            # DDA-advance the rays of the cell they just drained and push
            # the next pending cell's root.  Runs AFTER do_push so the
            # root row at stack position 0 survives the push phase's
            # unconditional filler store. ----
            need_bits = jnp.int32(0)
            for p in range(P):
                needp = ((sps_i[p] == 0)
                         & (((fin_mask >> p) & 1) == 0))
                need_bits = need_bits | (needp.astype(jnp.int32) << p)

            def adopt_vals():
                mi = mi_ref[:]
                mt = mt_ref[:]
                mix = mi[0 * P:1 * P]
                miy = mi[1 * P:2 * P]
                miz = mi[2 * P:3 * P]
                tmx = mt[0 * P:1 * P]
                tmy = mt[1 * P:2 * P]
                tmz = mt[2 * P:3 * P]
                need_col = _bits_to_col_mask(need_bits, P)  # (P, 1)
                marching = mix >= 0
                act = marching & need_col
                in_c = (mc_ref[:] > 0) & act
                # retire: the just-drained cell's exit bounds any later
                # cell's entry, so a hit at or before it is final.
                exit_t = jnp.minimum(tmx, jnp.minimum(tmy, tmz))
                fin = in_c & (out_t[:] <= exit_t)
                if mode == "any":
                    fin = fin | (act & (out_slot[:] >= 0))
                adv = in_c & ~fin
                # one DDA step for the advancing rays
                mx = (tmx <= tmy) & (tmx <= tmz)
                my = ~mx & (tmy <= tmz)
                mz = ~mx & ~my
                ix2 = mix + jnp.where(mx, m_step[0], 0)
                iy2 = miy + jnp.where(my, m_step[1], 0)
                iz2 = miz + jnp.where(mz, m_step[2], 0)
                outg = ((ix2 < 0) | (ix2 >= MDX) | (iy2 < 0) | (iy2 >= MDY)
                        | (iz2 < 0) | (iz2 >= MDZ))
                mix = jnp.where(adv, ix2, mix)
                miy = jnp.where(adv, iy2, miy)
                miz = jnp.where(adv, iz2, miz)
                tmx = jnp.where(adv & mx, tmx + m_tdel[0], tmx)
                tmy = jnp.where(adv & my, tmy + m_tdel[1], tmy)
                tmz = jnp.where(adv & mz, tmz + m_tdel[2], tmz)
                dead_now = fin | (adv & outg)
                mix = jnp.where(dead_now, -1, mix)
                marching = mix >= 0
                cell = (mix * MDY + miy) * MDZ + miz
                cellk = jnp.where(marching & need_col, cell, M_BIGC)
                nxt = jnp.min(cellk, axis=1, keepdims=True)  # (P, 1)
                alive = nxt < M_BIGC
                alive_bits = jnp.sum(
                    alive.astype(jnp.int32) << pcol).astype(jnp.int32)
                new_in = (cell == nxt) & marching
                # Select in i32: Mosaic cannot lower a bool-valued select
                # at (P, PKT) (i8->i1 trunci); mc_ref holds 0/1 i32.
                in_out = jnp.where(need_col, new_in.astype(jnp.int32),
                                   mc_ref[:])
                return (mix, miy, miz, tmx, tmy, tmz, in_out, nxt,
                        alive_bits)

            def adopt_skip():
                mi = mi_ref[:]
                mt = mt_ref[:]
                return (mi[0 * P:1 * P], mi[1 * P:2 * P], mi[2 * P:3 * P],
                        mt[0 * P:1 * P], mt[1 * P:2 * P], mt[2 * P:3 * P],
                        mc_ref[:], jnp.full((P, 1), M_BIGC, jnp.int32),
                        jnp.int32(0))

            (mixn, miyn, mizn, tmxn, tmyn, tmzn, mcn, nxt,
             alive_bits) = jax.lax.cond(need_bits != 0,
                                        adopt_vals, adopt_skip)

            @pl.when(need_bits != 0)
            def _apply_adoption():
                mi_ref[:] = jnp.concatenate([mixn, miyn, mizn], axis=0)
                mt_ref[:] = jnp.concatenate([tmxn, tmyn, tmzn], axis=0)
                mc_ref[:] = mcn
                for p in range(P):
                    @pl.when((((need_bits & alive_bits) >> p) & 1) == 1)
                    def _push_root(p=p):
                        # The root ENTRY of cell c is c (pack_multiroot
                        # identity with one root per cell).
                        stack_ref[pl.ds(p * STACK_D, 1), :] = (
                            jnp.broadcast_to(nxt[p:p + 1, :], (1, 8)))

            live = need_bits & alive_bits
            fin_mask = (fin_mask | (need_bits & ~alive_bits)).astype(
                jnp.int32)
            fspi = []
            total = jnp.int32(0)
            for p in range(P):
                si = jnp.where(((live >> p) & 1) == 1, jnp.int32(1),
                               final_spi[p]).astype(jnp.int32)
                fspi.append(si)
                # a not-finished packet with an empty stack adopts next
                # step — keep the loop alive for it.
                pend = (jnp.where(si == 0, 1, 0)
                        * (1 - ((fin_mask >> p) & 1))).astype(jnp.int32)
                total = (total + si + final_spl[p] + pend).astype(jnp.int32)
            return (total, tuple(fspi), tuple(final_spl), fin_mask)

        # Hit state initialises in the output refs (miss: t = max_t).
        out_t[:] = maxt
        out_u[:] = jnp.zeros((P, PKT), jnp.float32)
        out_v[:] = jnp.zeros((P, PKT), jnp.float32)
        out_slot[:] = jnp.full((P, PKT), -1, jnp.int32)
        if march is not None:
            # Stacks start EMPTY: the first step's adoption pushes each
            # packet's entry cell.  fin_mask bit p: packet p has no
            # marching rays left (set once its adoption finds none).
            init = (
                jnp.int32(1),
                tuple(jnp.int32(0) for _ in range(P)),
                tuple(jnp.int32(0) for _ in range(P)),
                jnp.int32(0),
            )
        else:
          init = (
            jnp.int32(P),
            tuple(jnp.int32(1) for _ in range(P)),  # int stacks hold the root
            tuple(jnp.int32(0) for _ in range(P)),  # leaf queues empty
          )
        if stats:
            out_steps[:] = jnp.zeros((P, PKT), jnp.int32)
        jax.lax.while_loop(cond, body, init)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("mode", "watertight", "interpret", "num_tris",
                     "leaf_size", "stats", "p_pk", "hbm_tris", "dual",
                     "pkt", "narrow", "ordered", "islab", "lesion",
                     "use_mask", "filter_fn", "march", "kz_static",
                     "tris128", "leaf_loop", "w_arity"),
)
def _run_kernel(nodes, tris, ray_comps, roots, qmask, *, mode,
                watertight, interpret, num_tris, leaf_size, stats=False,
                p_pk=DEFAULT_P, hbm_tris=False, dual=False, pkt=PKT,
                narrow=True, ordered=False, islab=False, lesion=None,
                use_mask=False, filter_fn=None,
                march=None, kz_static=None, tris128=False,
                leaf_loop=False, w_arity=8):
    P = p_pk
    PKT = pkt
    W = w_arity
    STACK_D = D_INT + W + D_LEAF + W
    n_rows = ray_comps[0].shape[0]  # multiple of P, each row 128 rays
    grid = n_rows // P
    ray_spec = pl.BlockSpec((P, PKT), lambda i, roots, qmask: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    tri_spec = (pl.BlockSpec(memory_space=pl.ANY) if hbm_tris
                else full())
    kernel = _make_kernel(leaf_size, mode, watertight, P, stats=stats,
                          hbm_tris=hbm_tris, dual=dual, pkt=PKT,
                          narrow=narrow, interpret=interpret,
                          ordered=ordered, islab=islab, lesion=lesion,
                          use_mask=use_mask, filter_fn=filter_fn,
                          march=march, kz_static=kz_static,
                          tris128=tris128, leaf_loop=leaf_loop,
                          w_arity=w_arity)
    n_out = 5 if stats else 4
    # Per-packet roots ride as a scalar-prefetch arg (SMEM): one i32 per
    # packet instead of a (grid, P, PKT) VMEM broadcast.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        # filter_fn adds a 9th ray component: the caller ray index tile.
        in_specs=[full(), tri_spec] + [ray_spec] * len(ray_comps),
        out_specs=[ray_spec] * n_out,
        scratch_shapes=[
            pltpu.VMEM((P * W, 8), jnp.int32),
            (pltpu.VMEM((P * leaf_size // 8, 128), jnp.float32)
             if hbm_tris or tris128
             else pltpu.VMEM((P * leaf_size, 16), jnp.float32)),
            pltpu.VMEM((P * STACK_D, 8), jnp.int32),
        ] + ([pltpu.SemaphoreType.DMA((P,))] if hbm_tris else [])
          + ([pltpu.VMEM((3 * P, PKT), jnp.int32),   # march cell ix/iy/iz
              pltpu.VMEM((3 * P, PKT), jnp.float32),  # march tmx/tmy/tmz
              pltpu.VMEM((P, PKT), jnp.int32)]        # march in-cell mask
             if march is not None else []),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, PKT), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, PKT), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, PKT), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, PKT), jnp.int32),
        ] + ([jax.ShapeDtypeStruct((n_rows, PKT), jnp.int32)] if stats else []),
        interpret=interpret,
    )(roots, qmask, nodes, tris, *ray_comps)
    return out


# Keep the whole scene in VMEM only while it fits comfortably (~16 MB/core,
# shared with ray blocks, stages and stacks).
VMEM_TRI_BUDGET_BYTES = 8 * 1024 * 1024
# Middle tier: tables up to this many LOGICAL bytes stay VMEM-resident in
# the tris128 (Tp*16/128, 128) layout (no 8x lane padding).  Above it,
# triangles live in HBM with per-leaf DMA staging.  v5e VMEM is 128 MB,
# shared with ray blocks, stages, stacks and register spill slots (~50 MB
# at pkt=2048 dual) — 40 MB of table is the comfortable ceiling.
VMEM128_TRI_BUDGET_BYTES = 40 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _trace_impl_jit(tpu: bool):
    # XLA's small-tensor VMEM offload counts the trace's ray operands into
    # one scoped allocation; megaray batches trip the default 16 MB budget
    # by a hair.  The option only exists on the TPU compiler.
    opts = {"xla_tpu_scoped_vmem_limit_kib": 120 * 1024} if tpu else None
    return jax.jit(
        _trace_impl_fn,
        static_argnames=("mode", "watertight", "interpret", "p_pk",
                         "hbm_tris", "dual", "pkt", "narrow", "sort_rays",
                         "ordered", "islab", "lesion", "use_mask",
                         "stats", "filter_fn", "march", "kz_static",
                         "tris128", "leaf_loop", "defer_uv"),
        compiler_options=opts)


def _trace_impl(packed, origin, direction, min_t, max_t, roots,
                qmask=None, **kw):
    args = (packed, origin, direction, min_t, max_t, roots, qmask)
    if any(isinstance(l, jax.core.Tracer) for l in jax.tree.leaves(args)):
        # Inside an enclosing jit (refit fusion, shard_map, instanced
        # rounds): inline — compiler_options only attach to top-level jits.
        return _trace_impl_fn(*args, **kw)
    return _trace_impl_jit(jax.default_backend() == "tpu")(*args, **kw)


def _trace_impl_fn(packed, origin, direction, min_t, max_t, roots,
                   qmask=None, *, mode, watertight, interpret, p_pk,
                   hbm_tris, dual, pkt, narrow, sort_rays, ordered=False,
                   islab=False, lesion=None, use_mask=False, stats=False,
                   filter_fn=None, march=None,
                   kz_static=None, tris128=None, leaf_loop=False,
                   defer_uv=False):
    """One fused dispatch: coherence sort -> packet kernel -> unsort ->
    hit-record assembly.  (This runtime charges every dispatch a fixed
    multi-ms penalty once Pallas is in play, so the whole trace must be a
    single program; gathers are replaced by multi-operand lax.sort.)"""
    n = origin.shape[0]
    PKT = pkt
    idx = None
    n2 = n
    if sort_rays:
        from rtk_tpu.ops.morton import ray_coherence_key

        key = ray_coherence_key(origin, direction)
        idx = jnp.arange(n, dtype=jnp.int32)
        (_, idx, c0, c1, c2, c3, c4, c5, c6, c7) = jax.lax.sort(
            (key, idx, origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2],
             min_t, max_t), num_keys=1)
        comps8 = (c0, c1, c2, c3, c4, c5, c6, c7)
    else:
        comps8 = (origin[:, 0], origin[:, 1], origin[:, 2],
                  direction[:, 0], direction[:, 1], direction[:, 2],
                  min_t, max_t)

    pad = (-n2) % (p_pk * PKT)
    npad = n2 + pad

    def comp(a, fill, edge):
        if pad:
            # Edge-replicate origin/direction (a constant-fill ray would
            # blow up the last packet's interval bounds under islab);
            # max_t pads with 0 so padding rays stay dead.
            tail = (jnp.broadcast_to(a[n2 - 1:n2], (pad,)) if edge
                    else jnp.full((pad,), fill, a.dtype))
            a = jnp.concatenate([a, tail], axis=0)
        return a.reshape(npad // PKT, PKT)

    fills = (0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
    edges = (True, True, True, True, True, True, False, False)
    ray_comps = tuple(comp(a, f, e)
                      for a, f, e in zip(comps8, fills, edges))
    if filter_fn is not None:
        # 9th ray component: the caller's ray index per lane, so the
        # user filter predicate sees ray identity even through the
        # coherence sorts.  Pad lanes carry index n (dead; never hit).
        ridx = (idx[:n2].astype(jnp.int32) if idx is not None
                else jnp.arange(n2, dtype=jnp.int32))
        ray_comps = ray_comps + (comp(ridx, n, False),)
    tris = packed.tris
    if kz_static is not None and kz_static != 2:
        # Rotate the single table's vertex columns to (kx, ky, kz) once —
        # convention kx=(kz+1)%3, ky=(kz+2)%3; for
        # kz=2 the packed layout already IS the rotated one.  A 16-column
        # permute of the whole table is a few MB, fused into this program.
        kxr, kyr = (kz_static + 1) % 3, (kz_static + 2) % 3
        cols = []
        for j in range(3):
            cols += [3 * j + kxr, 3 * j + kyr, 3 * j + kz_static]
        cols += list(range(9, tris.shape[1]))
        tris = tris[:, jnp.asarray(cols, jnp.int32)]
    # VMEM-table layout tiers (measured at the 67M bunny headline):
    #   (Tp, 16)          — pads 16 lanes to 128 (8x logical VMEM) but its
    #                       16-lane record slices stage/slice fastest:
    #                       243.9 vs 229.9 Mrays/s under tris128.  Default
    #                       while the padded size fits the budget.
    #   (Tp*16/128, 128)  — tris128: logical-bytes VMEM; the only way
    #                       atrium-class scenes (~30 MB) stay VMEM-resident
    #                       instead of paying per-leaf-step HBM DMA chatter.
    if tris128 is None:
        tris128 = (not hbm_tris and narrow
                   and packed.leaf_size % 8 == 0
                   and packed.tris.nbytes > VMEM_TRI_BUDGET_BYTES)
    tris128 = bool(tris128) and not hbm_tris
    tris_table = (tris.reshape(-1, 128) if (hbm_tris or tris128)
                  else tris)
    if qmask is None:
        qmask = jnp.full((1,), 0xFFFFFF, jnp.int32)
    out = _run_kernel(
        packed.nodes, tris_table, ray_comps, roots, qmask,
        mode=mode, watertight=watertight, interpret=interpret,
        num_tris=packed.num_tris, leaf_size=packed.leaf_size, p_pk=p_pk,
        hbm_tris=hbm_tris, dual=dual, pkt=PKT, narrow=narrow,
        ordered=ordered, islab=islab, lesion=lesion, use_mask=use_mask,
        stats=stats, filter_fn=filter_fn,
        march=march, kz_static=kz_static, tris128=tris128,
        leaf_loop=leaf_loop, w_arity=packed.branching,
    )
    out_t, out_u, out_v, out_slot = out[:4]
    t = out_t.reshape(-1)[:n2]
    slot = out_slot.reshape(-1)[:n2]
    if defer_uv:
        # u/v were never carried (kernel ran the noupdv leaf path); the
        # lazy PacketHits recomputes them on access.  Two fewer sort
        # operands in the unscatter, too.
        if idx is not None:
            _, t, slot = jax.lax.sort((idx, t, slot), num_keys=1)
        t, slot = t[:n], slot[:n]
        u = v = jnp.zeros_like(t)
    else:
        u = out_u.reshape(-1)[:n2]
        v = out_v.reshape(-1)[:n2]
        if idx is not None:
            # Unscatter to caller order: one multi-operand sort by
            # original index (sorts are fast on TPU; 1M-element gathers
            # are not).  kz-bin pads carry idx >= n and sort behind the
            # real rays.
            _, t, u, v, slot = jax.lax.sort((idx, t, u, v, slot),
                                            num_keys=1)
        t, u, v, slot = t[:n], u[:n], v[:n], slot[:n]

    hit = slot >= 0
    if stats:
        # Per-ray diagnostic counters of the ray's block (observability:
        # the packet analogue of rtk's per-node build logging hooks).
        # Lane encoding within each packet (r5): lane 0 = step count,
        # lane 1 = internal-queue pops, lane 2 = leaf-queue pops, other
        # lanes 0 — the dual pop balance names which queue binds
        # (steps ~= max of the two totals in dual mode).  Read with
        # sort_rays=False so lanes stay aligned.
        steps = out[4].reshape(-1)[:n2]
        if idx is not None:
            _, steps = jax.lax.sort((idx, steps), num_keys=1)
        steps = steps[:n]
        return PacketHits(
            hit=hit, t=t, u_k=jnp.where(hit, u, 0.0),
            v_k=jnp.where(hit, v, 0.0), slot=slot, origin=origin,
            direction=direction, tri_v=packed.tri_v,
            tri_vidx=packed.tri_vidx, tri_mesh=packed.tri_mesh,
            tri_prim=packed.tri_prim, uv_deferred=defer_uv), steps
    return PacketHits(
        hit=hit,
        t=t,
        u_k=jnp.where(hit, u, 0.0),
        v_k=jnp.where(hit, v, 0.0),
        slot=slot,
        origin=origin,
        direction=direction,
        tri_v=packed.tri_v,
        tri_vidx=packed.tri_vidx,
        tri_mesh=packed.tri_mesh,
        tri_prim=packed.tri_prim,
        uv_deferred=defer_uv,
    )


def _check_leaf_loop(packed, narrow, leaf_loop):
    """leaf_loop precondition, shared by trace_packets and the refit
    executors (advisor r4: the refit entries bypassed the guard and an
    unaligned scene reached the kernel unvalidated)."""
    if leaf_loop and (packed.leaf_size % 8 or not narrow):
        raise ValueError("leaf_loop needs lane-aligned leaves "
                         "(leaf_size % 8 == 0) and the narrow leaf path")


def trace_packets(packed: PackedScene, rays: Rays, mode: str = "closest",
                  watertight: bool = True, interpret: bool = False,
                  p_pk: int = DEFAULT_P, hbm_tris: bool | None = None,
                  packet_roots=None, dual: bool = False,
                  pkt: int | None = None, narrow: bool = True,
                  sort_rays: bool | None = None,
                  ordered: bool = False,
                  islab: bool | None = None,
                  lesion: str | None = None,
                  filter_mask: int | None = None,
                  stats: bool = False,
                  filter_fn=None,
                  march: tuple | None = None,
                  kz_static: int | None = None,
                  tris128: bool | None = None,
                  leaf_loop: bool = False,
                  defer_uv: bool = False) -> PacketHits:
    """Trace rays with the Pallas packet kernel.

    kz_static (0/1/2): CALLER-PROVED batch-uniform shear axis — every
    ray's dominant |direction| component is this axis (true by
    construction for any camera whose view cone stays within 45 degrees
    of a coordinate axis, e.g. the primary-ray batch of a sub-90-degree
    fov camera looking down an axis).  The kernel then fixes the shear
    basis at compile time and reads a once-rotated triangle table, which
    removes all 18 per-triangle axis-select ops from the leaf phase
    (~12% of the 67M-ray headline frame).  Rays violating the contract
    get reduced watertight precision (their shear axis is not their
    dominant one), never crashes; `uniform_kz(rays)` checks a host batch.

    Hit-record contract matches rtk_trace_ray (rtk.c:543-577): t, u, v,
    vertex records, mesh/triangle indices; miss leaves t = max_t.  The
    record comes back as a lazy PacketHits — the expensive index/vertex
    gathers only run for consumers that read those fields (`.full()`
    materialises a plain Hits).

    pkt=None picks the packet width: 512 rays for large batches (amortises
    per-visit control costs ~2.4x vs 128), 128 for small ones.
    sort_rays=None enables coherence sorting for large batches (Morton
    probe key; results come back in the caller's order).
    """
    n = rays.count
    if defer_uv:
        # The kernel's noupdv leaf path: u/v carries, their per-triangle
        # normalises and their update selects all drop; the lazy
        # PacketHits recomputes u/v on access (most consumers never do —
        # shading reads position()+indices, occlusion reads hit).
        lesion = (lesion + " noupdv") if lesion else "noupdv"
    if pkt is None:
        # Explicit per-packet roots are laid out by the caller in units of
        # the default 128-ray packet; widening would misalign them.
        if packet_roots is not None:
            # Explicit per-packet roots are laid out by the caller in
            # 128-ray units; widening would misalign them.
            pkt = 128
        else:
            # Wider packets win as the batch grows: ray density tightens
            # the traversal union while the fixed per-step costs amortise
            # over more rays (measured crossovers + the fitted step-cost
            # model live in utils/costmodel.py).
            from rtk_tpu.utils.costmodel import auto_pkt

            pkt = auto_pkt(n, p_pk)
    if pkt % 128 != 0:
        raise ValueError("pkt must be a multiple of 128 (VPU lane width)")
    if sort_rays is None:
        sort_rays = n >= 16384 and packet_roots is None
    if islab is None:
        # Measured on v5e: at narrow packet widths the interval test's
        # conservatism (~10% more node visits) outweighs its cheaper
        # per-step cost (the kernel is step-latency bound there), but at
        # 2048-ray packets the vector phases dominate and the cheap
        # frustum test wins (+4% at 67M rays).
        islab = pkt >= 2048
    if kz_static is not None:
        if kz_static not in (0, 1, 2):
            raise ValueError("kz_static must be 0, 1 or 2 (axis index)")
        if march is not None:
            raise ValueError("kz_static does not compose with march")
        if not narrow:
            raise ValueError("kz_static needs the narrow leaf path")
    _check_leaf_loop(packed, narrow, leaf_loop)
    if tris128:
        if packed.leaf_size % 8 or not narrow:
            raise ValueError("tris128 needs lane-aligned leaves "
                             "(leaf_size % 8 == 0) and "
                             "the narrow leaf path")
    if sort_rays and packet_roots is not None:
        raise ValueError("sort_rays cannot reorder rays that carry "
                         "per-packet roots; pass sort_rays=False")
    if hbm_tris is None:
        nb = packed.tris.nbytes
        if nb <= VMEM_TRI_BUDGET_BYTES:
            hbm_tris = False  # legacy 16-lane VMEM layout (fastest)
        elif (nb <= VMEM128_TRI_BUDGET_BYTES and narrow
              and packed.leaf_size % 8 == 0
              and march is None):
            hbm_tris = False  # tris128 VMEM tier (auto in _trace_impl_fn)
        else:
            hbm_tris = True
    if hbm_tris and packed.leaf_size % 8 != 0:
        raise ValueError(
            "HBM-resident triangles require leaf_size % 8 == 0 "
            "(lane-aligned leaf rows); rebuild the scene accordingly")
    pad = (-n) % (p_pk * pkt)
    n_packets = (n + pad) // pkt
    if packet_roots is None:
        roots = jnp.zeros((n_packets,), jnp.int32)
    else:
        roots = jnp.asarray(packet_roots, jnp.int32)
        if roots.shape[0] > n_packets:
            raise ValueError(
                f"packet_roots has {roots.shape[0]} entries for "
                f"{n_packets} {pkt}-ray packets")
        if roots.shape[0] < n_packets:
            # Block-padding packets hold dead rays; any root works.
            roots = jnp.concatenate(
                [roots, jnp.zeros((n_packets - roots.shape[0],),
                                  jnp.int32)])
    qmask = None
    if filter_mask is not None:
        qmask = jnp.full((1,), int(filter_mask) & 0xFFFFFF, jnp.int32)
    if filter_fn is not None:
        # User filter callables run IN the leaf phase (rtk_filter_fn
        # intent, rtk.h:117,130): filter_fn must be jax-traceable and
        # takes a HitCandidate (trace/stack.py) of (rows, PKT) tiles,
        # returning a bool mask — the same contract as the stack engine.
        # The candidate's mesh/triangle identity rides the triangle table
        # as exact float columns, which caps exactness at 2^24.
        if not callable(filter_fn):
            raise TypeError("filter_fn must be callable")
        if packed.num_tris >= (1 << 24):
            raise ValueError(
                "packet-kernel filter callables need triangle ids exact "
                "in f32 (< 2^24 triangles); use the stack engine")
    if march is not None:
        # Fused macro-grid march (trace/grid.py build_grid(march=True)):
        # march = (dx, dy, dz, glo_x, glo_y, glo_z, cs_x, cs_y, cs_z),
        # all python scalars (static — one kernel per grid geometry).
        # The packed table must have one root per cell (entry id == cell).
        if dual or ordered:
            raise ValueError("march composes with the plain mixed-stack "
                             "kernel only (no dual/ordered)")
        march = (int(march[0]), int(march[1]), int(march[2]),
                 *(float(v) for v in march[3:9]))
    return _trace_impl(
        packed, jnp.asarray(rays.origin), jnp.asarray(rays.direction),
        jnp.asarray(rays.min_t), jnp.asarray(rays.max_t), roots, qmask,
        mode=mode, watertight=watertight, interpret=interpret, p_pk=p_pk,
        hbm_tris=hbm_tris, dual=dual, pkt=pkt, narrow=narrow,
        sort_rays=sort_rays, ordered=ordered, islab=islab, lesion=lesion,
        use_mask=filter_mask is not None, stats=stats,
        filter_fn=filter_fn, march=march,
        kz_static=None if kz_static is None else int(kz_static),
        tris128=tris128, leaf_loop=leaf_loop, defer_uv=defer_uv)


def uniform_kz(rays: Rays) -> int | None:
    """The batch's shared dominant |direction| axis, or None if mixed.

    Host-side check for the trace_packets(kz_static=...) contract (uses
    the kernel's exact tie rule: x beats y beats z at equal magnitude).
    """
    ad = np.abs(np.asarray(rays.direction, np.float32))
    maxc = ad.max(axis=1)
    kzr = np.where(ad[:, 0] == maxc, 0, np.where(ad[:, 1] == maxc, 1, 2))
    k0 = int(kzr[0])
    return k0 if bool((kzr == k0).all()) else None


@jax.jit
def _kz_bin_sort(origin, direction, min_t, max_t):
    """Sort rays by (dominant axis, coherence key); returns the sorted
    components + original index + per-axis counts."""
    from rtk_tpu.ops.morton import ray_coherence_key

    n = origin.shape[0]
    ad = jnp.abs(direction)
    maxc = jnp.max(ad, axis=1)
    kzr = jnp.where(ad[:, 0] == maxc, 0,
                    jnp.where(ad[:, 1] == maxc, 1, 2)).astype(jnp.uint32)
    ckey = ray_coherence_key(origin, direction)
    key = (kzr << jnp.uint32(30)) | (ckey >> jnp.uint32(2))
    idx = jnp.arange(n, dtype=jnp.int32)
    out = jax.lax.sort(
        (key, idx, origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2], min_t, max_t),
        num_keys=1)
    counts = jnp.bincount(kzr.astype(jnp.int32), length=3)
    return out, counts


def trace_packets_kz_binned(packed: PackedScene, rays: Rays,
                            pkt: int = 256, p_pk: int = 16,
                            **kw) -> PacketHits:
    """Incoherent-batch dispatcher: bin rays by dominant |direction| axis
    and trace each bin with its compile-time shear axis (kz_static).

    kz_static drops the leaf phase's 18 axis-select ops per triangle but
    demands a batch-uniform axis (uniform_kz); bounce batches are mixed,
    so this splits them into three axis-pure sub-batches after the usual
    coherence sort (one fused multi-operand device sort — the same sort
    trace_packets would have run for sort_rays), then runs up to three
    kernel dispatches and scatters the records back.  Axis-purity also
    tightens packet unions slightly (same-axis rays travel together).

    Costs one 3-int host sync for the bin widths; each width pads to a
    power-of-two block count so repeated batches reuse compiles.
    """
    n = rays.count
    blk = p_pk * pkt
    (key_s, idx_s, o0, o1, o2, d0, d1, d2, mnt, mxt), counts = _kz_bin_sort(
        jnp.asarray(rays.origin), jnp.asarray(rays.direction),
        jnp.asarray(rays.min_t), jnp.asarray(rays.max_t))
    cnt = [int(c) for c in np.asarray(counts)]  # the ONE host sync
    starts = [0, cnt[0], cnt[0] + cnt[1]]
    ms = []
    for c in cnt:
        if c == 0:
            ms.append(0)
            continue
        m = blk
        while m < c:
            m *= 2
        ms.append(m)
    run = _kz_binned_jit(tuple(ms), n, pkt, p_pk,
                         tuple(sorted(kw.items())))
    t_all, u_all, v_all, slot_all = run(
        packed, idx_s, o0, o1, o2, d0, d1, d2, mnt, mxt,
        jnp.asarray(starts, jnp.int32), jnp.asarray(cnt, jnp.int32),
        jnp.asarray(rays.max_t))
    return PacketHits(
        hit=slot_all >= 0, t=t_all, u_k=u_all, v_k=v_all, slot=slot_all,
        origin=jnp.asarray(rays.origin),
        direction=jnp.asarray(rays.direction),
        tri_v=packed.tri_v, tri_vidx=packed.tri_vidx,
        tri_mesh=packed.tri_mesh, tri_prim=packed.tri_prim,
        uv_deferred=bool(kw.get("defer_uv", False)))


@functools.lru_cache(maxsize=None)
def _kz_binned_jit(ms, n, pkt, p_pk, kwt):
    """One fused program for all (<= 3) kz bins: slice, trace with the
    bin's static shear axis, scatter records back.  Cached per
    (bin widths, n, block shape, flags)."""
    kw = dict(kwt)

    @jax.jit
    def run(packed, idx_s, o0, o1, o2, d0, d1, d2, mnt, mxt, s0s, cs,
            maxt_orig):
        mpad = max(max(ms), 1)
        padf = lambda a, fill: jnp.concatenate(
            [a, jnp.full((mpad,), fill, a.dtype)])
        idx_p = padf(idx_s, n)
        comps_p = [padf(a, 0.0) for a in (o0, o1, o2, d0, d1, d2, mnt)]
        mxt_p = padf(mxt, 0.0)
        t_all = maxt_orig
        u_all = jnp.zeros((n,), jnp.float32)
        v_all = jnp.zeros((n,), jnp.float32)
        slot_all = jnp.full((n,), -1, jnp.int32)
        for axis3 in range(3):
            m = ms[axis3]
            if m == 0:
                continue
            s0 = s0s[axis3]
            c = cs[axis3]
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, s0, m)
            live = jnp.arange(m) < c
            po0, po1, po2, pd0, pd1, pd2, pmnt = (
                sl(a) for a in comps_p)
            bin_rays = Rays(
                origin=jnp.stack([po0, po1, po2], axis=1),
                direction=jnp.stack([pd0, pd1, pd2], axis=1),
                min_t=pmnt,
                max_t=jnp.where(live, sl(mxt_p), 0.0))
            h = trace_packets(packed, bin_rays, sort_rays=False,
                              kz_static=axis3, pkt=pkt, p_pk=p_pk, **kw)
            improved = live & h.hit
            tgt = jnp.where(improved, sl(idx_p), n)
            t_all = t_all.at[tgt].set(h.t, mode="drop")
            u_all = u_all.at[tgt].set(h.u_k, mode="drop")
            v_all = v_all.at[tgt].set(h.v_k, mode="drop")
            slot_all = slot_all.at[tgt].set(h.slot, mode="drop")
        return t_all, u_all, v_all, slot_all

    return run


def trace_packets_chunked(packed: PackedScene, rays: Rays,
                          chunk: int = 1 << 24, **kw) -> PacketHits:
    """trace_packets with bounded working memory for huge ray batches.

    trace_packets materialises several N-sized intermediates besides its
    outputs (coherence-sort keys and permutations, packet-component
    tiles); past ~10^8 rays those overflow one chip's HBM.  This host
    loop traces `chunk`-ray slices — each slice is still ONE fused
    dispatch, so the fixed per-dispatch cost amortises while working
    memory stays O(chunk) — then concatenates the per-ray results.  The
    packed triangle tables are shared with the scene, not copied, and the
    result's origin/direction reuse the caller's ray arrays.

    A final partial slice is padded with dead rays (max_t=0 lanes retire
    in the first step) up to `chunk`, so every slice reuses one compiled
    program — a recompile costs more than tracing the dead pad.

    Equivalent single-dispatch semantics: rtk scales query count purely by
    host threads over an immutable blob (rtk.c:543-577); the analogue of
    "more rays than memory" is this bounded loop.
    """
    n = rays.count
    if n <= chunk:
        return trace_packets(packed, rays, **kw)
    outs = []
    for i in range(0, n, chunk):
        sl = jax.tree.map(lambda a: a[i:i + chunk], rays)
        pad = chunk - sl.count
        if pad:
            sl = Rays(
                origin=jnp.concatenate(
                    [sl.origin, jnp.zeros((pad, 3), jnp.float32)]),
                direction=jnp.concatenate(
                    [sl.direction,
                     jnp.tile(jnp.array([[1.0, 0.0, 0.0]], jnp.float32),
                              (pad, 1))]),
                min_t=jnp.concatenate(
                    [sl.min_t, jnp.zeros((pad,), jnp.float32)]),
                max_t=jnp.concatenate(
                    [sl.max_t, jnp.zeros((pad,), jnp.float32)]))
        h = trace_packets(packed, sl, **kw)
        if pad:
            h = h[:chunk - pad]
        outs.append(h)
    first = outs[0]
    cat = lambda f: jnp.concatenate([getattr(o, f) for o in outs])
    return first.replace(
        hit=cat("hit"), t=cat("t"), u_k=cat("u_k"), v_k=cat("v_k"),
        slot=cat("slot"), origin=rays.origin, direction=rays.direction)


def _refit_repack(scene, packed, tri_pos):
    """One frame's refit+repack prep: Scene (LBVH fixpoint/RMQ refit) or
    BinaryRefitAux (host-SAH topology, refit_packed_binary).  The type
    switch is static under jit (pytree structure)."""
    from rtk_tpu.trace.packed import BinaryRefitAux, refit_packed_binary

    if isinstance(scene, BinaryRefitAux):
        return scene, refit_packed_binary(packed, scene, tri_pos)
    from rtk_tpu.scene import refit as _refit
    from rtk_tpu.trace.packed import repack_bounds

    scene2 = _refit(scene, tri_pos)
    return scene2, repack_bounds(packed, scene2)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "watertight", "interpret", "p_pk", "hbm_tris",
                     "dual", "pkt", "narrow", "sort_rays", "ordered",
                     "islab", "leaf_loop", "defer_uv"),
)
def _refit_trace_jit(scene, packed, new_tri_pos, origin, direction, min_t,
                     max_t, roots, *, mode, watertight, interpret, p_pk,
                     hbm_tris, dual, pkt, narrow, sort_rays, ordered=False,
                     islab=False, leaf_loop=False, defer_uv=False):
    scene2, packed2 = _refit_repack(scene, packed, new_tri_pos)
    hits = _trace_impl(
        packed2, origin, direction, min_t, max_t, roots,
        mode=mode, watertight=watertight, interpret=interpret, p_pk=p_pk,
        hbm_tris=hbm_tris, dual=dual, pkt=pkt, narrow=narrow,
        sort_rays=sort_rays, ordered=ordered, islab=islab,
        leaf_loop=leaf_loop, defer_uv=defer_uv,
        lesion="noupdv" if defer_uv else None)
    return hits, scene2, packed2


def trace_packets_refit(packed: PackedScene, scene, new_tri_pos, rays: Rays,
                        mode: str = "closest", watertight: bool = True,
                        interpret: bool = False, p_pk: int = DEFAULT_P,
                        hbm_tris: bool | None = None, dual: bool = False,
                        pkt: int | None = None, narrow: bool = True,
                        sort_rays: bool | None = None,
                        ordered: bool = False, islab: bool = False,
                        leaf_loop: bool = False, defer_uv: bool = False):
    """Per-frame dynamic-scene step as ONE device program: refit the BVH to
    deformed vertices (same topology), regather the packed tables, trace.

    `scene` is either the LBVH Scene the PackedScene was packed from, or
    a BinaryRefitAux (build_sah_packed(refittable=True)) — the host-SAH
    topology refits on device with the same RMQ machinery, keeping its
    trace win for deforming scenes.

    Returns (hits, refit_scene, repacked_scene).  The deforming-mesh config
    is dispatch-bound when refit/repack/trace run as separate programs.
    """
    n = rays.count
    _check_leaf_loop(packed, narrow, leaf_loop)
    if pkt is None:
        pkt = 512 if n >= p_pk * 512 else 128
    if sort_rays is None:
        sort_rays = n >= 16384
    if hbm_tris is None:
        hbm_tris = packed.tris.nbytes > VMEM_TRI_BUDGET_BYTES
    pad = (-n) % (p_pk * pkt)
    roots = jnp.zeros(((n + pad) // pkt,), jnp.int32)
    return _refit_trace_jit(
        scene, packed, jnp.asarray(new_tri_pos, jnp.float32),
        jnp.asarray(rays.origin), jnp.asarray(rays.direction),
        jnp.asarray(rays.min_t), jnp.asarray(rays.max_t), roots,
        mode=mode, watertight=watertight, interpret=interpret, p_pk=p_pk,
        hbm_tris=hbm_tris, dual=dual, pkt=pkt, narrow=narrow,
        sort_rays=sort_rays, ordered=ordered, islab=islab,
        leaf_loop=leaf_loop, defer_uv=defer_uv)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "watertight", "interpret", "p_pk", "hbm_tris",
                     "dual", "pkt", "narrow", "sort_rays", "ordered",
                     "islab", "leaf_loop", "defer_uv"),
)
def _refit_trace_frames_jit(scene, packed, frames, origin, direction, min_t,
                            max_t, roots, *, mode, watertight, interpret,
                            p_pk, hbm_tris, dual, pkt, narrow, sort_rays,
                            ordered=False, islab=False, leaf_loop=False,
                            defer_uv=False):
    # Refit + repack ALL frames in one vmapped prep: the per-frame refit
    # is ~12 sequential RMQ gather levels (refit_ranges) + the repack
    # gathers, and under the old per-frame scan that serial chain was
    # paid F times.  Vmapped, each level runs once on (F, n, 3) tiles —
    # the scan body keeps only the trace (which is genuinely per-frame).
    # Extra memory is F copies of the node/tri tables (tiny for
    # deforming-clip scenes; a 10M-tri clip should use per-frame
    # trace_packets_refit instead).
    def prep(tri_pos):
        _, p2 = _refit_repack(scene, packed, tri_pos)
        return p2.nodes, p2.tris, p2.tri_v

    nodes_f, tris_f, triv_f = jax.vmap(prep)(frames)

    # The coherence sort permutes the SAME ray batch identically on every
    # frame — hoist it out of the scan: sort once here, trace each frame
    # with sort_rays=False, and un-permute the ray-indexed outputs once at
    # the end (one vmapped gather).  Saves F-1 multi-operand lax.sorts and
    # F per-frame unscatters.
    inv = None
    if sort_rays:
        from rtk_tpu.ops.morton import ray_coherence_key

        key = ray_coherence_key(origin, direction)
        idx = jnp.arange(origin.shape[0], dtype=jnp.int32)
        (_, sidx, o0, o1, o2, d0, d1, d2, min_t, max_t) = jax.lax.sort(
            (key, idx, origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2],
             min_t, max_t), num_keys=1)
        origin = jnp.stack([o0, o1, o2], axis=1)
        direction = jnp.stack([d0, d1, d2], axis=1)
        inv = jnp.zeros_like(sidx).at[sidx].set(idx)
        sort_rays = False

    def body(_, per_frame):
        nodes, tris, tri_v = per_frame
        packed2 = packed.replace(nodes=nodes, tris=tris, tri_v=tri_v)
        h = _trace_impl(
            packed2, origin, direction, min_t, max_t, roots,
            mode=mode, watertight=watertight, interpret=interpret,
            p_pk=p_pk, hbm_tris=hbm_tris, dual=dual, pkt=pkt,
            narrow=narrow, sort_rays=sort_rays, ordered=ordered,
            islab=islab, leaf_loop=leaf_loop, defer_uv=defer_uv,
            lesion="noupdv" if defer_uv else None)
        # u_k/v_k, not .u/.v: under defer_uv the latter are lazy
        # recomputes, which the scan must not force eagerly per frame.
        return (), (h.t, h.u_k, h.v_k, h.slot, tri_v)

    _, outs = jax.lax.scan(body, (), (nodes_f, tris_f, triv_f))
    if inv is not None:
        t, u, v, slot, tri_v = outs
        outs = (t[:, inv], u[:, inv], v[:, inv], slot[:, inv], tri_v)
    return outs


def trace_packets_refit_frames(packed: PackedScene, scene, frames_tri_pos,
                               rays: Rays, mode: str = "closest",
                               watertight: bool = True,
                               interpret: bool = False,
                               p_pk: int = DEFAULT_P,
                               hbm_tris: bool | None = None,
                               dual: bool = False, pkt: int | None = None,
                               narrow: bool = True,
                               sort_rays: bool | None = None,
                               ordered: bool = False, islab: bool = False,
                               leaf_loop: bool = False,
                               defer_uv: bool = False):
    """Animation sub-stepping executor: refit+repack+trace F deformation
    frames of one topology against one ray batch, as ONE device program
    (`lax.scan` over frames — the Pallas kernel compiles once and the
    per-dispatch cost amortises over the whole clip, which dominates
    small per-frame batches on remote-dispatch deployments).

    frames_tri_pos: (F, T, 3, 3) per-frame triangle vertices in soup
    order.  Returns a list of F PacketHits (frame order); index tables
    are shared (static topology), tri_v is per-frame.
    """
    n = rays.count
    _check_leaf_loop(packed, narrow, leaf_loop)
    if pkt is None:
        pkt = 512 if n >= p_pk * 512 else 128
    if sort_rays is None:
        sort_rays = n >= 16384
    if hbm_tris is None:
        hbm_tris = packed.tris.nbytes > VMEM_TRI_BUDGET_BYTES
    pad = (-n) % (p_pk * pkt)
    roots = jnp.zeros(((n + pad) // pkt,), jnp.int32)
    frames = jnp.asarray(frames_tri_pos, jnp.float32)
    t, u, v, slot, tri_v = _refit_trace_frames_jit(
        scene, packed, frames,
        jnp.asarray(rays.origin), jnp.asarray(rays.direction),
        jnp.asarray(rays.min_t), jnp.asarray(rays.max_t), roots,
        mode=mode, watertight=watertight, interpret=interpret, p_pk=p_pk,
        hbm_tris=hbm_tris, dual=dual, pkt=pkt, narrow=narrow,
        sort_rays=sort_rays, ordered=ordered, islab=islab,
        leaf_loop=leaf_loop, defer_uv=defer_uv)
    origin = jnp.asarray(rays.origin)
    direction = jnp.asarray(rays.direction)
    return [
        PacketHits(hit=slot[f] >= 0, t=t[f], u_k=u[f], v_k=v[f],
                   slot=slot[f],
                   origin=origin, direction=direction, tri_v=tri_v[f],
                   tri_vidx=packed.tri_vidx, tri_mesh=packed.tri_mesh,
                   tri_prim=packed.tri_prim, uv_deferred=defer_uv)
        for f in range(frames.shape[0])
    ]
