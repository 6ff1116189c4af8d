"""SAH build option: host-native binned-SAH topology, device-packed.

The default builder is the on-device LBVH (builder/lbvh.py) — right for
dynamic scenes and build throughput.  For static scenes traced many
times, a higher-quality tree pays for itself: this module builds the
binary topology with the native C++ binned-SAH builder (the reference's
build strategy, rtk.c:867-1019, corrected per SURVEY §2.9) and feeds it
through the same greedy wide collapse as the LBVH path, so the packet
kernel sees an identical table format.

Build cost is host-side and single-threaded (~tens of ms per 100k
tris); trace semantics are bit-compatible with the LBVH path (same
kernel, same hit-record contract).
"""
from __future__ import annotations

import numpy as np

from rtk_tpu.config import BuildConfig
from rtk_tpu.trace.packed import PackedScene, pack_binary_tree


def build_sah_packed(meshes, config: BuildConfig = BuildConfig(),
                     tri_mask=None, step_quant: bool = False,
                     refittable: bool = False):
    """Build a PackedScene with host-native binned-SAH topology.

    Accepts the same mesh inputs as build_scene (MeshDesc, (positions,
    indices), TriangleSoup, or a sequence).  Returns the packet-kernel
    tables directly (no intermediate Scene).

    step_quant: weight the SAH by leaf STEPS
    (ceil(count/leaf_size)) — the packet kernel tests leaves in fixed
    K-row tiles, so this is its real cost unit; leaf occupancy rises
    from ~0.72 to ~0.97 with ~26% fewer leaves and nodes.  Topology
    only; hit results are identical semantics either way.

    refittable=True returns (packed, BinaryRefitAux) instead: the binned
    SAH partitions triangles in place, so the tree refits on device with
    the same RMQ machinery as the LBVH (refit_packed_binary /
    trace_packets_refit[_frames]) — deforming scenes keep the SAH
    topology's trace win as long as the deformation doesn't degrade the
    static tree's quality (re-build when it does).
    """
    from rtk_tpu.mesh import TriangleSoup, build_soup
    from rtk_tpu.utils.native_sah import NativeOracle

    soup = meshes if isinstance(meshes, TriangleSoup) else build_soup(meshes)
    tri_pos = np.asarray(soup.tri_pos, np.float32)
    orc = NativeOracle(tri_pos.reshape(-1, 9), leaf_max=config.leaf_size,
                       step_quant=step_quant)
    return pack_binary_tree(
        tri_pos, *orc.export_tree(), leaf_size=config.leaf_size,
        tri_vidx=soup.tri_vidx, tri_mesh=soup.tri_mesh,
        tri_prim=soup.tri_prim, tri_mask=tri_mask,
        return_refit_aux=refittable)


def build_sah_forest(blas_tri_pos, config: BuildConfig = BuildConfig(),
                     step_quant: bool = True):
    """Host-SAH trees for a BLAS forest, packed as ONE multi-root table.

    blas_tri_pos: sequence of (T_b, 3, 3) soups, one per unique BLAS.
    Returns (PackedScene, packed_roots) where packed_roots[b] is the
    packed entry id of BLAS b — drop-in for the instanced path's
    pack_forest output (pack_instanced(iscene, packed=...,
    packed_roots=...)); the packed tri_prim holds per-BLAS-soup
    triangle ids, matching the merged-LBVH path's record contract.
    """
    from rtk_tpu.utils.native_sah import NativeOracle

    k = config.leaf_size
    parts = []
    for tp in blas_tri_pos:
        tp = np.asarray(tp, np.float32).reshape(-1, 3, 3)
        orc = NativeOracle(tp.reshape(-1, 9), leaf_max=k,
                           step_quant=step_quant)
        parts.append((tp, orc.export_tree()))
        del orc
    lefts, rights, firsts, counts, los, his, orders, roots = (
        [], [], [], [], [], [], [], [])
    prims = []
    node_off = 0
    tri_off = 0
    for b, (tp, (left, right, first, count, lo, hi, order, root)) in \
            enumerate(parts):
        lefts.append(np.where(left >= 0, left + node_off, -1))
        rights.append(np.where(right >= 0, right + node_off, -1))
        firsts.append(first + tri_off)
        counts.append(count)
        los.append(lo)
        his.append(hi)
        orders.append(order.astype(np.int64) + tri_off)
        roots.append(root + node_off)
        # records report the PER-BLAS triangle index (rtk.h:41 intent:
        # primitive id within its BLAS soup), mesh id 0 — matching the
        # merged-LBVH path's default-soup convention (merge_blas keeps
        # each BLAS Scene's own tri_mesh/tri_prim).
        prims.append(np.arange(tp.shape[0], dtype=np.int64))
        node_off += left.shape[0]
        tri_off += tp.shape[0]
    tri_v = np.concatenate([tp for tp, _ in parts])
    meshes = np.zeros(tri_v.shape[0], np.int64)
    pk = pack_binary_tree(
        tri_v, np.concatenate(lefts), np.concatenate(rights),
        np.concatenate(firsts), np.concatenate(counts),
        np.concatenate(los), np.concatenate(his),
        np.concatenate(orders), np.asarray(roots, np.int64),
        leaf_size=k, tri_mesh=meshes, tri_prim=np.concatenate(prims))
    return pk, np.arange(len(parts), dtype=np.int64)
