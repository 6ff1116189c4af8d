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
                     tri_mask=None, step_quant: bool = False) -> PackedScene:
    """Build a PackedScene with host-native binned-SAH topology.

    Accepts the same mesh inputs as build_scene (MeshDesc, (positions,
    indices), TriangleSoup, or a sequence).  Returns the packet-kernel
    tables directly (no intermediate Scene: SAH topology has no Karras
    leaf-range structure to refit over — use the LBVH path for
    deforming scenes).

    step_quant: weight the SAH by leaf STEPS
    (ceil(count/leaf_size)) — the packet kernel tests leaves in fixed
    K-row tiles, so this is its real cost unit; leaf occupancy rises
    from ~0.72 to ~0.97 with ~26% fewer leaves and nodes.  Topology
    only; hit results are identical semantics either way.
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
        tri_prim=soup.tri_prim, tri_mask=tri_mask)
