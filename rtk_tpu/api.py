"""Public API: build scenes, trace ray batches, refit.

Mirrors the reference lifecycle (rtk.h:119-130) in batched, functional form:
    rtk_build_scene   -> build_scene(meshes) -> Scene (device pytree)
    rtk_trace_ray     -> trace_closest(scene, rays) -> Hits
    rtk_trace_ray_filter -> trace_any / trace_closest(filter_fn=...)
    (no rtk refit exists; refit() is the dynamic-scene entry)
The incremental task-based lifecycle (rtk_start_build / rtk_run_task /
rtk_finish_build) lives in rtk_tpu.tasks.
"""
from __future__ import annotations

from rtk_tpu.builder.sah import build_sah_packed
from rtk_tpu.config import BuildConfig, TraceConfig
from rtk_tpu.mesh import MeshDesc, TriangleSoup, build_soup
from rtk_tpu.scene import Scene, build_from_soup, refit
from rtk_tpu.tracer import Tracer, jit_filter
from rtk_tpu.trace.stack import trace_any, trace_closest
from rtk_tpu.types import Hits, PacketHits, Rays
from rtk_tpu.utils.serialize import (load_any, load_instanced_scene,
                                     load_packed_scene, load_scene,
                                     save_instanced_scene,
                                     save_packed_scene, save_scene)


def build_scene(meshes, config: BuildConfig = BuildConfig()) -> Scene:
    """Build a Scene from one or more meshes.

    Accepts a MeshDesc, a (positions, indices) tuple, a TriangleSoup, or a
    sequence of the first two.  Decode happens on host (strides/dtypes/
    callbacks, rtk.c:1028-1114 parity); the BVH build runs on device.
    """
    if isinstance(meshes, TriangleSoup):
        soup = meshes
    else:
        soup = build_soup(meshes)
    return build_from_soup(
        soup.tri_pos, soup.tri_vidx, soup.tri_mesh, soup.tri_prim, config
    )


__all__ = [
    "BuildConfig",
    "TraceConfig",
    "MeshDesc",
    "TriangleSoup",
    "Rays",
    "Hits",
    "PacketHits",
    "Scene",
    "Tracer",
    "jit_filter",
    "build_scene",
    "build_sah_packed",
    "build_from_soup",
    "refit",
    "trace_closest",
    "trace_any",
    "save_scene",
    "load_scene",
    "save_packed_scene",
    "load_packed_scene",
    "save_instanced_scene",
    "load_instanced_scene",
    "load_any",
]
