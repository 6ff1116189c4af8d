"""DEMOTED r5 (compat shim): the macro-grid DDA engine lives in
rtk_tpu.testing.grid now.

Both its rounds form and the fused in-kernel march lose to the flat
packet engine on every recorded TPU bounce measurement (grid 0.46-0.48,
march 0.40-0.43 vs flat 1.77 Mrays/s — PERF_NOTES grid/march entries),
so the product surface keeps ONE measured incoherent path (the flat
engine with ordered+prune+defer_uv narrow-wide blocks), following the
binned engine's r4 demotion.  The engine remains fully functional as a
correctness/reference design (disjoint-cell traversal, calibrate_caps,
march exactness-by-construction): Tracer(engine="grid"/"march") and
this import path keep working.
"""
from rtk_tpu.testing.grid import *  # noqa: F401,F403
from rtk_tpu.testing.grid import (build_grid, build_grid_from_scene,  # noqa: F401
                                  calibrate_caps, choose_dims,
                                  trace_packets_grid, trace_packets_march)
