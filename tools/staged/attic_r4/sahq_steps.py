"""Step-quantized SAH (rtko_build3) step-count check AT HEADLINE DENSITY.

Methodology lesson from the r2 SAH entry (PERF_NOTES): topology verdicts
flip with packet density, so the interpret-mode predictor must run at the
TARGET ray density.  Here we generate the full 8192^2 Morton headline
camera and trace a CONTIGUOUS slice of it — Morton-contiguous rays form
exactly the same 2048-ray packets as the full run, so steps/block on the
slice equals steps/block of those blocks in the 67M trace.

Question: does quantized SAH (occupancy 0.97 vs 0.72, 26% fewer leaves,
but SA-weighted expected leaf visits UNCHANGED at ~2.9) actually reduce
union step counts, or is the SA argument exact for tight packets?
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from rtk_tpu.ops import pallas_trace as pt
from rtk_tpu.trace.packed import pack_binary_tree
from rtk_tpu.testing import scenes
from rtk_tpu.testing.native_oracle import NativeOracle
from rtk_tpu.types import Rays

T0 = time.perf_counter()


def log(s):
    print(f"[{time.perf_counter()-T0:6.0f}s] {s}", flush=True)


def run_steps(pk, rays, pkt, ordered=True):
    P = pt.DEFAULT_P
    n = rays.count
    assert n % (P * pkt) == 0

    def comp(a, fill):
        return jnp.asarray(a).reshape(n // pkt, pkt)

    comps = (comp(rays.origin[:, 0], 0.), comp(rays.origin[:, 1], 0.),
             comp(rays.origin[:, 2], 0.),
             comp(rays.direction[:, 0], 1.),
             comp(rays.direction[:, 1], 0.),
             comp(rays.direction[:, 2], 0.),
             comp(rays.min_t, 0.), comp(rays.max_t, 0.))
    roots = jnp.zeros((n // pkt,), jnp.int32)
    qmask = jnp.full((1,), 0xFFFFFF, jnp.int32)
    kzs = jnp.zeros((n // pkt,), jnp.int32)
    out = pt._run_kernel(pk.nodes, pk.tris, comps, roots, qmask, kzs,
                         mode="closest", watertight=True, interpret=True,
                         num_tris=pk.num_tris, leaf_size=pk.leaf_size,
                         stats=True, pkt=pkt, dual=True, ordered=ordered)
    steps = np.asarray(out[4])[::P, 0]
    t = np.asarray(out[0]).reshape(-1)
    hit = t < np.asarray(rays.max_t)
    return steps, hit, t


tris = scenes.blob(subdivisions=6)[0]
log(f"tris {tris.shape[0]}")
side = 8192
cam = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                         side, side, order="morton")
log(f"rays {cam.count} (headline camera, Morton)")

PKT = 2048
NSLICE = int(sys.argv[1]) if len(sys.argv) > 1 else 2 * 1024 * 1024
# A Morton-contiguous slice away from the image corner (the center of
# the Morton curve covers on-object pixels; index 16M..16M+NSLICE).
OFF = 16 * 1024 * 1024
sl = slice(OFF, OFF + NSLICE)
rays = Rays(origin=jnp.asarray(cam.origin[sl]),
            direction=jnp.asarray(cam.direction[sl]),
            min_t=jnp.asarray(cam.min_t[sl]),
            max_t=jnp.asarray(cam.max_t[sl]))
log(f"slice {NSLICE} rays at offset {OFF}")

ref = None
for tag, k, sq in [("sah-k16", 16, False), ("sahq-k16", 16, True),
                   ("sahq-k8", 8, True)]:
    orc = NativeOracle(tris.reshape(-1, 9), leaf_max=k, step_quant=sq)
    pk = pack_binary_tree(tris, *orc.export_tree(), leaf_size=k)
    t0 = time.perf_counter()
    steps, hit, t = run_steps(pk, rays, PKT, ordered=True)
    log(f"{tag}: steps/block mean={steps.mean():.1f} sum={int(steps.sum())} "
        f"max={int(steps.max())} hits={int(hit.sum())} "
        f"({time.perf_counter()-t0:.0f}s)")
    if ref is None:
        ref = hit
    elif (hit != ref).any():
        log(f"  hit-count delta: {int(hit.sum()-ref.sum())} "
            f"(tie divergence tolerated)")
log("DONE sahq_steps")
