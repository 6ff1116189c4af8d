"""CPU step-count predictor for packet-kernel experiments.

The kernel's cost model is t = steps * (a*P + b*P*PKT + c) (PERF_NOTES),
and interpret mode executes the SAME program as the TPU — so step counts
measured on CPU predict TPU wall-time ratios for topology/leaf-size/
stepping experiments without touching the tunnel.  This methodology
produced the SAH-topology and leaf-size ledger entries (2026-08-18).

Usage:
  python tools/steps_predict.py [subdiv] [side] [pkt]
  # variants are edited in VARIANTS below
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtk_tpu.config import BuildConfig
from rtk_tpu.ops import pallas_trace as pt
from rtk_tpu.scene import build_from_soup
from rtk_tpu.trace.packed import pack_scene
from rtk_tpu.testing import scenes


def run_steps(pk, rays, pkt, mode="closest", dual=False, p_pk=None):
    """Interpret-mode kernel run returning (steps_per_block, hits, t)."""
    P = p_pk or pt.DEFAULT_P
    n = rays.count
    pad = (-n) % (P * pkt)
    npad = n + pad

    def comp(a, fill):
        a = jnp.asarray(a)
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(npad // pkt, pkt)

    comps = (comp(rays.origin[:, 0], 0.), comp(rays.origin[:, 1], 0.),
             comp(rays.origin[:, 2], 0.),
             comp(rays.direction[:, 0], 1.),
             comp(rays.direction[:, 1], 0.),
             comp(rays.direction[:, 2], 0.),
             comp(rays.min_t, 0.), comp(rays.max_t, 0.))
    roots = jnp.zeros((npad // pkt,), jnp.int32)
    qmask = jnp.full((1,), 0xFFFFFF, jnp.int32)
    kzs = jnp.zeros((npad // pkt,), jnp.int32)
    out = pt._run_kernel(pk.nodes, pk.tris, comps, roots, qmask, kzs,
                         mode=mode, watertight=True, interpret=True,
                         num_tris=pk.num_tris, leaf_size=pk.leaf_size,
                         stats=True, pkt=pkt, dual=dual, p_pk=P)
    steps = np.asarray(out[4])[::P, 0]
    t = np.asarray(out[0]).reshape(-1)[:n]
    hit = t < np.asarray(rays.max_t)
    return steps, hit, t


# (tag, leaf_size, dual) — edit freely per experiment.
VARIANTS = [("k8", 8, False), ("k16", 16, False), ("k8-dual", 8, True)]


def main():
    sub = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    pkt = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    tris = scenes.blob(subdivisions=sub)[0]
    cam = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                             side, side, order="morton")
    print(f"tris {tris.shape[0]} rays {side}x{side} pkt {pkt}", flush=True)
    ref = None
    for tag, k, dual in VARIANTS:
        cfg = BuildConfig(branching=8, leaf_size=k)
        pk = pack_scene(build_from_soup(jnp.asarray(tris), config=cfg))
        t0 = time.perf_counter()
        steps, hit, _ = run_steps(pk, cam, pkt, dual=dual)
        print(f"{tag}: steps/block mean={steps.mean():.1f} "
              f"sum={int(steps.sum())} max={int(steps.max())} "
              f"hits={int(hit.sum())} ({time.perf_counter()-t0:.0f}s)",
              flush=True)
        if ref is None:
            ref = hit
        elif (hit != ref).any():
            print(f"  PARITY MISMATCH: {int((hit != ref).sum())} rays",
                  flush=True)


if __name__ == "__main__":
    main()
