"""TPU probe: honest LBVH build throughput at scale (VERDICT r4 item 2).

The r3 bench measured 3.4 Mtris/s at 82k tris — pure dispatch floor
(~24 ms fixed for a sub-ms build).  This probe times build_from_soup at
82k/1.3M/5.2M tris with unique input bytes per call (translate by
1e-6*i, the PERF_NOTES measurement hazard) and a real readback sync.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python tools/staged/build_scale.py
"""
import itertools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtk_tpu import BuildConfig
from rtk_tpu.scene import build_from_soup
from rtk_tpu.testing import scenes


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(scene):
    np.asarray(scene.node_min.reshape(-1)[:1])


def main():
    cfg = BuildConfig(branching=8, leaf_size=8)
    for sub in (6, 8, 9):
        tris = scenes.blob(subdivisions=sub)[0]
        n = tris.shape[0]
        base = jnp.asarray(tris)
        nvar = 8
        variants = [jax.block_until_ready(base + 1e-6 * i)
                    for i in range(nvar)]
        ctr = itertools.count()
        t0 = time.time()
        sync(build_from_soup(variants[0], config=cfg))  # compile
        log(f"blob({sub}) = {n} tris: compile+first {time.time()-t0:.1f}s")
        iters = 6 if n < 2_000_000 else 4
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                s = build_from_soup(variants[next(ctr) % nvar], config=cfg)
            sync(s)
            best = min(best, (time.perf_counter() - t0) / iters)
        log(f"blob({sub}) = {n} tris: {best*1e3:.2f} ms/build "
            f"-> {n/best/1e6:.1f} Mtris/s")


if __name__ == "__main__":
    main()
