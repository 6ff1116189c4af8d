"""Patiently compile the on-device LBVH build programs into the shared
XLA compile cache (/tmp/rtk_jax_cache), so bench configs load them
instead of re-paying a tunnel compile that has been observed to stall
20+ minutes (r4).  Shapes match the bench configs exactly:
blob(6)=81,920 (build/bunny/instanced BLAS), atrium=409,600,
deforming_grid(96)=18,432, blob(9)=5,242,880 (build-at-scale).

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/warm_build_cache.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/rtk_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rtk_tpu import BuildConfig
from rtk_tpu.scene import build_from_soup
from rtk_tpu.testing import scenes


def log(m):
    print(m, file=sys.stderr, flush=True)


def warm(name, tris, cfg):
    t0 = time.time()
    try:
        s = build_from_soup(jnp.asarray(tris), config=cfg)
        np.asarray(s.node_min.reshape(-1)[:1])
        log(f"{name}: built in {time.time()-t0:.0f}s "
            f"({tris.shape[0]} tris)")
    except Exception as e:
        log(f"{name}: FAILED after {time.time()-t0:.0f}s: "
            f"{type(e).__name__}: {e}")


def main():
    cfg8 = BuildConfig(branching=8, leaf_size=8)
    cfg8k = BuildConfig(branching=8, leaf_size=8, wide_nodes=False)
    warm("blob6 k8", scenes.blob(subdivisions=6)[0], cfg8)
    warm("atrium k16", scenes.atrium(),
         BuildConfig(branching=8, leaf_size=16))
    warm("grid96 k8", scenes.deforming_grid(0.0, n=96), cfg8)
    warm("blob9 k8", scenes.blob(subdivisions=9)[0], cfg8)
    warm("blob9 k8 kernel", scenes.blob(subdivisions=9)[0], cfg8k)


if __name__ == "__main__":
    main()
