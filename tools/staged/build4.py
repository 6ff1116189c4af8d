"""E2E timing of the rebuilt SoA build at 5.24M tris (r5).

Measures build_from_soup (new sort-carry SoA pipeline + scan topology +
flat RMQ refit) with and without the wide collapse, plus the 82k scene.

Run: JAX_PLATFORMS=axon python tools/staged/build4.py
"""
import itertools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from rtk_tpu import BuildConfig
from rtk_tpu.scene import build_from_soup
from rtk_tpu.testing import scenes

P = lambda *a: print(*a, flush=True)


def main():
    P(f"devices: {jax.devices()}")
    for sub, nvar, iters in ((6, 4, 6), (9, 2, 3)):
        tris = scenes.blob(subdivisions=sub)[0]
        t = tris.shape[0]
        tvars = [jax.block_until_ready(jnp.asarray(tris) + 1e-6 * i)
                 for i in range(nvar)]
        for wide in (True, False):
            cfg = BuildConfig(branching=8, leaf_size=8, wide_nodes=wide)
            ctr = itertools.count()
            s = build_from_soup(tvars[0], config=cfg)
            np.asarray(s.bin_min.ravel()[:1])
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(iters):
                    s = build_from_soup(tvars[next(ctr) % nvar],
                                        config=cfg)
                np.asarray(s.bin_min.ravel()[:1])
                best = min(best, (time.perf_counter() - t0) / iters)
            P(f"  blob({sub}) {t} tris wide={wide}: {best*1e3:9.2f} ms "
              f"({t/best/1e6:.1f} Mtris/s)")


if __name__ == "__main__":
    main()
