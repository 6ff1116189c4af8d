"""TPU probe: attribute the grid rounds engine's cost on atrium bounce
(VERDICT r4 item 5 groundwork).

r3 recorded flat 1.03 / grid 0.48 / march 0.40-0.43 Mrays/s on the
atrium 1M bounce batch, but never attributed WHERE the grid engine's
2.1 s goes (per-round grouping sort vs kernel rows vs DDA/bookkeeping).
The engine has lesion flags for exactly this: nosort / nokernel /
norank (all wrong-results, timing only).  Also times the flat engine
with leaf_loop on/off and sort_mode=gather.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/bounce_lesion.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rtk_tpu import BuildConfig, Rays
from rtk_tpu.models.path import cosine_sample, geometric_normal
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.scene import build_from_soup
from rtk_tpu.trace.grid import (build_grid_from_scene, calibrate_caps,
                                trace_packets_grid)
from rtk_tpu.trace.packed import pack_binary_tree, pack_scene
from rtk_tpu.testing import scenes


def log(m):
    print(m, file=sys.stderr, flush=True)


def vary(rays, m=6):
    base = jnp.asarray(rays.min_t)
    vs = [Rays(origin=rays.origin, direction=rays.direction,
               min_t=base + jnp.float32(1e-7) * (i + 1),
               max_t=rays.max_t) for i in range(m)]
    i = [0]

    def nxt():
        i[0] += 1
        return vs[i[0] % m]
    return nxt


def timeit(fn, iters=2, batches=2):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    atr = scenes.atrium()
    scene_a = build_from_soup(jnp.asarray(atr),
                              config=BuildConfig(branching=8, leaf_size=16))
    try:
        from rtk_tpu.testing.native_oracle import NativeOracle

        orc = NativeOracle(atr.reshape(-1, 9), leaf_max=16, step_quant=True)
        packed_q16 = pack_binary_tree(atr, *orc.export_tree(), leaf_size=16)
        del orc
    except Exception as e:
        log(f"sahq build unavailable: {e}")
        packed_q16 = pack_scene(scene_a)
    cam = scenes.camera_rays((0, 6, 9), (0, 2, 0), (0, 1, 0), 60,
                             1024, 1024, order="morton")
    prim = trace_packets(packed_q16, cam)
    n = geometric_normal(prim, cam.direction)
    bounce = Rays(
        origin=prim.position() + 1e-3 * n,
        direction=cosine_sample(jax.random.PRNGKey(0), n),
        min_t=jnp.full((cam.count,), 1e-3, jnp.float32),
        max_t=jnp.where(prim.hit, np.float32(3.4e38), 0.0))
    nxt = vary(bounce)
    N = cam.count

    # flat engine baselines
    for tag, kw in (("flat dual", dict(dual=True)),
                    ("flat dual leaf_loop", dict(dual=True, leaf_loop=True)),
                    ):
        dt = timeit(lambda: trace_packets(packed_q16, nxt(), **kw))
        log(f"{tag}: {dt:.3f}s -> {N/dt/1e6:.2f} Mrays/s")

    # grid rounds engine + lesions
    g = build_grid_from_scene(scene_a, packed=packed_q16, dims=(7, 3, 7))
    caps = calibrate_caps(g, bounce, rounds=8, skips=4)
    for tag, kw in (("grid", {}),
                    ("grid nosort", dict(lesion="nosort")),
                    ("grid nokernel", dict(lesion="nokernel")),
                    ("grid nosort+nokernel",
                     dict(lesion="nosort nokernel")),
                    ("grid norank", dict(lesion="norank")),
                    ("grid gather-sort", dict(sort_mode="gather")),
                    ("grid unit256", dict(unit=256)),
                    ):
        try:
            u = kw.pop("unit", 128)
            dt = timeit(lambda: trace_packets_grid(
                g, nxt(), rounds=8, skips=4, caps=caps, unit=u, **kw))
            log(f"{tag}: {dt:.3f}s -> {N/dt/1e6:.2f} Mrays/s")
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
