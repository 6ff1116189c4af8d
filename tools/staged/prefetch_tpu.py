"""Staged TPU timing: cross-step double-buffered leaf DMA (`prefetch`).

Target: HBM-resident scenes (atrium 410k tris) where PERF_NOTES r2
attributes ~2x of the primary-ray gap to per-leaf-step DMA issue/wait
chatter (~3 us/step).  The prefetch variant starts next step's leaf
triangle DMAs the moment this step's pushes land, hiding the latency
behind the leaf phase instead of only the slab test.

Variants: baseline vs prefetch on primaries and an incoherent bounce
batch, at K=8 and K=16 (fewer leaf steps = fewer DMAs; combined
candidate).  Hits are parity-checked against baseline per batch.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from rtk_tpu.config import BuildConfig
from rtk_tpu.models.path import cosine_sample, geometric_normal
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.scene import build_from_soup
from rtk_tpu.testing import scenes
from rtk_tpu.trace.packed import pack_scene

T0 = time.perf_counter()


def log(s):
    print(f"[{time.perf_counter()-T0:6.0f}s] {s}", flush=True)


def timeit(f, iters=3, batches=2):
    out = f()
    jax.block_until_ready(out.t)
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        jax.block_until_ready(out.t)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


atr = scenes.atrium()
log(f"atrium {atr.shape[0]} tris")
cam = scenes.camera_rays((0, 6, 9), (0, 2, 0), (0, 1, 0), 60, 1024, 1024,
                         order="morton")
n = cam.count

for k in (8, 16):
    packed = pack_scene(build_from_soup(
        jnp.asarray(atr), config=BuildConfig(branching=8, leaf_size=k)))
    prim = trace_packets(packed, cam, dual=True, sort_rays=False)
    nrm = geometric_normal(prim, cam.direction)
    bdir = cosine_sample(jax.random.PRNGKey(0), nrm)
    from rtk_tpu.types import Rays
    bounce = Rays(origin=prim.position() + 1e-3 * nrm, direction=bdir,
                  min_t=jnp.full((n,), 1e-3, jnp.float32),
                  max_t=jnp.where(prim.hit, np.float32(3.4e38), 0.0))
    for name, rays in (("primary", cam), ("bounce", bounce)):
        ref = None
        for pf in (False, True):
            f = lambda: trace_packets(packed, rays, dual=True,
                                      sort_rays=False, prefetch=pf)
            dt = timeit(f)
            tag = f"k{k} {name} prefetch={int(pf)}"
            log(f"{tag}: {n/dt/1e6:.2f} Mrays/s ({dt*1e3:.1f} ms)")
            gh = np.asarray(f().hit)
            if ref is None:
                ref = gh
            else:
                ok = (gh == ref).all()
                log(f"  parity: {'OK' if ok else 'MISMATCH %d' % int((gh != ref).sum())}")
log("DONE prefetch-dma")
