"""Atrium (HBM-resident, 410k tris) topology + flag sweep: primary and
1-bounce diffuse (the bench config-3 batches).

Levers untested on the atrium since the K=16 win (PERF_NOTES r2):
  * SAH / step-quantized SAH topology (static scene -> host build is
    legitimate; the bunny headline gained +40% from SAH).
  * leaf_size 32 under quantized SAH (occupancy 0.95): HBM leaf DMA
    chatter dominates this scene (~3 us/step) — halving leaf steps again
    may pay where it lost on the VMEM bunny.
  * ordered(+prune) on the bounce batch: the atrium interior is nearly
    closed (most bounce rays hit), which is exactly where stale-subtree
    pruning was predicted to pay (PERF_NOTES r1 ledger).
Timing hardened (unique input bytes + 1-element readback).
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtk_tpu import BuildConfig
from rtk_tpu.models.path import cosine_sample, geometric_normal
from rtk_tpu.ops.pallas_trace import trace_packets, uniform_kz
from rtk_tpu.scene import build_from_soup
from rtk_tpu.trace.packed import pack_binary_tree, pack_scene
from rtk_tpu.testing import scenes
from rtk_tpu.testing.native_oracle import NativeOracle
from rtk_tpu.types import Rays

T0 = time.perf_counter()


def log(s):
    print(f"[{time.perf_counter()-T0:6.0f}s] {s}", flush=True)


atr = scenes.atrium()
log(f"tris {atr.shape[0]}")

cam = scenes.camera_rays((0, 6, 9), (0, 2, 0), (0, 1, 0), 60, 1024, 1024,
                         order="morton")
n = cam.count
log(f"primary rays {n}, uniform_kz={uniform_kz(cam)}")

packs = {}
packs["lbvh-k16"] = pack_scene(build_from_soup(
    jnp.asarray(atr), config=BuildConfig(branching=8, leaf_size=16)))
for tag, k, sq in [("sah-k16", 16, False), ("sahq-k16", 16, True),
                   ("sahq-k32", 32, True)]:
    orc = NativeOracle(atr.reshape(-1, 9), leaf_max=k, step_quant=sq)
    packs[tag] = pack_binary_tree(atr, *orc.export_tree(), leaf_size=k)
    del orc
log("packs built")

# Bounce batch off the lbvh-k16 primary hits (same recipe as bench
# config_atrium — the bounce DIRECTIONS are what matters, topology of the
# primary pass does not).
prim = trace_packets(packs["lbvh-k16"], cam)
key = jax.random.PRNGKey(0)
nrm = geometric_normal(prim, cam.direction)
bdir = cosine_sample(key, nrm)
borig = prim.position() + 1e-3 * nrm
bounce = Rays(origin=borig, direction=bdir,
              min_t=jnp.full((n,), 1e-3, jnp.float32),
              max_t=jnp.where(prim.hit, np.float32(3.4e38), 0.0))
log(f"bounce batch live {int(np.asarray(prim.hit).sum())}")


def vary(rays, m=6):
    return [Rays(origin=rays.origin, direction=rays.direction,
                 min_t=jnp.asarray(rays.min_t) + jnp.float32(1e-7) * (i + 1),
                 max_t=rays.max_t) for i in range(m)]


def timeit(f, rays, iters=2, batches=2):
    vs = vary(rays)
    out = f(vs[-1])
    _ = np.asarray(out.t[:1])
    nh = int(np.asarray(out.hit).sum())
    best = float("inf")
    k = 0
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(vs[k % len(vs)])
            k += 1
        _ = np.asarray(out.t[:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, nh


for tag, pk in packs.items():
    log(f"{tag}: table {pk.tris.nbytes/2**20:.1f} MB logical "
        f"({pk.tris.shape[0]} rows)")

# tris128 makes a VMEM-resident atrium possible for the first time (the
# (Tp,16) layout cost 8x logical bytes; 410k tris ~ 27-35 MB now).  The
# r2 attribution blamed ~2x of the atrium gap on per-leaf-step HBM DMA
# issue/wait — "vmem" variants measure exactly that.
for batch_name, rays in [("primary", cam), ("bounce", bounce)]:
    nh_ref = None
    for ptag in ("lbvh-k16", "sah-k16", "sahq-k16", "sahq-k32"):
        for fname, kw in [
                ("dual hbm", dict(dual=True)),
                ("dual vmem", dict(dual=True, hbm_tris=False)),
                ("ordered+prune vmem", dict(ordered=True, hbm_tris=False)),
        ]:
            if fname == "dual hbm" and ptag not in ("lbvh-k16", "sahq-k16"):
                continue  # HBM baseline only where informative
            if fname.startswith("ordered") and ptag != "sahq-k16":
                continue  # prune variant only on the quantized pack
            try:
                pk = packs[ptag]
                f = lambda c: trace_packets(pk, c, sort_rays=False, **kw)
                dt, nh = timeit(f, rays)
                note = ""
                if nh_ref is None:
                    nh_ref = nh
                elif nh != nh_ref:
                    note = f"  HIT DELTA {nh - nh_ref:+d}"
                log(f"{batch_name} {ptag} {fname}: {n/dt/1e6:.2f} Mrays/s "
                    f"({dt*1e3:.0f} ms, {nh} hits){note}")
            except Exception as e:
                log(f"{batch_name} {ptag} {fname}: FAILED "
                    f"{type(e).__name__}: {str(e).splitlines()[0][:120]}")
log("DONE atrium_sah")
