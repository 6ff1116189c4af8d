"""Fused in-kernel march vs flat packet engine: atrium 1M bounce (TPU).

VERDICT r3 item 4 target: >= 1.0 Mrays/s on the BASELINE config-3 bounce
batch (flat engine r2: 0.31; rounds-engine grid v2: 0.25).  Timing is
readback-synced (np.asarray of a 1-element slice) — block_until_ready
alone has been observed returning at enqueue on this tunnel
(PERF_NOTES r3 measurement hazard) — and every call's input bytes are
unique (min_t epsilon).
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import jax as _jax_cfg

try:  # persistent compile cache: re-runs skip the 30-90 s tunnel compiles
    _jax_cfg.config.update("jax_compilation_cache_dir", "/tmp/rtk_jax_cache")
    _jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from rtk_tpu.config import BuildConfig
from rtk_tpu.models.path import cosine_sample, geometric_normal
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.scene import build_from_soup
from rtk_tpu.trace.grid import (build_grid_from_scene, trace_packets_grid,
                                trace_packets_march, calibrate_caps)
from rtk_tpu.trace.packed import pack_scene
from rtk_tpu.testing import scenes
from rtk_tpu.types import Rays

T0 = time.perf_counter()


def log(s):
    print(f"[{time.perf_counter()-T0:6.0f}s] {s}", flush=True)


atr = scenes.atrium()
log(f"tris {atr.shape[0]}")
scene_a = build_from_soup(jnp.asarray(atr),
                          config=BuildConfig(branching=8, leaf_size=16))
packed_a16 = pack_scene(scene_a)
cam = scenes.camera_rays((0, 6, 9), (0, 2, 0), (0, 1, 0), 60, 1024, 1024,
                         order="morton")
prim = trace_packets(packed_a16, cam)
key = jax.random.PRNGKey(0)
nrm = geometric_normal(prim, cam.direction)
bdir = cosine_sample(key, nrm)
origin = prim.position() + 1e-3 * nrm
n = cam.count
maxt = jnp.where(prim.hit, np.float32(3.4e38), 0.0)
bounces = [Rays(origin=origin, direction=bdir,
                min_t=jnp.full((n,), 1e-3 + 1e-7 * i, jnp.float32),
                max_t=maxt) for i in range(8)]
log(f"bounce batch ready ({int(np.asarray(prim.hit).sum())} live rays)")


def timeit(f, iters=2, batches=2):
    out = f(bounces[-1])
    _ = np.asarray(out.t[:1])  # real sync (enqueue-level block hazard)
    best = float("inf")
    k = 0
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(bounces[k % len(bounces)])
            k += 1
        _ = np.asarray(out.t[:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


ref_hits = None
dt = timeit(lambda b: trace_packets(packed_a16, b, dual=True))
log(f"flat packet engine: {n/dt/1e6:.2f} Mrays/s ({dt*1e3:.0f} ms)")
ref = trace_packets(packed_a16, bounces[0], dual=True)
rh, rt = np.asarray(ref.hit), np.asarray(ref.t)

g = build_grid_from_scene(scene_a, packed=packed_a16, dims=(7, 3, 7),
                          march=True)
log("grid built (march pack)")

for mpkt in (128, 256, 512):
    try:
        f = lambda b, mpkt=mpkt: trace_packets_march(g, b, pkt=mpkt)
        dt = timeit(f)
        log(f"fused march pkt={mpkt}: {n/dt/1e6:.2f} Mrays/s "
            f"({dt*1e3:.0f} ms)")
        got = f(bounces[0])
        gh, gt = np.asarray(got.hit), np.asarray(got.t)
        both = gh & rh
        n_mask = int((gh != rh).sum())
        n_t = int((~np.isclose(gt[both], rt[both], rtol=1e-5,
                               atol=1e-5)).sum())
        frac = (n_mask + n_t) / max(gh.size, 1)
        log(f"  parity: {'OK' if frac < 1e-5 else 'MISMATCH'} "
            f"(mask diff {n_mask}, t diff {n_t})")
        del got, gh, gt
    except Exception as e:
        log(f"march pkt={mpkt}: FAILED {type(e).__name__}: {e}")

try:
    caps = calibrate_caps(g, bounces[0], rounds=8, skips=4)
    dt = timeit(lambda b: trace_packets_grid(g, b, rounds=8, skips=4,
                                             caps=caps))
    log(f"rounds-engine grid: {n/dt/1e6:.2f} Mrays/s ({dt*1e3:.0f} ms)")
except Exception as e:
    log(f"rounds engine: FAILED {type(e).__name__}: {e}")
log("DONE march_atrium")
