"""Staged TPU validation: AOT packet-trace artifact on the real chip.

Exports the compiled packet-trace program (utils/aot.py), reloads it,
and checks bit-parity with the direct call on the bunny-class scene —
plus wall-clock for load+first-call vs a cold jit, the number the
serving story rests on.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from rtk_tpu.config import BuildConfig
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.scene import build_from_soup
from rtk_tpu.testing import scenes
from rtk_tpu.trace.packed import pack_scene
from rtk_tpu.utils.aot import export_packet_trace, load_packet_trace

T0 = time.perf_counter()


def log(s):
    print(f"[{time.perf_counter()-T0:6.1f}s] {s}", flush=True)


log(f"device: {jax.devices()[0]}")
btris = scenes.blob(subdivisions=6)[0]
packed = pack_scene(build_from_soup(
    jnp.asarray(btris), config=BuildConfig(branching=8, leaf_size=8)))
rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                          1024, 1024, order="morton")

t0 = time.perf_counter()
blob = export_packet_trace(packed, rays.count, dual=True, sort_rays=False)
log(f"export: {len(blob)} bytes in {time.perf_counter()-t0:.1f}s")

t0 = time.perf_counter()
lt = load_packet_trace(blob)
h = lt(packed, rays)
np.asarray(h.t[:1])  # real sync (enqueue-level block hazard)
log(f"load+first-call: {time.perf_counter()-t0:.1f}s")

ref = trace_packets(packed, rays, sort_rays=False, dual=True)
ok_t = bool(np.array_equal(np.asarray(h.t), np.asarray(ref.t)))
ok_hit = bool(np.array_equal(np.asarray(h.hit), np.asarray(ref.hit)))
log(f"parity vs direct: t={ok_t} hit={ok_hit}")

# Unique input bytes per timed call + readback sync (PERF_NOTES r3
# measurement hazards).
from rtk_tpu.types import Rays

varied = [Rays(origin=rays.origin, direction=rays.direction,
               min_t=jnp.full((rays.count,), 1e-7 * (i + 1), jnp.float32),
               max_t=rays.max_t) for i in range(5)]
t0 = time.perf_counter()
for i in range(5):
    h = lt(packed, varied[i])
np.asarray(h.t[:1])
dt = (time.perf_counter() - t0) / 5
log(f"steady-state artifact call: {dt*1e3:.1f} ms "
    f"({rays.count/dt/1e6:.1f} Mrays/s)")

# Cold-jit comparison in the SAME process class: time a fresh jit of the
# direct call (compile included) for the "zero-warmup serving" claim.
t0 = time.perf_counter()
h2 = trace_packets(packed, varied[0], sort_rays=False, dual=True,
                   pkt=512)  # distinct pkt -> genuinely cold kernel build
np.asarray(h2.t[:1])
log(f"cold jit+compile of a NEW kernel variant: "
    f"{time.perf_counter()-t0:.1f}s (vs artifact load+first-call above)")
log("DONE aot-tpu")
