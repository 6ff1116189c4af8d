"""Grid engine: convergence-matched shrinking caps vs uniform caps.

Caps for round r+1 = marching_r + n_occ*unit (pad need) + slack, from a
debug_counts calibration run.  Target: beat flat 0.31 Mrays/s on the
atrium 1024^2 bounce batch."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtk_tpu.config import BuildConfig
from rtk_tpu.scene import build_from_soup
from rtk_tpu.trace.packed import pack_scene
from rtk_tpu.trace.grid import build_grid, calibrate_caps, trace_packets_grid
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.testing import scenes
from rtk_tpu.types import Rays
from rtk_tpu.models.path import cosine_sample, geometric_normal

T0 = time.perf_counter()
def log(s):
    print(f"[{time.perf_counter()-T0:6.0f}s] {s}", flush=True)

cfg = BuildConfig(branching=8, leaf_size=8)
atr = scenes.atrium()
scene_a = build_from_soup(jnp.asarray(atr), config=cfg)
packed_a = pack_scene(scene_a)
cam = scenes.camera_rays((0, 6, 9), (0, 2, 0), (0, 1, 0), 60, 1024, 1024,
                         order="morton")
prim = trace_packets(packed_a, cam)
jax.block_until_ready(prim.t)
key = jax.random.PRNGKey(0)
nrm = geometric_normal(prim, cam.direction)
bounce = Rays(origin=prim.position() + 1e-3 * nrm,
              direction=cosine_sample(key, nrm),
              min_t=jnp.full((cam.count,), 1e-3, jnp.float32),
              max_t=jnp.where(prim.hit, np.float32(3.4e38), 0.0))
jax.block_until_ready(bounce.origin)
ref = trace_packets(packed_a, bounce, sort_rays=True, dual=True)
rh = np.asarray(ref.hit)
jax.block_until_ready(ref.t)
t0 = time.perf_counter()
for _ in range(2):
    r2 = trace_packets(packed_a, bounce, sort_rays=True, dual=True)
jax.block_until_ready(r2.t)
dtf = (time.perf_counter() - t0) / 2
log(f"flat: {cam.count/dtf/1e6:.2f} Mrays/s ({dtf*1e3:.0f} ms) "
    f"hits={int(rh.sum())}")

def timeit(f, iters=2):
    out = f(); jax.block_until_ready(out.t)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    jax.block_until_ready(out.t)
    return (time.perf_counter() - t0) / iters

UNIT = 128
for dims in [(7, 3, 7), (10, 4, 10)]:
    g = build_grid(atr, config=cfg, flat=packed_a, scene=scene_a,
                   dims=dims)
    log(f"grid dims={g.dims} n_occ={g.n_occ}/{np.prod(g.dims)}")
    for rounds, skips in ((8, 4), (6, 4)):
        got, (cnts, res) = trace_packets_grid(
            g, bounce, rounds=rounds, skips=skips, unit=UNIT,
            debug_counts=True)
        gh = np.asarray(got.hit)
        miss = int((gh != rh).sum())
        marching = np.asarray(cnts)[:, 1]
        log(f"  r={rounds} s={skips} conv: {marching.tolist()} "
            f"residual={int(res)} mismatch={miss}")
        pad = g.n_occ * UNIT
        caps = tuple([2 ** 31 - 1]
                     + [int(m * 1.15) + pad for m in marching[:-1]])
        dt = timeit(lambda: trace_packets_grid(
            g, bounce, rounds=rounds, skips=skips, unit=UNIT, caps=caps))
        got2 = trace_packets_grid(g, bounce, rounds=rounds, skips=skips,
                                  unit=UNIT, caps=caps)
        miss2 = int((np.asarray(got2.hit) != rh).sum())
        log(f"  shrink-caps: {cam.count/dt/1e6:.2f} Mrays/s "
            f"({dt*1e3:.0f} ms) mismatch={miss2} caps={caps[:4]}...")
        dtu = timeit(lambda: trace_packets_grid(
            g, bounce, rounds=rounds, skips=skips, unit=UNIT))
        log(f"  uniform:     {cam.count/dtu/1e6:.2f} Mrays/s "
            f"({dtu*1e3:.0f} ms)")
        dtg = timeit(lambda: trace_packets_grid(
            g, bounce, rounds=rounds, skips=skips, unit=UNIT, caps=caps,
            sort_mode="gather"))
        log(f"  shrink+gathersort: {cam.count/dtg/1e6:.2f} Mrays/s "
            f"({dtg*1e3:.0f} ms)")
# primaries through the grid engine (spatial splits vs the flat tree's
# architectural overlap): one coarse-dims config, calibrated caps
g = build_grid(atr, config=cfg, flat=packed_a, scene=scene_a, dims=(7, 3, 7))
got, (cnts, res) = trace_packets_grid(g, cam, rounds=6, skips=4, unit=UNIT,
                                      debug_counts=True)
mh = np.asarray(trace_packets(packed_a, cam).hit)
log(f"grid primaries conv: {np.asarray(cnts)[:,1].tolist()} residual={int(res)} "
    f"mism={int((np.asarray(got.hit)!=mh).sum())}")
caps = tuple([2**31-1] + [int(m*1.15) + g.n_occ*UNIT
                          for m in np.asarray(cnts)[:-1,1]])
dtp = timeit(lambda: trace_packets_grid(g, cam, rounds=6, skips=4, unit=UNIT,
                                        caps=caps))
log(f"grid primaries: {cam.count/dtp/1e6:.2f} Mrays/s ({dtp*1e3:.0f} ms)")
dtf = timeit(lambda: trace_packets(packed_a, cam, sort_rays=False, dual=True))
log(f"flat primaries: {cam.count/dtf/1e6:.2f} Mrays/s ({dtf*1e3:.0f} ms)")
# K=16 flat: halves leaf steps AND doubles each HBM leaf DMA (512B -> 1KB),
# attacking the per-step DMA issue chatter (PERF_NOTES atrium attribution)
pk16 = pack_scene(build_from_soup(jnp.asarray(atr),
                                  config=BuildConfig(branching=8, leaf_size=16)))
dt16 = timeit(lambda: trace_packets(pk16, cam, sort_rays=False, dual=True))
log(f"flat primaries K=16: {cam.count/dt16/1e6:.2f} Mrays/s ({dt16*1e3:.0f} ms)")
dt16b = timeit(lambda: trace_packets(pk16, bounce, sort_rays=True, dual=True))
log(f"flat bounce K=16: {cam.count/dt16b/1e6:.2f} Mrays/s ({dt16b*1e3:.0f} ms)")
log("DONE")
