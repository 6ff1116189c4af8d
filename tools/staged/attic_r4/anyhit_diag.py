"""Any-hit vs closest on the bench shadow batch: step counts + variants.

Post lane-cull fix, any-hit still measured 40.7 vs 77.5 Mrays/s closest
(refit_any probe).  Quantify: kernel step counts per mode (stats=True),
dual on/off, and a sorted-vs-unsorted check — if steps are ~equal, the
problem is stack drain (pops continue after all lanes found hits)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtk_tpu.config import BuildConfig
from rtk_tpu.scene import build_from_soup
from rtk_tpu.trace.packed import pack_scene
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.testing import scenes
from rtk_tpu.types import Rays

T0 = time.perf_counter()
def log(s):
    print(f"[{time.perf_counter()-T0:6.0f}s] {s}", flush=True)

cfg = BuildConfig(branching=8, leaf_size=8)
tris = scenes.blob(subdivisions=6)[0]
packed = pack_scene(build_from_soup(jnp.asarray(tris), config=cfg))
cam = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                         2048, 2048, order="morton")
hits = trace_packets(packed, cam, sort_rays=False, dual=True)
p = np.asarray(hits.position())
light = np.array([3.0, 4.0, 2.0], np.float32)
d = light[None] - p
dist = np.linalg.norm(d, axis=1)
shadow = Rays.make(p, d / np.maximum(dist[:, None], 1e-9), min_t=1e-3,
                   max_t=np.where(np.asarray(hits.hit), dist, 0.0))
n = shadow.count
log(f"shadow rays {n}, live {int(np.asarray(hits.hit).sum())}")

def timeit(f, iters=3, batches=2):
    out = f(); jax.block_until_ready(out.t)
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        jax.block_until_ready(out.t)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

for tag, kw in [("closest dual", dict(mode="closest", dual=True)),
                ("any dual", dict(mode="any", dual=True)),
                ("any", dict(mode="any")),
                ("any dual sorted", dict(mode="any", dual=True,
                                         sort_rays=True)),
                ("closest dual sorted", dict(mode="closest", dual=True,
                                             sort_rays=True))]:
    dt = timeit(lambda: trace_packets(packed, shadow, **kw))
    log(f"{tag}: {n/dt/1e6:.1f} Mrays/s ({dt*1e3:.0f} ms)")

# step counts
for tag, kw in [("closest dual", dict(mode="closest", dual=True)),
                ("any dual", dict(mode="any", dual=True))]:
    out, st = trace_packets(packed, shadow, stats=True, **kw)
    st = np.asarray(st)
    log(f"{tag} steps: total={st.sum()} max/block={st.max()} "
        f"mean={st.mean():.1f}")
log("DONE")
