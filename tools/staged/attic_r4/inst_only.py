import time
import jax, jax.numpy as jnp
import numpy as np
from rtk_tpu import BuildConfig, Rays
from rtk_tpu.scene import build_from_soup
from rtk_tpu.testing import scenes
def timeit(fn, iters=5, batches=3):
    out = fn(); jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
print("dev", jax.devices(), flush=True)
cfg = BuildConfig(branching=8, leaf_size=8)
# ---- instanced wavefront (bench config 5) with sorted grouping ----
from rtk_tpu.instancing import (build_instanced, pack_instanced,
                                trace_closest_instanced_packets)
from rtk_tpu.models.path import cosine_sample, geometric_normal
import functools

btris = scenes.blob(subdivisions=6)[0]
blas = build_from_soup(jnp.asarray(btris), config=cfg)
n_inst, side5 = 125, 5
tf = np.zeros((n_inst, 3, 4), np.float32)
rng5 = np.random.default_rng(7)
for i in range(n_inst):
    gx, gy, gz = i % side5, (i // side5) % side5, i // (side5 * side5)
    sc = 0.35 + 0.15 * rng5.random()
    tf[i, :, :3] = np.eye(3, dtype=np.float32) * sc
    tf[i, :, 3] = (np.array([gx, gy, gz], np.float32) * 1.1
                   + rng5.random(3).astype(np.float32) * 0.2)
iscene = build_instanced([blas], np.zeros(n_inst, np.int64), tf)
pscene = pack_instanced(iscene)
cam5 = scenes.camera_rays((7, 6.5, 8), (2.2, 2.2, 2.2), (0, 1, 0), 55,
                          512, 512, order="morton")
key5 = jax.random.PRNGKey(5)
CAND5 = 4

hits, _ = trace_closest_instanced_packets(pscene, cam5,
                                          max_candidates=CAND5)
jax.block_until_ready(hits.t)
print("primary inst hits:", int(np.asarray(hits.hit).sum()), flush=True)
dt = timeit(lambda: trace_closest_instanced_packets(
    pscene, cam5, max_candidates=CAND5)[0], iters=2, batches=2)
print(f"instanced primary 262k: {dt*1e3:.0f} ms "
      f"{cam5.count/dt/1e6:.2f} Mrays/s", flush=True)

scene_lo5 = jnp.asarray(tf[:, :, 3].min(axis=0) - 1.0)
scene_hi5 = jnp.asarray(tf[:, :, 3].max(axis=0) + 2.0)
from rtk_tpu.models.path import _ray_sort_key

@jax.jit
def _bounce_prep(hits, rays_b, kd):
    nrm = geometric_normal(hits, rays_b.direction)
    nd = cosine_sample(kd, nrm)
    origin = hits.position() + 1e-3 * nrm
    alive = hits.hit
    key32 = _ray_sort_key(
        Rays(origin=origin, direction=nd, min_t=rays_b.min_t,
             max_t=rays_b.max_t), scene_lo5, scene_hi5)
    order = ((~alive).astype(jnp.uint32) << 28) | (key32 >> 4)
    perm = jnp.argsort(order, stable=True)
    return nd, origin, perm, jnp.sum(alive)

@functools.partial(jax.jit, static_argnames=("m",))
def _take_rays(origin, nd, perm, n_alive, *, m):
    take = lambda a: jnp.take(a, perm[:m], axis=0)
    live = jnp.arange(m) < n_alive
    return Rays(origin=take(origin), direction=take(nd),
                min_t=jnp.full((m,), 1e-3, jnp.float32),
                max_t=jnp.where(live, np.float32(3.4e38), 0.0))

def wavefront4():
    rays_b = cam5
    total = rays_b.count
    k = key5
    hits, _ = trace_closest_instanced_packets(pscene, rays_b,
                                              max_candidates=CAND5)
    for bounce in range(3):
        k, kd = jax.random.split(k)
        nd, origin, perm, n_alive_dev = _bounce_prep(hits, rays_b, kd)
        n_alive = int(n_alive_dev)
        if n_alive == 0:
            break
        m = min(rays_b.count,
                max(1024, 1 << int(np.ceil(np.log2(n_alive)))))
        rays_b = _take_rays(origin, nd, perm, n_alive_dev, m=m)
        hits, _ = trace_closest_instanced_packets(pscene, rays_b,
                                                  max_candidates=CAND5)
        total += n_alive
    jax.block_until_ready(hits.t)
    return total

total5 = wavefront4()
t1 = time.perf_counter()
total5 = wavefront4()
dt = time.perf_counter() - t1
print(f"instanced 4-bounce wavefront: {total5} rays in {dt*1e3:.0f} ms "
      f"-> {total5/dt/1e6:.2f} Mrays/s", flush=True)
