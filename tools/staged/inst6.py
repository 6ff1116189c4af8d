"""TPU probe: the bench 4-bounce instanced WAVEFRONT with pooled
calibrated caps (one caps tuple = elementwise max of the primary's and
bounces' measured live counts -> ONE fused-program compile).

r4 record 0.40 Mrays/s; closest-only calibrated caps gave +7% (inst5).
The wavefront's bounce batches are where late rounds should collapse
hardest (most rays prove in round 0 on incoherent batches).

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/inst6.py
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rtk_tpu import BuildConfig, Rays
from rtk_tpu.builder.sah import build_sah_forest
from rtk_tpu.instancing import (build_instanced, pack_instanced,
                                trace_closest_instanced_packets,
                                caps_from_counts)
from rtk_tpu.models.path import cosine_sample, geometric_normal
from rtk_tpu.ops.morton import morton3d
from rtk_tpu.scene import build_from_soup
from rtk_tpu.testing import scenes


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cfg = BuildConfig(branching=8, leaf_size=8)
    blas_tris = scenes.blob(subdivisions=6)[0]
    blas = build_from_soup(jnp.asarray(blas_tris), config=cfg)
    sah_pack = build_sah_forest([blas_tris], cfg)
    n_inst, side = 125, 5
    tf = np.zeros((n_inst, 3, 4), np.float32)
    rng5 = np.random.default_rng(7)
    for i in range(n_inst):
        gx, gy, gz = i % side, (i // side) % side, i // (side * side)
        sc = 0.35 + 0.15 * rng5.random()
        tf[i, :, :3] = np.eye(3, dtype=np.float32) * sc
        tf[i, :, 3] = (np.array([gx, gy, gz], np.float32) * 1.1
                       + rng5.random(3).astype(np.float32) * 0.2)
    iscene = build_instanced([blas], np.zeros(n_inst, np.int64), tf)
    pscene = pack_instanced(iscene, packed=sah_pack[0],
                            packed_roots=sah_pack[1])
    cam5 = scenes.camera_rays((7, 6.5, 8), (2.2, 2.2, 2.2), (0, 1, 0), 55,
                              1024, 1024, order="morton")
    key5 = jax.random.PRNGKey(5)
    CAND5 = 12
    scene_lo5 = jnp.asarray(tf[:, :, 3].min(axis=0) - 1.0)
    scene_hi5 = jnp.asarray(tf[:, :, 3].max(axis=0) + 2.0)

    def _ray_sort_key(rays, lo, hi):
        dn = rays.direction / jnp.maximum(
            jnp.linalg.norm(rays.direction, axis=1, keepdims=True), 1e-30)
        probe = rays.origin + dn * 0.5
        return morton3d(probe, lo, hi, bits=10)

    @jax.jit
    def _bounce_prep(hits, rays_b, kd):
        nrm = geometric_normal(hits, rays_b.direction)
        nd = cosine_sample(kd, nrm)
        origin = hits.position() + 1e-3 * nrm
        alive = hits.hit
        key32 = _ray_sort_key(
            Rays(origin=origin, direction=nd,
                 min_t=rays_b.min_t, max_t=rays_b.max_t),
            scene_lo5, scene_hi5)
        order = ((~alive).astype(jnp.uint32) << 28) | (key32 >> 4)
        perm = jnp.argsort(order, stable=True)
        return nd, origin, perm, jnp.sum(alive)

    @functools.partial(jax.jit, static_argnames=("m",))
    def _take_rays(origin, nd, perm, n_alive, *, m):
        take = lambda a: jnp.take(a, perm[:m], axis=0)
        live = jnp.arange(m) < n_alive
        return Rays(
            origin=take(origin), direction=take(nd),
            min_t=jnp.full((m,), 1e-3, jnp.float32),
            max_t=jnp.where(live, np.float32(3.4e38), 0.0))

    def vary_cam(mv=6):
        base = jnp.asarray(cam5.min_t)
        vs = [Rays(origin=cam5.origin, direction=cam5.direction,
                   min_t=base + jnp.float32(1e-7) * (i + 1),
                   max_t=cam5.max_t) for i in range(mv)]
        i = [0]

        def nxt():
            i[0] += 1
            return vs[i[0] % mv]
        return nxt

    nxt_cam5 = vary_cam()

    def wavefront4(k=None, caps=None, collect=None):
        rays_b = nxt_cam5()
        total = rays_b.count
        m = rays_b.count
        k = key5 if k is None else k
        kw = dict(max_candidates=CAND5, leaf_loop=True, ordered=True,
                  p_pk=16)
        if caps is not None:
            kw["round_caps"] = caps
        if collect is not None:
            out = trace_closest_instanced_packets(
                pscene, rays_b, return_live_counts=True, **kw)
            hits, _, cnt = out
            collect.append(np.asarray(cnt))
        else:
            hits, _ = trace_closest_instanced_packets(pscene, rays_b, **kw)
        for bounce in range(3):
            k, kd = jax.random.split(k)
            nd, origin, perm, n_alive_dev = _bounce_prep(hits, rays_b, kd)
            n_alive = int(n_alive_dev)
            if n_alive == 0:
                break
            rays_b = _take_rays(origin, nd, perm, n_alive_dev, m=m)
            if collect is not None:
                out = trace_closest_instanced_packets(
                    pscene, rays_b, return_live_counts=True, **kw)
                hits, _, cnt = out
                collect.append(np.asarray(cnt))
            else:
                hits, _ = trace_closest_instanced_packets(pscene, rays_b,
                                                          **kw)
            total += n_alive
        np.asarray(hits.t[:1])
        return total

    # --- calibration pass (uncapped, collects counts) ---
    t0 = time.time()
    col = []
    total_cal = wavefront4(collect=col)
    pooled = np.max(np.stack(col), axis=0)
    caps = caps_from_counts(pooled, cam5.count, n_inst, p_pk=16)
    log(f"calibration {time.time()-t0:.1f}s  pooled={list(pooled)}  "
        f"caps={caps}")

    # --- r4 reference ---
    t0 = time.time()
    total = wavefront4()
    log(f"base warm-up {time.time()-t0:.1f}s  rays={total}")
    t1 = time.perf_counter()
    total = wavefront4(jax.random.PRNGKey(11))
    dt = time.perf_counter() - t1
    log(f"base wavefront: {total} rays in {dt*1e3:.0f} ms "
        f"-> {total/dt/1e6:.2f} Mrays/s")

    # --- pooled caps ---
    t0 = time.time()
    total = wavefront4(caps=caps)
    log(f"caps warm-up {time.time()-t0:.1f}s")
    t1 = time.perf_counter()
    total = wavefront4(jax.random.PRNGKey(11), caps=caps)
    dt = time.perf_counter() - t1
    log(f"caps wavefront: {total} rays in {dt*1e3:.0f} ms "
        f"-> {total/dt/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
