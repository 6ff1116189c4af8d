"""TPU probe: instanced wavefront levers beyond caps (r5).

inst6: pooled calibrated caps 0.37 -> 0.41 Mrays/s.  Remaining pools:
the C=12 candidates argmin passes (every bounce pays them) and the
object-space traversal quality.  Variants: C=8 (residual catches the
tail; pooled counts show rounds 8+ hold < 100 rays), K=16 BLAS forest
(fewer leaf steps; the bounce-record topology), and both.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/inst7.py
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
    packs = {}
    sp8 = build_sah_forest([blas_tris], cfg)
    packs[8] = pack_instanced(iscene, packed=sp8[0], packed_roots=sp8[1])
    cfg16 = BuildConfig(branching=8, leaf_size=16)
    sp16 = build_sah_forest([blas_tris], cfg16)
    packs[16] = pack_instanced(iscene, packed=sp16[0],
                               packed_roots=sp16[1])
    cam5 = scenes.camera_rays((7, 6.5, 8), (2.2, 2.2, 2.2), (0, 1, 0), 55,
                              1024, 1024, order="morton")
    key5 = jax.random.PRNGKey(5)
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

    def wavefront4(pscene, C, k=None, caps=None, collect=None):
        rays_b = nxt_cam5()
        total = rays_b.count
        m = rays_b.count
        k = key5 if k is None else k
        kw = dict(max_candidates=C, leaf_loop=True, ordered=True, p_pk=16)
        if caps is not None:
            kw["round_caps"] = caps

        def trace(rb):
            if collect is not None:
                h, _, cnt = trace_closest_instanced_packets(
                    pscene, rb, return_live_counts=True, **kw)
                collect.append(np.asarray(cnt))
                return h
            h, _ = trace_closest_instanced_packets(pscene, rb, **kw)
            return h

        hits = trace(rays_b)
        for bounce in range(3):
            k, kd = jax.random.split(k)
            nd, origin, perm, n_alive_dev = _bounce_prep(hits, rays_b, kd)
            n_alive = int(n_alive_dev)
            if n_alive == 0:
                break
            rays_b = _take_rays(origin, nd, perm, n_alive_dev, m=m)
            hits = trace(rays_b)
            total += n_alive
        np.asarray(hits.t[:1])
        return total

    for name, kf, C in (("C8 K8", 8, 8), ("C12 K16", 16, 12),
                        ("C8 K16", 16, 8)):
        try:
            ps = packs[kf]
            t0 = time.time()
            col = []
            wavefront4(ps, C, collect=col)
            pooled = np.max(np.stack(col), axis=0)
            caps = caps_from_counts(pooled, cam5.count, n_inst, p_pk=16)
            log(f"{name}: calibration {time.time()-t0:.1f}s caps={caps}")
            t0 = time.time()
            total = wavefront4(ps, C, caps=caps)
            log(f"{name}: warm-up {time.time()-t0:.1f}s rays={total}")
            t1 = time.perf_counter()
            total = wavefront4(ps, C, k=jax.random.PRNGKey(11), caps=caps)
            dt = time.perf_counter() - t1
            log(f"{name}: {total} rays in {dt*1e3:.0f} ms "
                f"-> {total/dt/1e6:.2f} Mrays/s  [inst6 caps ref 0.41]")
        except Exception as e:
            import traceback
            log(f"{name}: FAILED {type(e).__name__}: {e}")
            traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
