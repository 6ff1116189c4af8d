"""Debug validation paths (SURVEY §5 sanitizer row): NaN/shape/index
checks for ray batches and scenes.

jit purity removes data races by design; what remains worth checking is
malformed INPUT — NaN/Inf rays, inverted t-windows, index tables pointing
outside their arrays.  These run eagerly (host round trip) and are meant
for debug builds and tests, not the hot path; `checkify_trace` wraps a
traced function with jax.experimental.checkify for in-jit NaN/div/oob
error surfacing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class ValidationError(ValueError):
    pass


def validate_rays(rays, name: str = "rays") -> None:
    """Raise ValidationError on NaN/Inf origins or directions, NaN
    t-window bounds, or all-zero directions (which trace as misses but
    usually indicate an upstream bug)."""
    o = np.asarray(rays.origin)
    d = np.asarray(rays.direction)
    mn = np.asarray(rays.min_t)
    mx = np.asarray(rays.max_t)
    if not np.isfinite(o).all():
        raise ValidationError(f"{name}.origin contains NaN/Inf")
    if not np.isfinite(d).all():
        raise ValidationError(f"{name}.direction contains NaN/Inf")
    if np.isnan(mn).any() or np.isnan(mx).any():
        raise ValidationError(f"{name} t-window contains NaN")
    if (np.abs(d).sum(axis=1) == 0).any():
        raise ValidationError(f"{name}.direction has all-zero rows")


def validate_scene(scene) -> None:
    """Structural invariants of a built Scene: finite bounds, child ids in
    range, leaf codes within the leaf table, triangle padding marked."""
    nb = np.asarray(scene.node_child)
    nn = nb.shape[0]
    n_leaf = scene.num_leaves
    internal = nb >= 0
    leaf = nb <= -2
    if internal.any() and int(nb[internal].max()) >= nn:
        raise ValidationError("node_child points past the node table")
    if leaf.any():
        codes = -nb[leaf] - 2
        if int(codes.max()) >= n_leaf:
            raise ValidationError("leaf code points past the leaf table")
    if not np.isfinite(np.asarray(scene.bounds_min)).all():
        raise ValidationError("scene bounds_min not finite")
    if not np.isfinite(np.asarray(scene.bounds_max)).all():
        raise ValidationError("scene bounds_max not finite")
    tv = np.asarray(scene.tri_v[: scene.num_tris])
    if not np.isfinite(tv).all():
        raise ValidationError("triangle vertices contain NaN/Inf")
    vidx = np.asarray(scene.tri_vidx[: scene.num_tris])
    if (vidx < 0).any():
        raise ValidationError("real triangles carry negative vertex ids")


def checkify_trace(fn):
    """Wrap a traced function with checkify NaN/div/oob checks.

    Returns wrapped(*args) -> (err, out); call err.throw() to surface.
    """
    from jax.experimental import checkify

    return checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks
        | checkify.div_checks)
