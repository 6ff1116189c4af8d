"""Collapse the binary LBVH into a wide (BVH4/BVH8) SoA node array.

The reference collapses its binary build tree into BVH4 by taking
grandchildren, two levels at a time (rtk.c:1570-1622); this generalises the
same idea to log2(W) levels, computed for every node in parallel:

  * a binary internal node becomes a wide node iff depth % log2(W) == 0;
  * its wide children are all binary descendants exactly log2(W) levels
    below (leaves encountered earlier become direct children);
  * empty slots get inverted bounds (+1/-1) so any slab test fails, exactly
    like rtk's empty BVH4 slots (rtk.c:1612-1620).

Output arrays are sized by the binary internal-node count (a static upper
bound on the wide-node count); only rows reachable from wide node 0 (the
root) are ever touched by traversal.
"""
from __future__ import annotations

import jax.numpy as jnp

from rtk_tpu.builder.lbvh import is_leaf_code, leaf_id_of

EMPTY = -1  # python int: keep module constants off-device


def collapse_wide(left, right, node_min, node_max, leaf_min, leaf_max,
                  branching: int):
    """Build wide SoA nodes from the binary topology.

    Args:
      left/right: (Li,) binary child arrays (shared encoding).
      node_min/node_max: (Li, 3) refit binary bounds.
      leaf_min/leaf_max: (L, 3) leaf bounds.
      branching: W in {2, 4, 8}.

    Wide nodes are indexed by their *binary* node id: a binary node at
    depth % log2(W) == 0 owns the wide-node row of the same index (other
    rows are dead and never reachable from the root, row 0).  This keeps the
    child translation trivial; a later host-side compaction pass can densify
    the rows for very large scenes.

    Returns:
      wide_child: (Li, W) i32 — >=0 wide node index (== binary id), -1
        empty, <=-2 leaf.  Doubles as the refit source encoding.
      wide_min/wide_max: (Li, W, 3) f32 child bounds.
    """
    k = {2: 1, 4: 2, 8: 3}[branching]
    n_int = left.shape[0]

    def expand(slots):
        """Each internal slot -> its two binary children; leaves/empties
        keep their value in the left position and pad with EMPTY."""
        out = []
        for s in slots:
            internal = s >= 0
            si = jnp.clip(s, 0, n_int - 1)
            out.append(jnp.where(internal, jnp.take(left, si), s))
            out.append(jnp.where(internal, jnp.take(right, si), EMPTY))
        return out

    i = jnp.arange(n_int, dtype=jnp.int32)
    slots = [jnp.take(left, i), jnp.take(right, i)]
    for _ in range(k - 1):
        slots = expand(slots)
    src = jnp.stack(slots, axis=1)  # (Li, W) binary ids / leaf codes / EMPTY

    wide_min, wide_max = gather_slot_bounds(
        src, node_min, node_max, leaf_min, leaf_max
    )
    return src.astype(jnp.int32), wide_min, wide_max


def gather_slot_bounds(src, node_min, node_max, leaf_min, leaf_max):
    """Child-slot AABBs from binary-tree sources (also used by refit).

    Empty slots get inverted bounds (min=+1, max=-1) like rtk.c:1612-1620.
    """
    n_int = node_min.shape[0]
    n_leaf = leaf_min.shape[0]
    internal = src >= 0
    leaf = is_leaf_code(src)
    si = jnp.clip(src, 0, n_int - 1)
    li = jnp.clip(leaf_id_of(src), 0, n_leaf - 1)
    # Per-component gathers keep the lane dimension wide; gathering whole
    # (..., 3) rows leaves most TPU lanes idle.
    wmin, wmax = [], []
    for c in range(3):
        nmin = jnp.take(node_min[:, c], si)
        lmin = jnp.take(leaf_min[:, c], li)
        wmin.append(jnp.where(internal, nmin,
                              jnp.where(leaf, lmin, jnp.float32(1.0))))
        nmax = jnp.take(node_max[:, c], si)
        lmax_ = jnp.take(leaf_max[:, c], li)
        wmax.append(jnp.where(internal, nmax,
                              jnp.where(leaf, lmax_, jnp.float32(-1.0))))
    return jnp.stack(wmin, axis=-1), jnp.stack(wmax, axis=-1)
