"""PackedScene: kernel-ready scene tables for the Pallas packet tracer.

The builder's wide nodes are binary-indexed with dead rows (builder/
collapse.py).  The packet kernel wants dense, VMEM-resident tables with
*arithmetically derivable* child ids so traversal needs no per-slot pointer
loads: we renumber live wide nodes in BFS order such that every node's
internal children occupy consecutive ids, and renumber leaves in the same
visit order so a node's leaf children are consecutive too.  Per node the
kernel then only needs (first_child, first_leaf, int_mask, leaf_mask).

This is the TPU analogue of rtk's linearizer (rtk.c:1509-1622): where rtk
emits level-ordered BVH4 nodes + packed leaf records into a relocatable
blob, we emit BFS-ordered SoA rows + reordered triangle rows into device
tables.

Packing runs once per topology (host NumPy); refit only regathers bounds
through saved mappings (jitted).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rtk_tpu.scene import Scene

Array = jax.Array

NODE_ROW_F32 = 8  # per child: [minx miny minz maxx maxy maxz meta0 meta1]
TRI_ROW_F32 = 16  # [v0(3) v1(3) v2(3) | 7 pad]


class PackedScene(struct.PyTreeNode):
    """Dense scene tables + mappings; product of pack_scene(scene).

    nodes holds 8 rows per wide node (one per child slot): columns 0-5 are
    the child AABB (f32 bitcast into an int32 table — see _gather_rows for
    the denormal-flush rationale), and the first two rows carry node
    metadata in columns 6-7: row0 = (first_child, first_leaf), row1 =
    (int_mask | leaf_mask << 8, unused).  This lets the kernel fetch bounds
    AND push metadata with a single (8, 8) dynamic slice per node.
    """

    nodes: Array  # (Nd*8, 8) i32 child rows with embedded meta
    meta: Array  # (Nd, 4) i32: first_child, first_leaf, int_mask|leaf_mask<<8, pad
    tris: Array  # (Tp, 16) f32 vertex rows in packed-leaf order
    # Hit-assembly arrays in packed order (indexed by kernel slot output).
    tri_v: Array  # (Tp, 3, 3) f32
    tri_vidx: Array  # (Tp, 3) i32
    tri_mesh: Array  # (Tp,) i32
    tri_prim: Array  # (Tp,) i32
    # Refit mappings.
    node_src: Array  # (Nd,) i32 old (binary-indexed) wide row per new row
    tri_perm: Array  # (Tp,) i32 old sorted-tri slot per new slot
    num_tris: int = struct.field(pytree_node=False)
    leaf_size: int = struct.field(pytree_node=False)

    @property
    def num_nodes(self) -> int:
        return self.meta.shape[0]

    @property
    def num_padded_tris(self) -> int:
        return self.tris.shape[0]


def _bfs_renumber(node_child: np.ndarray):
    """BFS over live wide nodes with contiguous child/leaf numbering.

    Returns (order, first_child, first_leaf, masks) where order[new] = old id
    and per-new-node metadata arrays.
    """
    order = [np.array([0], np.int64)]
    fcs, fls, msks = [], [], []
    next_new = 1
    next_leaf = 0
    frontier = np.array([0], np.int64)
    while frontier.size:
        ch = node_child[frontier]  # (F, 8)
        int_m = ch >= 0
        leaf_m = ch <= -2
        n_int = int_m.sum(1)
        n_leaf = leaf_m.sum(1)
        fc = next_new + np.concatenate([[0], np.cumsum(n_int)[:-1]])
        fl = next_leaf + np.concatenate([[0], np.cumsum(n_leaf)[:-1]])
        bits = (1 << np.arange(8, dtype=np.int64))[None, :]
        int_bits = (int_m * bits).sum(1)
        leaf_bits = (leaf_m * bits).sum(1)
        fcs.append(fc)
        fls.append(fl)
        msks.append(int_bits | (leaf_bits << 8))
        next_new += int(n_int.sum())
        next_leaf += int(n_leaf.sum())
        # Row-major order of internal children matches the fc ranks.
        frontier = ch[int_m].astype(np.int64)
        if frontier.size:
            order.append(frontier)
    return (
        np.concatenate(order).astype(np.int32),
        np.concatenate(fcs).astype(np.int32),
        np.concatenate(fls).astype(np.int32),
        np.concatenate(msks).astype(np.int32),
        next_leaf,
    )


def _leaf_visit_order(node_child: np.ndarray, order: np.ndarray):
    """Old leaf id per new leaf id (same BFS slot order as _bfs_renumber)."""
    out = []
    for old in order:
        ch = node_child[old]
        leafs = ch[ch <= -2]
        out.extend((-leafs - 2).tolist())
    return np.asarray(out, np.int64)


@functools.partial(jax.jit, static_argnames=("n_rows",))
def _gather_rows(node_min, node_max, node_src, meta, *, n_rows):
    """Build (Nd*8, 8) *int32* child rows from wide bounds (jit; reused by
    refit): columns 0-5 are bitcast f32 bounds, node meta goes in columns
    6-7 of rows 0-1.  The table is integer-typed because TPU flushes
    denormal f32 to zero — small meta ints bitcast into a float table
    would be silently destroyed by XLA data movement."""
    src = node_src
    cmin = jnp.take(node_min, src, axis=0)  # (Nd, 8, 3)
    cmax = jnp.take(node_max, src, axis=0)
    bounds = jax.lax.bitcast_convert_type(
        jnp.concatenate([cmin, cmax], axis=2), jnp.int32)  # (Nd, 8, 6) i32
    pad = jnp.zeros((n_rows, 8, 1), jnp.int32)
    rows = jnp.concatenate([bounds, pad, pad], axis=2)  # (Nd, 8, 8) i32
    rows = rows.at[:, 0, 6].set(meta[:, 0])  # first_child
    rows = rows.at[:, 0, 7].set(meta[:, 1])  # first_leaf
    rows = rows.at[:, 1, 6].set(meta[:, 2])  # int_mask | leaf_mask << 8
    return rows.reshape(n_rows * 8, 8)


@functools.partial(jax.jit, static_argnames=())
def _tri_rows(tri_v):
    tp = tri_v.shape[0]
    flat = tri_v.reshape(tp, 9)
    return jnp.concatenate([flat, jnp.zeros((tp, 7), jnp.float32)], axis=1)


def pack_scene(scene: Scene) -> PackedScene:
    """Pack a built Scene for the Pallas packet kernel (host renumber pass)."""
    if scene.branching != 8:
        raise ValueError("packet kernel requires branching=8 scenes")
    node_child = np.asarray(scene.node_child)
    order, fc, fl, masks, n_new_leaves = _bfs_renumber(node_child)
    assert n_new_leaves == scene.num_leaves, (n_new_leaves, scene.num_leaves)
    leaf_order = _leaf_visit_order(node_child, order)
    k = scene.leaf_size
    tri_perm = (leaf_order[:, None] * k + np.arange(k)[None, :]).reshape(-1)
    tri_perm = tri_perm.astype(np.int32)

    node_src = jnp.asarray(order, jnp.int32)
    meta = jnp.asarray(
        np.stack([fc, fl, masks, np.zeros_like(fc)], axis=1), jnp.int32)
    nodes = _gather_rows(scene.node_min, scene.node_max, node_src, meta,
                         n_rows=order.shape[0])
    perm = jnp.asarray(tri_perm, jnp.int32)
    tri_v = jnp.take(scene.tri_v, perm, axis=0)
    return PackedScene(
        nodes=nodes,
        meta=meta,
        tris=_tri_rows(tri_v),
        tri_v=tri_v,
        tri_vidx=jnp.take(scene.tri_vidx, perm, axis=0),
        tri_mesh=jnp.take(scene.tri_mesh, perm, axis=0),
        tri_prim=jnp.take(scene.tri_prim, perm, axis=0),
        node_src=node_src,
        tri_perm=perm,
        num_tris=scene.num_tris,
        leaf_size=k,
    )


def repack_bounds(packed: PackedScene, scene: Scene) -> PackedScene:
    """Refresh a PackedScene after Scene.refit (same topology, new bounds)."""
    nodes = _gather_rows(scene.node_min, scene.node_max, packed.node_src,
                         packed.meta, n_rows=packed.num_nodes)
    tri_v = jnp.take(scene.tri_v, packed.tri_perm, axis=0)
    return packed.replace(nodes=nodes, tris=_tri_rows(tri_v), tri_v=tri_v)
