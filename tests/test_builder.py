"""LBVH builder structural invariants."""
import jax.numpy as jnp
import numpy as np

from rtk_tpu import BuildConfig, build_scene
from rtk_tpu.builder.lbvh import karras_topology, node_depths, node_parents
from rtk_tpu.ops.morton import expand_bits10, morton3d, sort_by_morton
from rtk_tpu.testing import scenes


def test_expand_bits():
    out = np.asarray(expand_bits10(jnp.asarray([0b1111111111], jnp.uint32)))
    assert out[0] == 0b1001001001001001001001001001
    out = np.asarray(expand_bits10(jnp.asarray([1, 2, 4], jnp.uint32)))
    assert list(out) == [1, 8, 64]


def test_morton_ordering_locality():
    # Points on a line must sort in spatial order.
    pts = np.stack([np.linspace(0, 1, 100)] * 3, axis=1)
    lo = jnp.zeros(3, jnp.float32)
    hi = jnp.ones(3, jnp.float32)
    codes = np.asarray(morton3d(jnp.asarray(pts, jnp.float32), lo, hi))
    assert (np.diff(codes.astype(np.int64)) >= 0).all()


def test_sort_by_morton_total_order():
    codes = jnp.asarray([5, 1, 5, 0], jnp.uint32)
    s, perm = sort_by_morton(codes)
    assert list(np.asarray(s)) == [0, 1, 5, 5]
    assert list(np.asarray(perm)) == [3, 1, 0, 2]  # ties keep index order


def _check_topology(left, right, n_leaf):
    """Walk the binary tree on host: every leaf reached exactly once, every
    internal node exactly once, ranges contiguous."""
    left = np.asarray(left)
    right = np.asarray(right)
    seen_leaf = np.zeros(n_leaf, bool)
    seen_node = np.zeros(n_leaf - 1, bool)

    def walk(c):
        lo = None
        hi = None
        stack = [c]
        order = []
        while stack:
            c = stack.pop()
            if c <= -2:
                leaf = -c - 2
                assert not seen_leaf[leaf]
                seen_leaf[leaf] = True
                order.append(leaf)
            else:
                assert not seen_node[c]
                seen_node[c] = True
                stack.append(right[c])
                stack.append(left[c])
        return order

    order = walk(0)
    assert seen_leaf.all()
    assert seen_node.all()
    # Depth-first left-to-right must enumerate leaves in sorted order
    # (internal nodes cover contiguous ranges).
    assert order == list(range(n_leaf))


def test_karras_topology_random():
    rng = np.random.default_rng(3)
    for n in (2, 3, 5, 17, 100, 1000):
        codes = rng.integers(0, 2**30, size=n).astype(np.uint32)
        codes.sort()
        left, right, _, _ = karras_topology(jnp.asarray(codes))
        _check_topology(left, right, n)


def test_karras_topology_duplicates():
    # All-equal codes: index bits must induce a valid tree.
    for n in (2, 7, 64):
        codes = jnp.zeros((n,), jnp.uint32)
        left, right, _, _ = karras_topology(codes)
        _check_topology(left, right, n)


def test_depths():
    codes = jnp.asarray(np.arange(8, dtype=np.uint32))
    left, right, _, _ = karras_topology(codes)
    parent = node_parents(left, right)
    depth = np.asarray(node_depths(parent))
    assert depth[0] == 0
    assert depth.max() <= 7


def _wide_reachable(scene):
    """Walk the wide tree on host; return leaf ids visited and node count."""
    child = np.asarray(scene.node_child)
    leaves = []
    nodes = 0
    stack = [0]
    while stack:
        c = stack.pop()
        nodes += 1
        for s in child[c]:
            if s >= 0:
                stack.append(s)
            elif s <= -2:
                leaves.append(-s - 2)
    return sorted(leaves), nodes


def test_build_scene_wide_tree_covers_all_leaves():
    tris = scenes.cornell_box()
    for w in (2, 4, 8):
        scene = build_scene((tris.reshape(-1, 3),
                             np.arange(tris.shape[0] * 3).reshape(-1, 3)),
                            BuildConfig(branching=w))
        leaves, _ = _wide_reachable(scene)
        assert leaves == list(range(scene.num_leaves))


def test_build_scene_wide_bounds_contain_triangles():
    tris = scenes.cornell_box()
    scene = build_scene((tris.reshape(-1, 3),
                         np.arange(tris.shape[0] * 3).reshape(-1, 3)))
    child = np.asarray(scene.node_child)
    cmin = np.asarray(scene.node_min)
    cmax = np.asarray(scene.node_max)
    tv = np.asarray(scene.tri_v)
    t = scene.num_tris
    k = scene.leaf_size
    stack = [0]
    while stack:
        c = stack.pop()
        for slot in range(child.shape[1]):
            s = child[c, slot]
            if s >= 0:
                stack.append(s)
            elif s <= -2:
                leaf = -s - 2
                lo, hi = leaf * k, min(leaf * k + k, t)
                pts = tv[lo:hi].reshape(-1, 3)
                assert (pts >= cmin[c, slot] - 1e-6).all()
                assert (pts <= cmax[c, slot] + 1e-6).all()


def test_single_triangle_scene():
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    scene = build_scene((tri.reshape(-1, 3), np.arange(3).reshape(1, 3)))
    assert scene.num_leaves == 1
    leaves, nodes = _wide_reachable(scene)
    assert leaves == [0] and nodes == 1
