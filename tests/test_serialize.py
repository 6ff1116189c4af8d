"""Scene save/load round-trip and header validation."""
import io

import numpy as np
import pytest

from rtk_tpu import build_scene, trace_closest
from rtk_tpu.testing import scenes
from rtk_tpu.utils.serialize import MAGIC, load_scene, save_scene


def _scene():
    tris = scenes.cornell_box()
    return build_scene(
        (tris.reshape(-1, 3), np.arange(tris.shape[0] * 3).reshape(-1, 3)))


@pytest.mark.smoke
def test_roundtrip(tmp_path):
    scene = _scene()
    path = str(tmp_path / "scene.rtk8")
    n = save_scene(scene, path)
    assert n % 128 == 0
    loaded = load_scene(path)
    assert loaded.num_tris == scene.num_tris
    assert loaded.leaf_size == scene.leaf_size
    for name in ("node_child", "node_min", "tri_v", "tri_prim", "perm"):
        np.testing.assert_array_equal(
            np.asarray(getattr(loaded, name)), np.asarray(getattr(scene, name)))
    # Loaded scene must trace identically.
    rays = scenes.cornell_camera(16, 16)
    a = trace_closest(scene, rays)
    b = trace_closest(loaded, rays)
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.triangle_index),
                                  np.asarray(b.triangle_index))


def test_bytes_roundtrip():
    scene = _scene()
    buf = io.BytesIO()
    save_scene(scene, buf)
    loaded = load_scene(buf.getvalue())
    assert loaded.num_tris == scene.num_tris


def test_validation():
    scene = _scene()
    buf = io.BytesIO()
    save_scene(scene, buf)
    data = bytearray(buf.getvalue())
    with pytest.raises(ValueError, match="magic"):
        load_scene(b"JUNKJUNK" + bytes(data[8:]))
    bad = bytearray(data)
    bad[8] = 0xFF  # endian mark
    with pytest.raises(ValueError, match="endian"):
        load_scene(bytes(bad))
    bad = bytearray(data)
    bad[12] = 99  # version
    with pytest.raises(ValueError, match="version"):
        load_scene(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        load_scene(bytes(data[:256]))


@pytest.mark.smoke
def test_packed_roundtrip(tmp_path):
    """PackedScene round-trip: the packed blob is the runtime format —
    load-and-trace with NO repack (VERDICT r1 item 9; rtk.c:1732-1774)."""
    from rtk_tpu.ops.pallas_trace import trace_packets
    from rtk_tpu.trace.packed import pack_scene
    from rtk_tpu.utils.serialize import load_packed_scene, save_packed_scene

    scene = _scene()
    packed = pack_scene(scene)
    path = str(tmp_path / "scene.rtk8p")
    n = save_packed_scene(packed, path)
    assert n % 128 == 0
    loaded = load_packed_scene(path)
    assert loaded.num_tris == packed.num_tris
    assert loaded.leaf_size == packed.leaf_size
    rays = scenes.cornell_camera(16, 16)
    a = trace_packets(packed, rays, interpret=True)
    b = trace_packets(loaded, rays, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.slot), np.asarray(b.slot))
    np.testing.assert_array_equal(np.asarray(a.triangle_index),
                                  np.asarray(b.triangle_index))


def test_instanced_roundtrip(tmp_path):
    """InstancedScene round-trip incl. nested merged Scene + blas_tris."""
    from rtk_tpu import BuildConfig, build_scene
    from rtk_tpu.instancing import build_instanced
    from rtk_tpu.utils.serialize import (load_any, load_instanced_scene,
                                         save_instanced_scene)

    tris = scenes.cornell_box()
    cfg = BuildConfig(branching=8, leaf_size=8)
    blas = build_scene(
        (tris.reshape(-1, 3), np.arange(tris.shape[0] * 3).reshape(-1, 3)),
        cfg)
    eye = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    tf = np.stack([eye, eye + np.array([[0, 0, 0, 2.0]] * 3)])
    iscene = build_instanced([blas], [0, 0], tf.astype(np.float32))
    path = str(tmp_path / "scene.rtk8i")
    save_instanced_scene(iscene, path)
    loaded = load_instanced_scene(path)
    assert loaded.blas_tris == iscene.blas_tris
    assert loaded.total_triangles == iscene.total_triangles
    np.testing.assert_array_equal(np.asarray(loaded.roots),
                                  np.asarray(iscene.roots))
    np.testing.assert_array_equal(np.asarray(loaded.world_from_object),
                                  np.asarray(iscene.world_from_object))
    np.testing.assert_array_equal(np.asarray(loaded.merged.tri_v),
                                  np.asarray(iscene.merged.tri_v))
    # load_any dispatches on the header kind byte.
    any_loaded = load_any(path)
    assert type(any_loaded).__name__ == "InstancedScene"


def test_kind_mismatch_rejected(tmp_path):
    from rtk_tpu.utils.serialize import load_packed_scene

    scene = _scene()
    path = str(tmp_path / "scene.rtk8")
    save_scene(scene, path)
    with pytest.raises(ValueError, match="kind"):
        load_packed_scene(path)


def test_wideless_scene_roundtrip():
    """BuildConfig(wide_nodes=False) scenes (r5) round-trip with their
    has_wide flag, keep tracing via the packet path, and the stack
    engine's guard survives the reload."""
    import io

    import jax.numpy as jnp
    import pytest

    from rtk_tpu import BuildConfig, trace_closest
    from rtk_tpu.ops.pallas_trace import trace_packets
    from rtk_tpu.scene import build_from_soup
    from rtk_tpu.testing import scenes
    from rtk_tpu.trace.packed import pack_scene
    from rtk_tpu.utils.serialize import load_scene, save_scene

    tris = scenes.cornell_box()
    scene = build_from_soup(jnp.asarray(tris),
                            config=BuildConfig(branching=8, leaf_size=8,
                                               wide_nodes=False))
    assert not scene.has_wide
    buf = io.BytesIO()
    save_scene(scene, buf)
    s2 = load_scene(buf.getvalue())
    assert not s2.has_wide
    cam = scenes.cornell_camera(16, 16)
    a = trace_packets(pack_scene(scene), cam, interpret=True)
    b = trace_packets(pack_scene(s2), cam, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    with pytest.raises(ValueError, match="wide_nodes"):
        trace_closest(s2, cam)
