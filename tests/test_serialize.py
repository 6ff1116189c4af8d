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
