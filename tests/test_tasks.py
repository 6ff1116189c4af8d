"""Cooperative task-system lifecycle (rtk_start_build/run_task parity)."""
import io
import threading

import numpy as np

from rtk_tpu import build_scene, trace_closest
from rtk_tpu.tasks import (
    build_scene_tasks,
    finish_build,
    finish_build_to,
    get_build_size,
    run_task,
    start_build,
)
from rtk_tpu.testing import scenes
from rtk_tpu.utils.serialize import load_scene
from rtk_tpu.utils.stats import scene_stats


def _meshes():
    walls = scenes.cornell_box()[:10]
    boxes = scenes.cornell_box()[10:]
    return [
        (walls.reshape(-1, 3), np.arange(walls.size // 3).reshape(-1, 3)),
        (boxes.reshape(-1, 3), np.arange(boxes.size // 3).reshape(-1, 3)),
    ]


def test_single_thread_lifecycle():
    logs = []
    build, tasks = start_build(
        _meshes(), log_fn=lambda user, b, s: logs.append(s))
    queue = list(tasks)
    total_spawned = 0
    while queue:
        total_spawned += run_task(queue.pop(), queue)
    scene = finish_build(build)
    assert scene.num_tris == 34
    assert get_build_size(build) > 0
    assert any("decoded" in s for s in logs)
    assert any("device build" in s for s in logs)
    # Scene equals the one-shot API's.
    direct = build_scene(_meshes())
    rays = scenes.cornell_camera(8, 8)
    np.testing.assert_array_equal(
        np.asarray(trace_closest(scene, rays).t),
        np.asarray(trace_closest(direct, rays).t))


def test_finish_build_to_roundtrip():
    build, tasks = start_build(_meshes())
    queue = list(tasks)
    while queue:
        run_task(queue.pop(), queue)
    buf = io.BytesIO()
    n = finish_build_to(build, buf)
    assert n == len(buf.getvalue())
    loaded = load_scene(buf.getvalue())
    assert loaded.num_tris == 34


def test_multithreaded_build():
    scene = build_scene_tasks(_meshes(), num_threads=4)
    assert scene.num_tris == 34
    rays = scenes.cornell_camera(8, 8)
    want = trace_closest(build_scene(_meshes()), rays)
    got = trace_closest(scene, rays)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(want.t))


def test_scene_stats():
    scene = build_scene(_meshes())
    st = scene_stats(scene)
    assert st.num_tris == 34
    assert st.num_wide_nodes >= 1
    assert st.max_depth >= 1
    assert 0 < st.avg_leaf_occupancy <= 1
    assert st.sah_cost > 0
    assert "tris=34" in str(st)
