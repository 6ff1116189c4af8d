"""rtk C-API shim parity (compat.py vs rtk.h:119-130 semantics)."""
import pytest
import numpy as np

from rtk_tpu import compat
from rtk_tpu.mesh import MeshDesc
from rtk_tpu.testing import scenes


def _mesh():
    tris = scenes.cornell_box()
    pos = tris.reshape(-1, 3).astype(np.float32)
    idx = np.arange(pos.shape[0], dtype=np.uint32)
    return MeshDesc(positions=pos.tobytes(), indices=idx.tobytes(),
                    num_triangles=tris.shape[0],
                    position_type="f32", index_type="u32")


@pytest.mark.smoke
def test_build_and_trace_single_ray():
    logs = []
    desc = compat.RtkSceneDesc([_mesh()],
                               log_fn=lambda u, b, s: logs.append(s))
    scene = compat.rtk_build_scene(desc)
    found, hit = compat.rtk_trace_ray(
        scene, compat.RtkRay(origin=(0.5, 0.5, 2.2),
                             direction=(0.0, 0.0, -1.0)))
    assert found
    assert 0 < hit.t < compat.RTK_INF
    assert hit.mesh_index == 0
    assert len(hit.vertex) == 3 and hit.vertex[0].index >= 0
    assert logs, "log_fn callback must fire during the build"
    # miss: ray pointing away
    found2, hit2 = compat.rtk_trace_ray(
        scene, compat.RtkRay(origin=(0.5, 0.5, 5.0),
                             direction=(0.0, 0.0, 1.0)))
    assert not found2 and hit2 is None
    compat.rtk_free_scene(scene)


def test_incremental_lifecycle_and_serialize():
    import io

    build, tasks = compat.rtk_start_build([_mesh()])
    queue = list(tasks)
    while queue:
        compat.rtk_run_task(queue.pop(), queue)
    size = compat.rtk_get_build_size(build)
    assert size > 0
    buf = io.BytesIO()
    written = compat.rtk_finish_build_to(build, buf)
    assert written == size == len(buf.getvalue())


def test_filter_rejects_nearest():
    scene = compat.rtk_build_scene([_mesh()])
    ray = compat.RtkRay(origin=(0.5, 0.5, 2.2), direction=(0.0, 0.0, -1.0))
    _, nearest = compat.rtk_trace_ray(scene, ray)

    def reject_tri(user, r, hit_fields):
        # functional filter: reject the triangle the unfiltered trace found
        return hit_fields.triangle_index != nearest.triangle_index

    found, hit = compat.rtk_trace_ray_filter(scene, ray, reject_tri)
    assert found
    assert hit.triangle_index != nearest.triangle_index
    assert hit.t >= nearest.t


def test_strided_positions_unpadded_tail():
    """A strided position buffer whose FINAL record has no trailing stride
    padding must not lose its last vertex (r1 fix: count = nbytes//stride
    silently dropped it)."""
    import numpy as np

    from rtk_tpu.mesh import MeshDesc, decode_indices, decode_positions

    verts = np.arange(12, dtype=np.float32).reshape(4, 3)
    stride = 20  # 12 natural bytes + 8 padding between records
    buf = bytearray()
    for i, v in enumerate(verts):
        buf += v.tobytes()
        if i != len(verts) - 1:
            buf += b"\x00" * (stride - 12)  # tail record: NO padding
    desc = MeshDesc(
        num_triangles=2,
        positions=bytes(buf),
        position_stride=stride,
        position_type="f32",
        indices=np.array([[0, 1, 2], [1, 2, 3]], np.uint32),
    )
    idx = decode_indices(desc)
    pos = decode_positions(desc, idx)
    np.testing.assert_array_equal(pos[1, 2], verts[3])
