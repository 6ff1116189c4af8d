"""camera_rays(device=True): on-device generation must match the host
path — morton layout EXACTLY (square pow2 grids: dense codes make the
argsort equal the closed-form deinterleave), directions to float-eval
order.  The 67M headline candidate rides this (bench.py r4)."""
import numpy as np
import pytest

from rtk_tpu.testing import scenes


@pytest.mark.parametrize("side", [8, 64])
def test_device_camera_matches_host_morton(side):
    h = scenes.camera_rays((0, 0, 3), (0, 0, 0), (0, 1, 0), 45,
                           side, side, order="morton")
    d = scenes.camera_rays((0, 0, 3), (0, 0, 0), (0, 1, 0), 45,
                           side, side, order="morton", device=True)
    np.testing.assert_allclose(np.asarray(d.direction),
                               np.asarray(h.direction), atol=2e-7)
    np.testing.assert_array_equal(np.asarray(d.origin),
                                  np.asarray(h.origin))
    np.testing.assert_array_equal(np.asarray(d.min_t), np.asarray(h.min_t))
    np.testing.assert_array_equal(np.asarray(d.max_t), np.asarray(h.max_t))


def test_device_camera_raster_and_guards():
    h = scenes.camera_rays((1, 2, 3), (0, 0, 0), (0, 1, 0), 50, 16, 8)
    d = scenes.camera_rays((1, 2, 3), (0, 0, 0), (0, 1, 0), 50, 16, 8,
                           device=True)
    np.testing.assert_allclose(np.asarray(d.direction),
                               np.asarray(h.direction), atol=2e-7)
    with pytest.raises(ValueError):
        scenes.camera_rays((0, 0, 3), (0, 0, 0), (0, 1, 0), 45, 16, 8,
                           order="morton", device=True)
