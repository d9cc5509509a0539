"""Native C++ preprocessing library: build + parity vs numpy reference."""

import numpy as np
import pytest

from hotrack_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of libhotrack_native.so failed"


def test_decode_ho3d_depth_parity():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (48, 64, 3), np.uint8)
    scale = 0.000125
    got = native.decode_ho3d_depth(img, scale)
    want = (img[:, :, 2].astype(np.float32)
            + img[:, :, 1].astype(np.float32) * 256.0) * scale
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("stride", [1, 2])
def test_backproject_parity(stride):
    rng = np.random.RandomState(1)
    h, w = 60, 80
    depth = (rng.rand(h, w) * 0.8).astype(np.float32)
    depth[depth < 0.1] = 0.0
    mask = rng.randint(0, 3, (h, w)).astype(np.uint8)
    fx, fy, cx, cy = 100.0, 110.0, 40.0, 30.0
    center = np.array([0.0, 0.0, 0.4], np.float32)

    got = native.backproject_filter(depth, mask, 1, fx, fy, cx, cy,
                                    sign_y=-1.0, sign_z=-1.0,
                                    center=-center, radius=0.5, stride=stride)
    want = native._backproject_numpy(depth, mask, 1, fx, fy, cx, cy,
                                     -1.0, -1.0, -center, 0.5, stride)
    # order within the scan differs only by traversal; native scans row-major
    # like numpy's nonzero, so rows should match exactly
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_backproject_no_mask_no_filter():
    depth = np.full((8, 8), 0.5, np.float32)
    pts = native.backproject_filter(depth, None, 0, 100, 100, 4, 4)
    assert pts.shape == (64, 3)
    np.testing.assert_allclose(pts[:, 2], 0.5)
