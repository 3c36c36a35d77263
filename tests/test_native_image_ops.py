"""Native C++ image ops vs numpy oracle parity."""

import numpy as np
import pytest

from datr_tpu import native
from datr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def test_native_builds_and_matches_numpy():
    if native.get_lib() is None:
        pytest.skip("g++ unavailable")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    got = native.resize_normalize_pad(img, (20, 30), (24, 32),
                                      IMAGENET_MEAN, IMAGENET_STD)
    want = native._numpy_resize_normalize_pad(
        img, (20, 30), (24, 32), IMAGENET_MEAN, IMAGENET_STD
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert np.all(got[20:] == 0) and np.all(got[:, 30:] == 0)


def test_identity_resize_matches_plain_normalize():
    if native.get_lib() is None:
        pytest.skip("g++ unavailable")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    got = native.resize_normalize_pad(img, (16, 16), (16, 16),
                                      IMAGENET_MEAN, IMAGENET_STD)
    want = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
