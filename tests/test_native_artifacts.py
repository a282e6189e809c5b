"""Native async artifact writer: npy roundtrip, PNG validity, and the
save_recons integration (skipped when the toolchain is unavailable)."""

import os

import numpy as np
import pytest

from dip_admm_tpu.utils import native_artifacts as na

pytestmark = pytest.mark.skipif(
    not na.available(), reason="native toolchain unavailable"
)


def test_npy_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for shape in [(7,), (5, 6), (2, 3, 4)]:
        a = rng.normal(size=shape).astype(np.float32)
        p = str(tmp_path / f"a{len(shape)}.npy")
        na.save_npy(p, a)
        na.flush()
        np.testing.assert_array_equal(np.load(p), a)


def test_png_gray_valid_and_faithful(tmp_path):
    import matplotlib.image as mpimg

    rng = np.random.default_rng(1)
    img = rng.normal(size=(48, 32)).astype(np.float32)
    p = str(tmp_path / "i.png")
    na.save_png_gray(p, img)
    na.flush()
    back = np.asarray(mpimg.imread(p))
    assert back.shape == (48, 32)
    norm = (img - img.min()) / (img.max() - img.min())
    corr = np.corrcoef(norm.ravel(), back.ravel())[0, 1]
    assert corr > 0.999


def test_save_recons_uses_native(tmp_path):
    from dip_admm_tpu.utils import artifacts

    x = np.random.default_rng(2).normal(size=(3, 64)).astype(np.float32)
    artifacts.save_recons(x, 8, str(tmp_path), "t")
    artifacts.flush_async()
    for i in range(3):
        assert os.path.exists(tmp_path / f"t_node_{i}.npy")
        assert os.path.exists(tmp_path / f"t_node_{i}.png")
        np.testing.assert_array_equal(
            np.load(tmp_path / f"t_node_{i}.npy"), x[i].reshape(8, 8)
        )
