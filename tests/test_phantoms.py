import numpy as np

from dip_admm_tpu.ops import phantoms


def test_const_im_structure():
    N = 64
    img = phantoms.const_im(N)
    assert img.shape == (N, N)
    # Exactly the reference's intensity palette.
    assert set(np.unique(img)).issubset({0.0, 80.0, 200.0, 300.0, 400.0})
    # Rectangle region present at value 200 in the bottom-right corner.
    assert img[N - 1, N - 1] == 200.0
    # Large circle overwrites the rectangle near its center.
    assert img[N // 3, N // 3] == 80.0
    # Medium circle wins by max over the big circle.
    assert img[3 * N // 5, 3 * N // 5] == 300.0
    # Two small 400 circles exist.
    assert (img == 400.0).sum() > 0
    # Deterministic.
    assert np.array_equal(img, phantoms.const_im(N))


def test_rand_im_seeded():
    a = phantoms.rand_im(64, seed=3)
    b = phantoms.rand_im(64, seed=3)
    c = phantoms.rand_im(64, seed=4)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert set(np.unique(a)).issubset({0.0, 80.0, 200.0, 300.0, 400.0})


def test_shepp_logan():
    img = phantoms.shepp_logan(128)
    assert img.shape == (128, 128)
    assert img.max() <= 1.0 + 1e-9
    # Skull ellipse covers the center; outside corners are zero.
    assert img[64, 64] > 0
    assert img[0, 0] == 0.0
