"""Image/metric utilities.

Equivalents of the reference env helpers (``vec``/``unvec``,
``/root/reference/block_1_env_and_imports.py:10-18``) and the quality-metric
definitions scattered through block 6/7: sinogram MSE normalized by m_i
(``block_7_main_ver3.py:260-262``), image MSE normalized by N^2 (``:295-298``)
and PSNR (``test_final_integration.py:41-45``).
"""

from __future__ import annotations

import numpy as np


def vec(img: np.ndarray) -> np.ndarray:
    """Row-major flatten of an [N, N] image (ref ``vec``)."""
    return np.asarray(img).reshape(-1)


def unvec(x: np.ndarray, N: int) -> np.ndarray:
    """Inverse of :func:`vec` (ref ``unvec``)."""
    return np.asarray(x).reshape(N, N)


def mse(a: np.ndarray, b: np.ndarray) -> float:
    a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
    return float(np.mean((a - b) ** 2))


def psnr(x: np.ndarray, ref: np.ndarray, data_range: float | None = None) -> float:
    """PSNR in dB (ref ``test_final_integration.py:41-45``)."""
    err = mse(x, ref)
    if data_range is None:
        data_range = float(np.asarray(ref).max() - np.asarray(ref).min())
    if err == 0:
        return float("inf")
    return float(20.0 * np.log10(data_range) - 10.0 * np.log10(err))
