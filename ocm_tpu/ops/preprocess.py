"""Spectral preprocessing, TPU-first.

The reference preprocesses with row-wise SNV and ``scipy.signal.savgol_filter``
(``simca_nuts.py:48-52``: SNV then SavGol(5,2,deriv=1);
``simca_new_cheese.py:34-39``: SavGol(15,2,deriv=1);
``utils/data_utils.py:57-61``: SNV + SavGol(5,2,deriv=1) for outlier detection).

Savitzky-Golay filtering with scipy's default ``mode='interp'`` edge handling
is a *linear* map of each spectrum, so instead of translating the
convolve-then-patch-edges control flow we precompute one dense (L, L) operator
on the host (float64) and apply it as a single GEMM: ``X @ W.T``.  For
chemometric spectral lengths (L ~ 200-2000) that is the fastest possible TPU
formulation — one MXU matmul, fully fusable with SNV — and it is *exactly*
equal to scipy (validated in tests/test_preprocess.py).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


def snv(x, eps: float = 1e-8):
    """Standard Normal Variate: per-spectrum center/scale.

    Matches ``simca_nuts.py:48-50`` / ``utils/data_utils.py:57``:
    population std (ddof=0) with ``eps`` added to the denominator.
    """
    mean = jnp.mean(x, axis=-1, keepdims=True)
    std = jnp.std(x, axis=-1, keepdims=True)
    return (x - mean) / (std + eps)


def standardize(x, mean, std):
    """Per-wavelength standardization (vae_model.py:124)."""
    return (x - mean) / std


def minmax_scale(x, eps: float = 1e-8):
    """Per-sample min-max scaling to [0, 1] (vae_model.py:149-151)."""
    x_min = jnp.min(x, axis=-1, keepdims=True)
    x_max = jnp.max(x, axis=-1, keepdims=True)
    return jnp.clip((x - x_min) / (x_max - x_min + eps), 0.0, 1.0)


@functools.lru_cache(maxsize=64)
def savgol_coeffs(window_length: int, polyorder: int, deriv: int = 0,
                  delta: float = 1.0) -> np.ndarray:
    """SG convolution coefficients; matches scipy.signal.savgol_coeffs.

    Least-squares fit of a degree-``polyorder`` polynomial on the centered
    window, evaluated as the ``deriv``-th derivative at the window center.
    """
    if polyorder >= window_length:
        raise ValueError("polyorder must be less than window_length")
    half = (window_length - 1) // 2
    # positions relative to the evaluation point (scipy convention pos=half)
    t = np.arange(-half, window_length - half, dtype=np.float64)
    order = np.arange(polyorder + 1).reshape(-1, 1)
    A = t ** order  # (polyorder+1, window)
    y = np.zeros(polyorder + 1)
    y[deriv] = math.factorial(deriv) / (delta ** deriv)
    # coeffs c solve A @ c = y in least squares => c = pinv(A) @ y
    coeffs, *_ = np.linalg.lstsq(A.T, np.eye(window_length), rcond=None)
    return (coeffs.T @ y)[::-1]  # scipy returns reversed (convolution) order


@functools.lru_cache(maxsize=64)
def savgol_matrix(n: int, window_length: int, polyorder: int, deriv: int = 0,
                  delta: float = 1.0) -> np.ndarray:
    """Dense (n, n) linear operator equal to scipy.signal.savgol_filter(
    ..., mode='interp', axis=-1) applied to a length-``n`` signal.

    Interior rows hold the SG convolution stencil; the first/last
    ``window_length//2`` rows hold the polynomial-interpolation edge fits
    that scipy's ``mode='interp'`` performs (a polynomial of degree
    ``polyorder`` is least-squares fit to the first/last ``window_length``
    samples and its ``deriv``-th derivative evaluated at the edge points).
    """
    if window_length > n:
        raise ValueError("window_length must not exceed signal length")
    half = window_length // 2
    W = np.zeros((n, n), dtype=np.float64)

    # interior: correlation with the SG stencil (scipy convolves with the
    # reversed coefficient vector, i.e. correlates with the unreversed one)
    c = savgol_coeffs(window_length, polyorder, deriv, delta)[::-1]
    for i in range(half, n - half):
        W[i, i - half:i + half + 1] = c

    # edges: least-squares polynomial fit on the terminal windows
    t = np.arange(window_length, dtype=np.float64)
    V = t.reshape(-1, 1) ** np.arange(polyorder + 1)  # (window, polyorder+1)
    pinvV = np.linalg.pinv(V)  # (polyorder+1, window)
    # derivative-evaluation row at position p: sum_k beta_k * k!/(k-d)! p^(k-d)
    def deriv_row(positions: np.ndarray) -> np.ndarray:
        rows = np.zeros((len(positions), polyorder + 1))
        for k in range(deriv, polyorder + 1):
            fac = math.factorial(k) / math.factorial(k - deriv)
            rows[:, k] = fac * positions ** (k - deriv) / (delta ** deriv)
        return rows

    E_first = deriv_row(t[:half]) @ pinvV                     # (half, window)
    E_last = deriv_row(t[window_length - half:]) @ pinvV      # (half, window)
    W[:half, :window_length] = E_first
    W[n - half:, n - window_length:] = E_last
    return W


def savgol_filter(x, window_length: int, polyorder: int, deriv: int = 0,
                  delta: float = 1.0, dtype=None):
    """Savitzky-Golay filter along the last axis as one GEMM.

    Exactly matches ``scipy.signal.savgol_filter(x, window_length, polyorder,
    deriv=deriv, axis=-1)`` (mode='interp') to float tolerance.
    """
    n = x.shape[-1]
    W = savgol_matrix(n, window_length, polyorder, deriv, delta)
    dtype = dtype or x.dtype
    return jnp.matmul(x, jnp.asarray(W.T, dtype=dtype),
                      preferred_element_type=dtype)


def snv_savgol(x, window_length: int = 5, polyorder: int = 2, deriv: int = 1,
               eps: float = 1e-8):
    """Fused SNV + SavGol pipeline (simca_nuts.py:48-52)."""
    return savgol_filter(snv(x, eps=eps), window_length, polyorder, deriv)
