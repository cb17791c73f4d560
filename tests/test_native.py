"""Native C++ data-layer core vs scipy/numpy oracles."""

import numpy as np
import pytest

from ocm_tpu.utils import native
from ocm_tpu.utils.io import extract_objects

scipy_ndimage = pytest.importorskip("scipy.ndimage")


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("g++ unavailable — native core not built")
    return True


@pytest.fixture
def cube(rng):
    c = rng.normal(0.02, 0.01, (48, 64, 16)).astype(np.float32)
    yy, xx = np.mgrid[:48, :64]
    for cy, cx, r, v in [(10, 10, 4, 1.0), (30, 40, 6, 2.0), (44, 60, 2, 1.5),
                         (10, 18, 3, 1.2)]:
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        c[mask] += v
    return c


def test_mean_image_matches_numpy(built, cube):
    np.testing.assert_allclose(native.mean_image(cube), cube.mean(axis=2),
                               rtol=1e-6)


def test_label_matches_scipy(built, rng):
    for trial in range(20):
        mask = rng.random((37, 53)) < 0.35
        ours, n_ours = native.label(mask)
        theirs, n_theirs = scipy_ndimage.label(
            mask, structure=np.ones((3, 3), int))
        assert n_ours == n_theirs
        np.testing.assert_array_equal(ours, theirs)


def test_label_edge_cases(built):
    empty = np.zeros((5, 5), dtype=bool)
    labels, n = native.label(empty)
    assert n == 0 and not labels.any()
    full = np.ones((5, 5), dtype=bool)
    labels, n = native.label(full)
    assert n == 1 and (labels == 1).all()
    diag = np.eye(6, dtype=bool)          # 8-connectivity joins the diagonal
    labels, n = native.label(diag)
    assert n == 1


def test_gather_and_sizes(built, cube):
    fg = cube.mean(axis=2) >= 0.5
    labels, n = native.label(fg)
    sizes = native.object_sizes(labels, n)
    assert sizes.sum() == fg.sum()
    for obj in range(1, n + 1):
        spectra, coords = native.gather_object(cube, labels, obj)
        mask = labels == obj
        np.testing.assert_allclose(spectra, cube[mask])
        np.testing.assert_array_equal(coords, np.argwhere(mask))


def test_extract_objects_native_matches_python(built, cube):
    a = native.extract_objects_native(cube, 0.5)
    b = extract_objects(cube, 0.5)
    assert len(a) == len(b)
    for oa, ob in zip(a, b):
        assert oa["n_pixels"] == ob["n_pixels"]
        np.testing.assert_allclose(oa["spectral_data"], ob["spectral_data"])
        np.testing.assert_allclose(oa["centroid"], ob["centroid"])


def test_python_fallback_paths(cube, monkeypatch):
    """With the library unavailable, every entry point still works."""
    monkeypatch.setattr(native, "_load", lambda: None)
    fg = cube.mean(axis=2) >= 0.5
    labels, n = native.label(fg)
    theirs, n_t = scipy_ndimage.label(fg, structure=np.ones((3, 3), int))
    assert n == n_t
    np.testing.assert_array_equal(labels, theirs)
    np.testing.assert_allclose(native.mean_image(cube), cube.mean(axis=2),
                               rtol=1e-6)
    spectra, coords = native.gather_object(cube, labels, 1)
    np.testing.assert_allclose(spectra, cube[labels == 1])


def _quantize_oracle(a: np.ndarray):
    """The original NumPy formulation of ops.linalg.quantize_rows_int8
    (kept inline: the library routes 2-D f32 NumPy inputs through the
    native kernel, so the oracle must not call it)."""
    amax = np.max(np.abs(a), axis=-1)
    scale = (np.maximum(amax / 127.0, 1e-30)).astype(np.float32)
    q = np.clip(np.round(a / scale[..., None]), -127, 127).astype(np.int8)
    sumsq = (np.sum(q.astype(np.int32) ** 2, axis=-1).astype(np.float32)
             * scale * scale)
    return q, scale, sumsq


def test_quantize_rows_int8_bit_parity(built, rng):
    x = (rng.normal(0, 3.0, (257, 129)) * 10.0 ** rng.integers(
        -2, 3, (257, 1)).astype(np.float64)).astype(np.float32)
    x[0] = 0.0                       # all-zero row: scale floor, q = 0
    x[1, :4] = [2.5, 3.5, -2.5, 127.0]   # exact halves at scale 1.0
    x[1, 4:] = 0.0
    got = native.quantize_rows_int8(x)
    assert got is not None
    want = _quantize_oracle(x)
    for g, w, name in zip(got, want, ("q", "scale", "sumsq")):
        np.testing.assert_array_equal(g, w, err_msg=name)
    # half-to-even at the constructed row
    np.testing.assert_array_equal(got[0][1, :4], [2, 4, -2, 127])


def test_quantize_rows_int8_fused_center(built, rng):
    x = rng.normal(5.0, 2.0, (64, 96)).astype(np.float32)
    c = rng.normal(5.0, 0.5, 96).astype(np.float32)
    got = native.quantize_rows_int8(x, center=c)
    want = _quantize_oracle(x - c[None, :])
    for g, w, name in zip(got, want, ("q", "scale", "sumsq")):
        np.testing.assert_array_equal(g, w, err_msg=name)


def test_linalg_quantize_routes_and_falls_back(built, rng, monkeypatch):
    from ocm_tpu.ops.linalg import quantize_rows_int8 as lq

    x = rng.normal(0, 2.0, (33, 40)).astype(np.float32)
    want = _quantize_oracle(x)
    via_native = lq(x)
    for g, w in zip(via_native, want):
        np.testing.assert_array_equal(g, w)
    # library unavailable -> the NumPy path produces the same values
    monkeypatch.setattr(native, "_load", lambda: None)
    via_numpy = lq(x)
    for g, w in zip(via_numpy, want):
        np.testing.assert_array_equal(g, w)
