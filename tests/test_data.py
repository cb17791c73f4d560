"""Data layer tests: sklearn-equivalent shuffling, object-aware splits,
outlier removal, HSI extraction, HDF5 store, artifact JSON."""

import numpy as np
import pytest

from ocm_tpu.utils.io import (extract_objects, load_json,
                              read_object_store, save_json,
                              write_object_store)
from ocm_tpu.utils.outliers import (effective_n_components,
                                    mahalanobis_outlier_mask)
from ocm_tpu.utils.splits import ObjectSplits, object_aware_splits, shuffle_split


# ---------------------------------------------------------------------------
# shuffle_split == sklearn train_test_split
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,test_size,seed", [
    (10, 0.3, 42), (7, 0.15, 42), (23, 0.5, 0), (3, 0.34, 7),
])
def test_shuffle_split_matches_sklearn(n, test_size, seed):
    sklearn_ms = pytest.importorskip("sklearn.model_selection")
    items = list(range(100, 100 + n))
    tr_sk, te_sk = sklearn_ms.train_test_split(items, test_size=test_size,
                                               random_state=seed)
    tr, te = shuffle_split(items, test_size, seed)
    assert tr == list(tr_sk)
    assert te == list(te_sk)


def test_shuffle_split_empty_raises():
    with pytest.raises(ValueError):
        shuffle_split([1], 0.5, 0)


# ---------------------------------------------------------------------------
# outlier removal
# ---------------------------------------------------------------------------

def test_outlier_mask_removes_planted_outliers(rng):
    x = rng.normal(0, 1, (200, 30))
    x[:5] += 25.0  # gross outliers
    keep, mahal, thr = mahalanobis_outlier_mask(x, n_components=5)
    keep = np.asarray(keep)
    assert not keep[:5].any()
    # percentile rule keeps ~95%
    assert abs(keep.mean() - 0.95) < 0.02
    # sqrt vs squared variants agree on the decision
    keep2, _, _ = mahalanobis_outlier_mask(x, n_components=5, squared=True)
    np.testing.assert_array_equal(keep, np.asarray(keep2))


def test_effective_n_components():
    assert effective_n_components(100, 50) == 10
    assert effective_n_components(5, 50) == 4
    assert effective_n_components(100, 3) == 3
    assert effective_n_components(1, 50) == 1


# ---------------------------------------------------------------------------
# object-aware splits
# ---------------------------------------------------------------------------

def _objects(rng, n_objects, pixels, length, shift=0.0):
    t = np.linspace(0, 1, length)
    base = np.sin(2 * np.pi * (3 + shift) * t)
    out = []
    for _ in range(n_objects):
        amp = rng.normal(1, 0.05, (pixels, 1))
        out.append((amp * base + rng.normal(0, 0.02, (pixels, length)))
                   .astype(np.float32))
    return out


@pytest.fixture
def split_data(rng):
    return {
        "almond": _objects(rng, 10, 20, 64),
        "peanut": _objects(rng, 6, 15, 64, shift=1.0),
        "empty": [],
    }


def test_object_aware_splits_no_object_straddles(split_data):
    res = object_aware_splits(split_data, ["almond", "peanut", "empty"],
                              "almond", 64, verbose=False)
    assert isinstance(res, ObjectSplits)
    # every object contributes 20 (almond) or 15 (peanut) rows minus
    # outliers; splits are unions of whole objects, so sizes are sums of
    # per-object counts — verify no partial objects by total conservation
    s = res.splits["almond"]
    total = s["cal"].shape[0] + s["val"].shape[0] + s["test"].shape[0]
    assert total <= 10 * 20
    assert s["cal"].shape[0] > 0 and s["test"].shape[0] > 0
    # global test set = target test (label 0) + other test (label 1)
    assert res.x_test.shape[0] == res.y_test.shape[0]
    assert (res.y_test == 0).sum() == res.x_test_in.shape[0]
    assert (res.y_test == 1).sum() == res.x_test_out.shape[0]
    # empty class handled
    assert res.splits["empty"]["cal"].shape == (0, 64)


def test_object_aware_splits_nan_rows_dropped(split_data):
    split_data["almond"][0][3, :] = np.nan
    split_data["almond"][1][2, 5] = np.inf
    res = object_aware_splits(split_data, ["almond", "peanut"], "almond", 64,
                              verbose=False, use_pca=False)
    s = res.splits["almond"]
    total = s["cal"].shape[0] + s["val"].shape[0] + s["test"].shape[0]
    assert total == 10 * 20 - 2


def test_object_aware_splits_deterministic(split_data):
    r1 = object_aware_splits(split_data, ["almond", "peanut"], "almond", 64,
                             verbose=False)
    r2 = object_aware_splits(split_data, ["almond", "peanut"], "almond", 64,
                             verbose=False)
    np.testing.assert_array_equal(r1.x_cal, r2.x_cal)
    np.testing.assert_array_equal(r1.x_test, r2.x_test)


def test_object_aware_splits_two_and_one_objects(rng):
    data = {"a": _objects(rng, 2, 10, 32), "b": _objects(rng, 1, 10, 32)}
    res = object_aware_splits(data, ["a", "b"], "a", 32, verbose=False,
                              use_pca=False)
    assert res.splits["a"]["cal"].shape[0] == 10
    assert res.splits["a"]["val"].shape[0] == 0
    assert res.splits["a"]["test"].shape[0] == 10
    assert res.splits["b"]["test"].shape[0] == 0   # single object -> cal only


def test_object_aware_splits_bad_fracs(split_data):
    with pytest.raises(ValueError):
        object_aware_splits(split_data, ["almond"], "almond", 64,
                            cal_frac=0.5, val_frac=0.1, test_frac=0.1)


def test_object_aware_splits_dict_entries(rng):
    data = {"a": [{"spectral_data": o} for o in _objects(rng, 5, 12, 32)]}
    res = object_aware_splits(data, ["a"], "a", 32, verbose=False,
                              use_pca=False)
    assert res.x_cal.shape[1] == 32


# ---------------------------------------------------------------------------
# HSI extraction + HDF5 store
# ---------------------------------------------------------------------------

def test_extract_objects_segments_blobs():
    cube = np.zeros((20, 20, 8), dtype=np.float32)
    cube[2:6, 2:6, :] = 1.0          # object 1: 16 px
    cube[10:14, 10:15, :] = 2.0      # object 2: 20 px
    cube[0, 19, :] = 1.0             # 1-px object
    objs = extract_objects(cube, background_threshold=0.5)
    sizes = sorted(o["n_pixels"] for o in objs)
    assert sizes == [1, 16, 20]
    big = max(objs, key=lambda o: o["n_pixels"])
    assert big["spectral_data"].shape == (20, 8)
    np.testing.assert_allclose(big["mean_spectrum"], 2.0)
    # 8-connectivity: diagonal touching merges
    cube2 = np.zeros((6, 6, 2), dtype=np.float32)
    cube2[0, 0] = 1.0
    cube2[1, 1] = 1.0
    objs2 = extract_objects(cube2, 0.5)
    assert len(objs2) == 1 and objs2[0]["n_pixels"] == 2


def test_object_store_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    del h5py
    cube = np.zeros((12, 12, 5), dtype=np.float32)
    cube[1:4, 1:4, :] = 1.5
    cube[7:10, 7:11, :] = 2.5
    objs = extract_objects(cube, 0.5)
    path = str(tmp_path / "store.h5")
    write_object_store(path, {"almond": [objs], "peanut": [objs[:1]]})
    back = read_object_store(path)
    assert set(back) == {"almond", "peanut"}
    assert len(back["almond"]) == 2
    assert len(back["peanut"]) == 1
    got = {o["n_pixels"]: o for o in back["almond"]}
    want = {o["n_pixels"]: o for o in objs}
    for n, o in want.items():
        np.testing.assert_allclose(got[n]["spectral_data"],
                                   o["spectral_data"])


def test_json_artifacts_roundtrip(tmp_path):
    run = str(tmp_path / "run0")
    payload = {"lr": np.float32(0.001), "epochs": np.int64(10),
               "losses": np.arange(3.0), "nested": {"a": [np.float64(1.5)]}}
    save_json(payload, run, "params.json")
    back = load_json(run, "params.json")
    assert back["lr"] == pytest.approx(0.001)
    assert back["epochs"] == 10
    assert back["losses"] == [0.0, 1.0, 2.0]
    assert back["nested"]["a"] == [1.5]


def test_load_cheese_mat_roundtrip(tmp_path, rng):
    """The loader parses the reference's Xtr/Xts struct schema
    (data_cheese.py:22-45): 'data' matrices + 1-based 'class' vectors."""
    scipy_io = pytest.importorskip("scipy.io")

    from ocm_tpu.utils.io import cheese_wavelengths, load_cheese_mat

    x_tr = rng.normal(0, 1, (30, 20))
    y_tr = rng.integers(1, 6, 30)          # MATLAB-style 1-based labels
    x_ts = rng.normal(0, 1, (12, 20))
    y_ts = rng.integers(1, 6, 12)

    def struct(x, y):
        # MATLAB struct array: object-dtype record with nested cell layout
        return {"data": x, "class": np.array([[y]], dtype=object)}

    path = str(tmp_path / "IR_ML.mat")
    scipy_io.savemat(path, {"Xtr": struct(x_tr, y_tr),
                            "Xts": struct(x_ts, y_ts)})
    a, b, c, d = load_cheese_mat(path)
    np.testing.assert_allclose(a, x_tr)
    np.testing.assert_array_equal(b, y_tr - 1)   # shifted to 0-based
    np.testing.assert_allclose(c, x_ts)
    np.testing.assert_array_equal(d, y_ts - 1)
    wv = cheese_wavelengths(20)
    assert wv[0] == 2500.0 and wv[-1] == 4000.0


def test_read_object_store_classes_filter(tmp_path):
    pytest.importorskip("h5py")
    cube = np.zeros((10, 10, 4), dtype=np.float32)
    cube[2:5, 2:5, :] = 1.0
    objs = extract_objects(cube, 0.5)
    path = str(tmp_path / "s.h5")
    write_object_store(path, {"a": [objs], "b": [objs]})
    only_b = read_object_store(path, classes=["b"])
    assert set(only_b) == {"b"}
    assert only_b["b"][0]["nut_type"] == "b"


def test_write_object_store_uncompressed(tmp_path):
    pytest.importorskip("h5py")
    cube = np.zeros((8, 8, 3), dtype=np.float32)
    cube[1:3, 1:3, :] = 2.0
    objs = extract_objects(cube, 0.5)
    path = str(tmp_path / "u.h5")
    write_object_store(path, {"a": [objs]}, compression=None)
    back = read_object_store(path)
    np.testing.assert_allclose(back["a"][0]["spectral_data"],
                               objs[0]["spectral_data"])


def test_load_cheese_mat_field_order_and_plain_class(tmp_path, rng):
    """Name-based field access: re-ordered struct fields and a plain
    (N, 1) class vector (no cell nesting) both load identically."""
    scipy_io = pytest.importorskip("scipy.io")

    from ocm_tpu.utils.io import load_cheese_mat

    x_tr = rng.normal(0, 1, (14, 9))
    y_tr = rng.integers(1, 4, 14)
    x_ts = rng.normal(0, 1, (6, 9))
    y_ts = rng.integers(1, 4, 6)

    path = str(tmp_path / "reordered.mat")
    scipy_io.savemat(path, {
        # 'class' BEFORE 'data', stored as a plain column vector
        "Xtr": {"class": y_tr.reshape(-1, 1).astype(float), "data": x_tr},
        "Xts": {"class": y_ts.reshape(-1, 1).astype(float), "data": x_ts},
    })
    a, b, c, d = load_cheese_mat(path)
    np.testing.assert_allclose(a, x_tr)
    np.testing.assert_array_equal(b, y_tr - 1)
    np.testing.assert_allclose(c, x_ts)
    np.testing.assert_array_equal(d, y_ts - 1)


def test_load_cheese_mat_schema_errors(tmp_path, rng):
    scipy_io = pytest.importorskip("scipy.io")

    from ocm_tpu.utils.io import load_cheese_mat

    x = rng.normal(0, 1, (8, 5))
    y = rng.integers(1, 3, 8)

    p1 = str(tmp_path / "missing_struct.mat")
    scipy_io.savemat(p1, {"Xtr": {"data": x, "class": y}})
    with pytest.raises(ValueError, match="missing struct 'Xts'"):
        load_cheese_mat(p1)

    p2 = str(tmp_path / "missing_field.mat")
    scipy_io.savemat(p2, {"Xtr": {"data": x, "labels": y},
                          "Xts": {"data": x, "labels": y}})
    with pytest.raises(ValueError, match="no field 'class'"):
        load_cheese_mat(p2)

    p3 = str(tmp_path / "not_struct.mat")
    scipy_io.savemat(p3, {"Xtr": x, "Xts": x})
    with pytest.raises(ValueError, match="expected a MATLAB struct"):
        load_cheese_mat(p3)

    p4 = str(tmp_path / "count_mismatch.mat")
    scipy_io.savemat(p4, {"Xtr": {"data": x, "class": y[:5]},
                          "Xts": {"data": x, "class": y}})
    with pytest.raises(ValueError, match="expected 8 labels"):
        load_cheese_mat(p4)


def test_load_swir_mat_roundtrip_to_object_store(tmp_path, rng):
    """Full SWIR ingest chain on a savemat round trip: flat field->cube
    .mat (nut_data.py:16-60 schema) -> class-matched cubes ->
    extract_objects -> HDF5 object store -> read back."""
    scipy_io = pytest.importorskip("scipy.io")
    pytest.importorskip("h5py")

    from ocm_tpu.utils.io import load_swir_mat

    def blob_cube(row, col):
        cube = np.zeros((12, 12, 5), dtype=np.float32)
        cube[row:row + 3, col:col + 3, :] = rng.normal(
            1.0, 0.05, (3, 3, 5)).astype(np.float32)
        return cube

    path = str(tmp_path / "SWIR_sb.mat")
    scipy_io.savemat(path, {
        "Almond_img1": blob_cube(1, 1),
        "almond_2": blob_cube(5, 6),
        "PEANUT_a": blob_cube(2, 7),
        "calibration_panel": blob_cube(0, 0),   # matches no class
    })
    cubes, skipped = load_swir_mat(path, ["almond", "peanut"])
    assert len(cubes["almond"]) == 2
    assert len(cubes["peanut"]) == 1
    assert skipped == ["calibration_panel"]

    data = {cls: [extract_objects(c, 0.1) for c in imgs]
            for cls, imgs in cubes.items()}
    assert all(len(objs) == 1 for imgs in data.values() for objs in imgs)
    h5 = str(tmp_path / "objects.h5")
    write_object_store(h5, data)
    back = read_object_store(h5)
    assert set(back) == {"almond", "peanut"}
    assert back["almond"][0]["spectral_data"].shape == (9, 5)


def _write_mat_v73(path, tree):
    """Write a MATLAB v7.3-layout HDF5 file: datasets column-major (axes
    reversed vs numpy), structs as groups, plus the v7.3 userblock magic
    that makes scipy.io.loadmat raise NotImplementedError."""
    import h5py

    with h5py.File(path, "w", userblock_size=512) as f:
        def write(group, node):
            for k, v in node.items():
                if isinstance(v, dict):
                    write(group.create_group(k), v)
                else:
                    group.create_dataset(k, data=np.asarray(v).T)
        write(f, tree)
    # MATLAB writes a 124-byte text header into the userblock, then the
    # version word (0x0200 = v7.3) + endian marker at offsets 124-127 —
    # exactly what scipy reads to decide "use the HDF reader"
    with open(path, "r+b") as f:
        text = b"MATLAB 7.3 MAT-file, written by ocm_tpu tests"
        f.write(text + b" " * (124 - len(text)))
        f.write(bytes([0x00, 0x02]) + b"IM")


def test_load_cheese_mat_v73(tmp_path, rng):
    """The same Xtr/Xts schema stored as MATLAB v7.3 (HDF5): scipy rejects
    it, the h5py fallback loads it identically to the classic format."""
    import scipy.io
    pytest.importorskip("h5py")

    from ocm_tpu.utils.io import load_cheese_mat

    x_tr = rng.normal(0, 1, (18, 11))
    y_tr = rng.integers(1, 4, 18)
    x_ts = rng.normal(0, 1, (7, 11))
    y_ts = rng.integers(1, 4, 7)
    path = str(tmp_path / "IR_ML_v73.mat")
    _write_mat_v73(path, {
        "Xtr": {"data": x_tr, "class": y_tr.reshape(-1, 1).astype(float)},
        "Xts": {"data": x_ts, "class": y_ts.reshape(-1, 1).astype(float)},
    })
    with pytest.raises(NotImplementedError):
        scipy.io.loadmat(path)          # proves this IS the v7.3 case
    a, b, c, d = load_cheese_mat(path)
    np.testing.assert_allclose(a, x_tr)
    np.testing.assert_array_equal(b, y_tr - 1)
    np.testing.assert_allclose(c, x_ts)
    np.testing.assert_array_equal(d, y_ts - 1)


def test_load_cheese_mat_v73_cell_class(tmp_path, rng):
    """v7.3 with the class vector stored as a MATLAB CELL array (HDF5
    object-reference dataset) — the dereference branch of _h5_read."""
    import h5py

    from ocm_tpu.utils.io import load_cheese_mat

    x_tr = rng.normal(0, 1, (9, 5))
    y_tr = rng.integers(1, 3, 9)
    path = str(tmp_path / "cell_v73.mat")
    with h5py.File(path, "w", userblock_size=512) as f:
        refs = f.create_group("#refs#")
        for key, x, y in (("Xtr", x_tr, y_tr), ("Xts", x_tr[:4], y_tr[:4])):
            g = f.create_group(key)
            g.create_dataset("data", data=x.T)
            # cell array {y}: a (1, 1) reference dataset pointing at the
            # column vector, like MATLAB writes nested cells
            target = refs.create_dataset(
                f"{key}_class0", data=y.reshape(-1, 1).astype(float).T)
            cell = g.create_dataset(
                "class", shape=(1, 1), dtype=h5py.ref_dtype)
            cell[0, 0] = target.ref
    with open(path, "r+b") as f:
        text = b"MATLAB 7.3 MAT-file"
        f.write(text + b" " * (124 - len(text)) + bytes([0x00, 0x02]) + b"IM")
    a, b, c, d = load_cheese_mat(path)
    np.testing.assert_allclose(a, x_tr)
    np.testing.assert_array_equal(b, y_tr - 1)
    np.testing.assert_array_equal(d, y_tr[:4] - 1)


def test_load_swir_mat_v73_and_substring_shadowing(tmp_path, rng):
    """v7.3 SWIR cubes load with axes restored, and a class name that
    contains another ('walnut' vs 'nut') is matched longest-first instead
    of being claimed by whichever class appears first in the list."""
    pytest.importorskip("h5py")

    from ocm_tpu.utils.io import load_swir_mat

    cube_w = rng.normal(1.0, 0.05, (6, 9, 4)).astype(np.float32)
    cube_n = rng.normal(2.0, 0.05, (5, 7, 4)).astype(np.float32)
    path = str(tmp_path / "SWIR_v73.mat")
    _write_mat_v73(path, {"walnut_img1": cube_w, "nut_mix_img2": cube_n})
    # 'nut' listed FIRST: without longest-first matching it would claim
    # walnut_img1 too
    cubes, skipped = load_swir_mat(path, ["nut", "walnut"])
    assert skipped == []
    assert len(cubes["walnut"]) == 1 and len(cubes["nut"]) == 1
    np.testing.assert_allclose(cubes["walnut"][0], cube_w, rtol=1e-6)
    np.testing.assert_allclose(cubes["nut"][0], cube_n, rtol=1e-6)


def test_h5_char_decode_and_ragged_cells(tmp_path, rng):
    """v7.3 oddities a real MATLAB file can carry: char data (stored as
    uint16 code units) decodes to Python strings instead of silently
    loading as meaningless integer codes, and ragged cell arrays come
    back as an object array (with _unwrap_cell raising a CLEAR schema
    error) rather than an opaque np.stack shape error."""
    import h5py

    from ocm_tpu.utils.io import _loadmat, _unwrap_cell

    path = str(tmp_path / "odd_v73.mat")
    a = rng.normal(0, 1, (3, 4))
    b = rng.normal(0, 1, (2, 4))          # ragged vs a
    with h5py.File(path, "w", userblock_size=512) as f:
        ch = f.create_dataset(
            "label", data=np.array([ord(c) for c in "peanut"],
                                   np.uint16).reshape(-1, 1))
        ch.attrs["MATLAB_class"] = np.bytes_("char")
        refs = f.create_group("#refs#")
        t1 = refs.create_dataset("c0", data=a.T)
        t2 = refs.create_dataset("c1", data=b.T)
        cell = f.create_dataset("ragged", shape=(2, 1),
                                dtype=h5py.ref_dtype)
        cell[0, 0] = t1.ref
        cell[1, 0] = t2.ref
    with open(path, "r+b") as f:
        text = b"MATLAB 7.3 MAT-file"
        f.write(text + b" " * (124 - len(text)) + bytes([0x00, 0x02]) + b"IM")

    raw = _loadmat(path)
    assert raw["label"] == "peanut"
    ragged = raw["ragged"]
    assert ragged.dtype == object and len(ragged) == 2
    np.testing.assert_allclose(ragged[0], a)
    np.testing.assert_allclose(ragged[1], b)
    with pytest.raises(ValueError, match="ragged MATLAB cell"):
        _unwrap_cell(ragged)


def test_load_swir_mat_errors(tmp_path, rng):
    scipy_io = pytest.importorskip("scipy.io")

    from ocm_tpu.utils.io import load_swir_mat

    p1 = str(tmp_path / "no_match.mat")
    scipy_io.savemat(p1, {"walnut_x": np.zeros((4, 4, 3))})
    with pytest.raises(ValueError, match="no field matched"):
        load_swir_mat(p1, ["almond", "peanut"])

    p2 = str(tmp_path / "not_cube.mat")
    scipy_io.savemat(p2, {"almond_x": np.zeros((4, 4))})
    with pytest.raises(ValueError, match=r"\(H, W, L\) cube"):
        load_swir_mat(p2, ["almond"])


def test_outlier_mask_rsvd_flags_same_outliers(rng):
    """The randomized solver flags the same gross outliers as the full
    SVD; marginal samples at the percentile threshold may flip when
    n_components cuts into the degenerate noise bulk (subspace rotation
    ambiguity, inherent to any solver pair)."""
    import jax.numpy as jnp

    from oracles import make_class_spectra

    x = make_class_spectra(rng, 300, 70)
    bad = [3, 40, 222]
    for i, scale in zip(bad, (3.0, -2.5, 4.0)):
        x[i] += scale
    k_svd, _, _ = mahalanobis_outlier_mask(jnp.asarray(x), 8)
    k_rs, _, _ = mahalanobis_outlier_mask(jnp.asarray(x), 8, solver="rsvd")
    for i in bad:
        assert not bool(k_svd[i]) and not bool(k_rs[i])
    assert np.mean(np.asarray(k_svd) == np.asarray(k_rs)) >= 0.95
    with pytest.raises(ValueError, match="solver"):
        mahalanobis_outlier_mask(jnp.asarray(x), 8, solver="qr")
