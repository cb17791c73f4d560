"""CV-SIMCA engine parity tests.

Oracle = a host loop mirroring utils/CVSIMCA.py:103-269 exactly (sklearn
KFold splits, per-fold SimcaOracle fit/decide, fold-mean spec + pooled sens),
asserted against the batched (folds x LV) device solve.
"""

import numpy as np
import pytest

from ocm_tpu.models.cv import (ClasswiseKFoldWithExternalVal,
                               cross_validate_simca_grid, cv_simca_sweep,
                               fold_masks, kfold_slices, parameter_grid)
from ocm_tpu.models.simca import SIMCA

from oracles import SimcaOracle, make_class_spectra

sklearn_ms = pytest.importorskip("sklearn.model_selection")


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(11)
    x0 = make_class_spectra(rng, 60, 48)                  # target class
    x1 = make_class_spectra(rng, 25, 48, center_shift=1.0)
    x2 = make_class_spectra(rng, 20, 48, center_shift=2.0)
    x = np.concatenate([x0, x1, x2])
    y = np.concatenate([np.zeros(60), np.ones(25), np.full(20, 2)])
    perm = rng.permutation(len(y))
    return x[perm], y[perm].astype(int)


# ---------------------------------------------------------------------------
# Splitter parity with sklearn KFold
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,k,shuffle,seed", [
    (60, 5, False, None), (61, 5, False, None), (63, 4, True, 42),
    (17, 3, True, 0),
])
def test_kfold_slices_match_sklearn(n, k, shuffle, seed):
    kf = sklearn_ms.KFold(n_splits=k, shuffle=shuffle, random_state=seed)
    ours = kfold_slices(n, k, shuffle, seed)
    theirs = [test for _, test in kf.split(np.arange(n))]
    for a, b in zip(ours, theirs):
        np.testing.assert_array_equal(np.sort(a), np.sort(b))


def test_classwise_split_matches_reference_semantics(dataset):
    x, y = dataset
    cv = ClasswiseKFoldWithExternalVal(n_splits=5, cls_label=0)
    cls_idx = np.flatnonzero(y == 0)
    others = np.setdiff1d(np.arange(len(y)), cls_idx)
    kf = sklearn_ms.KFold(n_splits=5)
    expected = []
    for tr_rel, te_rel in kf.split(cls_idx):
        expected.append((cls_idx[tr_rel],
                         np.concatenate([cls_idx[te_rel], others])))
    got = list(cv.split(x, y))
    assert len(got) == 5
    for (tr_g, te_g), (tr_e, te_e) in zip(got, expected):
        np.testing.assert_array_equal(np.sort(tr_g), np.sort(tr_e))
        np.testing.assert_array_equal(np.sort(te_g), np.sort(te_e))


def test_classwise_split_validation_errors(dataset):
    x, y = dataset
    with pytest.raises(ValueError):
        list(ClasswiseKFoldWithExternalVal(5, cls_label=9).split(x, y))
    with pytest.raises(ValueError):
        list(ClasswiseKFoldWithExternalVal(5, cls_label=0).split(x, None))
    with pytest.raises(ValueError):
        list(ClasswiseKFoldWithExternalVal(99, cls_label=0).split(x, y))
    # scalar cls_idx resolved as a label (utils/CVSIMCA.py:64-68)
    got = list(ClasswiseKFoldWithExternalVal(5, cls_idx=np.asarray(0)).split(x, y))
    assert len(got) == 5


def test_fold_masks_consistent_with_split(dataset):
    x, y = dataset
    train_m, held_m = fold_masks(y, 0, 5)
    cv = ClasswiseKFoldWithExternalVal(n_splits=5, cls_label=0)
    for f, (tr, te) in enumerate(cv.split(x, y)):
        np.testing.assert_array_equal(np.flatnonzero(train_m[f]), np.sort(tr))
        held = np.flatnonzero(held_m[f])
        np.testing.assert_array_equal(
            np.sort(np.concatenate([held, np.flatnonzero(y != 0)])),
            np.sort(te))


def test_parameter_grid_matches_sklearn():
    grid = {"type": ["alt", "sim"], "t2lim": ["Fdist", "chi2"]}
    ours = list(parameter_grid(grid))
    theirs = list(sklearn_ms.ParameterGrid(grid))
    assert ours == theirs
    assert list(parameter_grid({})) == [{}]


# ---------------------------------------------------------------------------
# Batched sweep vs host-loop oracle
# ---------------------------------------------------------------------------

def _oracle_sweep(x, y, cls_label, lv_values, n_splits, dtype_="alt",
                  t2lim="Fdist", qlim="jm"):
    """Host loop mirroring utils/CVSIMCA.py:179-208 with SimcaOracle."""
    cls_idx = np.flatnonzero(y == cls_label)
    others = np.setdiff1d(np.arange(len(y)), cls_idx)
    kf = sklearn_ms.KFold(n_splits=n_splits)
    splits = [(cls_idx[tr], np.concatenate([cls_idx[te], others]))
              for tr, te in kf.split(cls_idx)]
    out = {"spec": [], "sens": [], "eff": []}
    for lv in lv_values:
        pred_vec = np.zeros(len(y))
        specs = []
        for tr, te in splits:
            o = SimcaOracle(dtype_, t2lim, qlim).fit(x[tr], lv)
            acc, _, _, _ = o.decide(x[te])
            pred_vec[te] = acc
            yt = y[te]
            tn = np.sum((acc == 0) & (yt != cls_label))
            fp = np.sum((acc == 1) & (yt != cls_label))
            specs.append(tn / (tn + fp) * 100)
        spec = float(np.mean(specs))
        tp = np.sum((pred_vec == 1) & (y == cls_label))
        fn = np.sum((pred_vec == 0) & (y == cls_label))
        sens = tp / (tp + fn) * 100
        out["spec"].append(spec)
        out["sens"].append(sens)
        out["eff"].append(np.sqrt(sens * spec))
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("dtype_,t2lim,qlim", [
    ("alt", "Fdist", "jm"),
    ("sim", "chi2", "chi2box"),
    ("ci", "perc", "perc"),
    ("dd", "chi2pom", "chi2pom"),
])
def test_sweep_matches_oracle(dataset, dtype_, t2lim, qlim):
    x, y = dataset
    lvs = [2, 3, 5, 8]
    got = cv_simca_sweep(x, y, 0, lvs, n_splits=5, decision_type=dtype_,
                         t2_method=t2lim, q_method=qlim)
    want = _oracle_sweep(x, y, 0, lvs, 5, dtype_, t2lim, qlim)
    np.testing.assert_allclose(got["spec"], want["spec"], atol=1e-8)
    np.testing.assert_allclose(got["sens"], want["sens"], atol=1e-8)
    np.testing.assert_allclose(got["eff"], want["eff"], atol=1e-8)


def test_grid_search_selects_best(dataset):
    x, y = dataset
    est = SIMCA(model_class=0, type="alt", t2lim="Fdist", qlim="jm",
                verbose=False)
    cv = ClasswiseKFoldWithExternalVal(n_splits=4, cls_label=0)
    res = cross_validate_simca_grid(est, x, y, cv, LV_min=2, LV_max=6,
                                    param_grid={"type": ["alt", "sim"]},
                                    print_summary=False,
                                    store_predictions=True)
    assert len(res["results"]) == 2 * 5
    best_eff = max(r["eff"] for r in res["results"])
    assert res["best_score"] == best_eff
    assert res["best_estimator"].is_fitted_
    assert res["best_estimator"].n_components == res["best_LV"]
    assert len(res["by_combo"]) == len(res["results"])
    # argmax first-max tie-break
    effs = [r["eff"] for r in res["results"]]
    assert res["results"][int(np.argmax(effs))]["LV"] == res["best_LV"]


def test_grid_with_ncomp_skips_lv_sweep(dataset):
    x, y = dataset
    est = SIMCA(model_class=0, verbose=False)
    cv = ClasswiseKFoldWithExternalVal(n_splits=4, cls_label=0)
    res = cross_validate_simca_grid(est, x, y, cv,
                                    param_grid={"n_components": [3, 5]},
                                    print_summary=False)
    assert sorted(r["LV"] for r in res["results"]) == [3, 5]


def test_grid_rejects_bad_metric(dataset):
    x, y = dataset
    est = SIMCA(model_class=0, verbose=False)
    cv = ClasswiseKFoldWithExternalVal(n_splits=4, cls_label=0)
    with pytest.raises(ValueError):
        cross_validate_simca_grid(est, x, y, cv, refit_metric="f1")


def test_sweep_rsvd_matches_eigh(dataset):
    """The GEMM-only rsvd CV sweep reproduces the dense-eigh sweep.

    On gapped multi-mode spectra the per-(fold, LV) metrics must agree
    essentially exactly; on the standard one-mode dataset (degenerate
    noise tail — inherently rotation-ambiguous) the aggregate metrics
    must stay within the limits' own sampling tolerance."""
    from test_simca import make_multirank_spectra

    rng = np.random.default_rng(5)
    xg = np.concatenate([make_multirank_spectra(rng, 80, 64),
                         make_multirank_spectra(rng, 30, 64) + 0.5])
    yg = np.concatenate([np.zeros(80), np.ones(30)]).astype(int)
    lvs = [2, 3, 4, 5]
    eigh_out = cv_simca_sweep(xg, yg, 0, lvs, n_splits=4)
    rsvd_out = cv_simca_sweep(xg, yg, 0, lvs, n_splits=4, solver="rsvd")
    np.testing.assert_allclose(rsvd_out["spec"], eigh_out["spec"],
                               atol=1e-8)
    np.testing.assert_allclose(rsvd_out["sens"], eigh_out["sens"],
                               atol=1e-8)
    np.testing.assert_array_equal(rsvd_out["pred"], eigh_out["pred"])

    x, y = dataset
    lvs = [2, 4, 6]
    eigh_out = cv_simca_sweep(x, y, 0, lvs, n_splits=5)
    rsvd_out = cv_simca_sweep(x, y, 0, lvs, n_splits=5, solver="rsvd")
    assert np.mean(rsvd_out["pred"] == eigh_out["pred"]) >= 0.97
    np.testing.assert_allclose(rsvd_out["spec"], eigh_out["spec"], atol=6.0)
    np.testing.assert_allclose(rsvd_out["sens"], eigh_out["sens"], atol=6.0)


def test_sweep_rejects_bad_solver(dataset):
    x, y = dataset
    with pytest.raises(ValueError, match="solver"):
        cv_simca_sweep(x, y, 0, [2, 3], n_splits=4, solver="qr")


def test_multiclass_sweep_matches_per_class():
    """cv_simca_sweep_multiclass: C classes' whole (fold x LV) grids in
    one jitted program; every row equals the per-class sweep."""
    from ocm_tpu.models.cv import cv_simca_sweep, cv_simca_sweep_multiclass

    rng = np.random.default_rng(17)
    t = np.linspace(0, 1, 40)

    def block(c, n):
        base = np.sin(2 * np.pi * (3 + 0.7 * c) * t) + 0.25 * c
        return (rng.normal(1, 0.08, (n, 1)) * base
                + rng.normal(0, 0.02, (n, 40)))

    x = np.concatenate([block(0, 60), block(1, 45), block(2, 36)])
    y = np.concatenate([np.zeros(60), np.ones(45), np.full(36, 2)])
    lvs = [2, 3, 5]
    for solver in ("eigh", "rsvd"):
        got = cv_simca_sweep_multiclass(x, y, [0, 1, 2], lvs, n_splits=4,
                                        solver=solver)
        assert got["eff"].shape == (3, len(lvs))
        for c in range(3):
            want = cv_simca_sweep(x, y, c, lvs, n_splits=4, solver=solver)
            np.testing.assert_allclose(got["spec"][c], want["spec"],
                                       atol=1e-8)
            np.testing.assert_allclose(got["sens"][c], want["sens"],
                                       atol=1e-8)
            np.testing.assert_array_equal(got["pred"][c], want["pred"])

    with pytest.raises(ValueError, match="solver"):
        cv_simca_sweep_multiclass(x, y, [0, 1], [2], solver="nope")


def test_cv_sweep_gram_side_matches_cov_side(rng):
    """Long-spectrum CV (N < L): the auto-picked Gram-side fold solve
    reproduces the covariance-side sweep's aggregates exactly (the same
    dense decomposition computed on the cheaper (N, N) side; ``side=`` is
    threaded through cv_simca_sweep like ``solver=``)."""
    import ocm_tpu.models.cv as cv_mod

    x = np.concatenate([
        make_class_spectra(rng, 36, 100).astype(np.float64),
        make_class_spectra(rng, 24, 100, center_shift=0.8).astype(np.float64),
    ])
    y = np.repeat([0, 1], [36, 24])
    kw = dict(lv_values=range(1, 5), n_splits=3, t2_method="Fdist",
              q_method="jm")
    got = cv_mod.cv_simca_sweep(x, y, 0, **kw)          # auto -> gram
    want = cv_mod.cv_simca_sweep(x, y, 0, side="cov", **kw)
    np.testing.assert_allclose(got["sens"], want["sens"], atol=1e-9)
    np.testing.assert_allclose(got["spec"], want["spec"], atol=1e-9)
    np.testing.assert_array_equal(got["pred"], want["pred"])
