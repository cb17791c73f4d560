"""CLI tests: ``python -m ocm_tpu`` subcommands run in-process on tiny
synthetic data; every command's run-dir artifacts are checked and the
screen command's decisions are verified against the direct API.

The reference's L5 layer is plain scripts with hardcoded constants
(SURVEY.md section 2.2); the CLI replaces them, so these tests are the
driver-surface regression suite.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from ocm_tpu import cli
from ocm_tpu.utils.synthetic import cheese_like


@pytest.fixture(scope="module")
def tiny_npz(tmp_path_factory):
    """A small 3-class dataset in the x_train/... npz layout."""
    x_tr, y_tr, x_ts, y_ts = cheese_like(seed=3, n_per_class=40, length=64,
                                         n_classes=3)
    path = tmp_path_factory.mktemp("data") / "tiny.npz"
    np.savez(path, x_train=x_tr, y_train=y_tr, x_test=x_ts, y_test=y_ts)
    return str(path)


def _load_json(run_dir, name):
    with open(os.path.join(run_dir, name)) as f:
        return json.load(f)


def test_load_dataset_npz_forms(tmp_path):
    x = np.random.default_rng(0).normal(size=(50, 16))
    y = np.repeat([0, 1], 25)
    p_xy = tmp_path / "xy.npz"
    np.savez(p_xy, x=x, y=y)
    x_tr, y_tr, x_ts, y_ts = cli.load_dataset(str(p_xy), seed=0)
    assert len(x_tr) + len(x_ts) == 50
    assert x_tr.shape[1] == 16

    p_bad = tmp_path / "bad.npz"
    np.savez(p_bad, foo=x)
    with pytest.raises(ValueError, match="expected keys"):
        cli.load_dataset(str(p_bad))
    with pytest.raises(ValueError, match="unsupported data file"):
        cli.load_dataset("data.csv")


def test_simca_fit_and_screen(tiny_npz, tmp_path):
    fit_dir = str(tmp_path / "fit")
    rc = cli.main(["simca", "--data", tiny_npz, "--n-components", "5",
                   "--quiet", "--out-dir", fit_dir])
    assert rc == 0
    metrics = _load_json(fit_dir, "metrics.json")
    assert metrics["0"]["sensitivity"] > 80.0
    assert os.path.exists(os.path.join(fit_dir, cli.SIMCA_MODEL_FILE))

    screen_dir = str(tmp_path / "screen")
    rc = cli.main(["screen", "--data", tiny_npz, "--model-dir", fit_dir,
                   "--out-dir", screen_dir])
    assert rc == 0
    preds = np.load(os.path.join(screen_dir, "predictions.npz"))
    z = np.load(tiny_npz)
    assert len(preds["accept"]) == len(z["x_test"])

    # screen decisions match the direct API on the same model file
    from ocm_tpu.models.simca import load_simca_model, simca_decide

    model = load_simca_model(os.path.join(fit_dir, cli.SIMCA_MODEL_FILE))
    accept, _, _, _ = simca_decide(model, jnp.asarray(z["x_test"]), "alt")
    np.testing.assert_array_equal(np.asarray(accept),
                                  preds["accept"].astype(bool))


def test_simca_model_save_load_roundtrip(tiny_npz, tmp_path):
    from ocm_tpu.models.simca import (fit_simca, load_simca_model,
                                      save_simca_model)

    z = np.load(tiny_npz)
    x_cls = z["x_train"][z["y_train"] == 0]
    model = fit_simca(jnp.asarray(x_cls), 4)
    path = str(tmp_path / "m.msgpack")
    save_simca_model(path, model)
    loaded = load_simca_model(path)
    for f in model._fields:
        np.testing.assert_array_equal(
            np.asarray(jnp.asarray(getattr(model, f))),
            np.asarray(jnp.asarray(getattr(loaded, f))), err_msg=f)


def test_simca_all_classes_stacked_screen(tiny_npz, tmp_path):
    fit_dir = str(tmp_path / "fit_all")
    rc = cli.main(["simca", "--data", tiny_npz, "--all-classes",
                   "--n-components", "5", "--solver", "rsvd",
                   "--out-dir", fit_dir])
    assert rc == 0
    meta = _load_json(fit_dir, cli.SIMCA_META_JSON)
    assert meta["stacked"] and meta["class_labels"] == [0, 1, 2]

    screen_dir = str(tmp_path / "screen_all")
    rc = cli.main(["screen", "--data", tiny_npz, "--model-dir", fit_dir,
                   "--store-dtype", "int8", "--out-dir", screen_dir])
    assert rc == 0
    preds = np.load(os.path.join(screen_dir, "predictions.npz"))
    assert preds["accept"].shape[1] == 3
    metrics = _load_json(screen_dir, "metrics.json")
    assert set(metrics) == {"0", "1", "2"}


def test_binary_labels_dense_for_any_target():
    """Target >= 2 must not collide non-target classes or leave an empty
    false-acceptance column (review fix: naive maximum(y, 1) remap)."""
    y = np.array([0, 1, 2, 3, 4, 3, 0])
    got = cli._binary_labels(y, target_class=3)
    # target -> 0; others dense 1..4 in sorted order (0->1,1->2,2->3,4->4)
    np.testing.assert_array_equal(got, [1, 2, 3, 0, 4, 0, 1])
    assert set(got) == {0, 1, 2, 3, 4}


def test_class_split_tiny_class_raises():
    x = np.zeros((10, 8))
    y = np.array([0] * 7 + [1] * 3)
    with pytest.raises(ValueError, match="class 1 has 3 samples"):
        cli._class_split(x, y, 1)
    with pytest.raises(ValueError, match="class 2 has 0 samples"):
        cli._class_split(x, y, 2)


def test_simca_all_classes_dd_coerced(tiny_npz, tmp_path):
    """--type dd must fit chi2pom limits (the SIMCA wrapper coerces;
    the vmapped fit_classes path must too — Fdist/jm limits carry
    dof=scale=1 and reject nearly everything).  Contract: the stacked
    CLI fit reproduces the reference-parity wrapper's dd decisions."""
    fit_dir = str(tmp_path / "dd")
    rc = cli.main(["simca", "--data", tiny_npz, "--all-classes",
                   "--type", "dd", "--n-components", "5",
                   "--out-dir", fit_dir])
    assert rc == 0
    meta = _load_json(fit_dir, cli.SIMCA_META_JSON)
    assert meta["t2lim"] == meta["qlim"] == "chi2pom"
    metrics = _load_json(fit_dir, "metrics.json")

    from ocm_tpu.models.simca import SIMCA

    z = np.load(tiny_npz)
    ref = SIMCA(n_components=5, model_class=0, type="dd", verbose=False)
    ref.fit(z["x_train"], z["y_train"])
    ref.predict(z["x_test"], y_true=z["y_test"])
    assert metrics["0"]["sensitivity"] == pytest.approx(
        ref.metrics[0]["sensitivity"], abs=1e-4)
    assert metrics["0"]["specificity"] == pytest.approx(
        ref.metrics[0]["specificity"], abs=1e-4)


def test_cv_refit_and_plot(tiny_npz, tmp_path):
    out = str(tmp_path / "cv")
    rc = cli.main(["cv", "--data", tiny_npz, "--lv-min", "2", "--lv-max",
                   "4", "--n-splits", "3", "--refit", "--plots",
                   "--out-dir", out])
    assert rc == 0
    res = _load_json(out, "cv.json")
    assert res["lv_values"] == [2, 3, 4]
    assert res["best_lv"] in (2, 3, 4)
    assert len(res["eff"]) == 3
    assert os.path.exists(os.path.join(out, "cv.png"))
    meta = _load_json(out, cli.SIMCA_META_JSON)
    assert meta["n_components"] == res["best_lv"]


def test_train_vae_screen_export(tiny_npz, tmp_path):
    train_dir = str(tmp_path / "vae")
    rc = cli.main(["train-vae", "--data", tiny_npz, "--epochs", "3",
                   "--batch-size", "16", "--latent-dim", "4",
                   "--conv-blocks", "2", "--n-filters", "4",
                   "--hidden-fc", "16", "--plots",
                   "--out-dir", train_dir])
    assert rc == 0
    assert os.path.exists(os.path.join(train_dir, "losses_c0.png"))
    params = _load_json(train_dir, "params.json")
    assert params["arch"]["input_length"] == 64
    losses = _load_json(train_dir, "losses.json")
    assert len(losses["train_losses"]) == 3
    metrics = _load_json(train_dir, "metrics.json")
    assert set(metrics) == {"d2", "d2_q", "f", "full", "vaesimca"}
    assert os.path.exists(os.path.join(train_dir, cli.VAESIMCA_FILE))

    screen_dir = str(tmp_path / "vscreen")
    rc = cli.main(["screen", "--data", tiny_npz, "--model-dir", train_dir,
                   "--variant", "d2", "--out-dir", screen_dir])
    assert rc == 0
    preds = np.load(os.path.join(screen_dir, "predictions.npz"))
    z = np.load(tiny_npz)
    assert len(preds["accept"]) == len(z["x_test"])
    # the screen metrics reproduce the train-time d2 metrics (same data)
    sm = _load_json(screen_dir, "metrics.json")
    assert sm["d2"] == pytest.approx(metrics["d2"], abs=1e-6)

    # variant 5 through serving matches the train-time metrics too
    vs_dir = str(tmp_path / "vs_screen")
    rc = cli.main(["screen", "--data", tiny_npz, "--model-dir", train_dir,
                   "--variant", "vaesimca", "--out-dir", vs_dir])
    assert rc == 0
    vsm = _load_json(vs_dir, "metrics.json")
    assert vsm["vaesimca"] == pytest.approx(metrics["vaesimca"], abs=1e-6)

    # deployment-pinned variant 'f' (host-f64 quirk-Q3 stats): same
    # decisions as the compiled-statistics path on CPU
    fp_dir, f_dir = str(tmp_path / "f_pin"), str(tmp_path / "f_ref")
    for d, extra in ((f_dir, []), (fp_dir, ["--pin-f-stats"])):
        rc = cli.main(["screen", "--data", tiny_npz, "--model-dir",
                       train_dir, "--variant", "f", "--out-dir", d] + extra)
        assert rc == 0
    np.testing.assert_array_equal(
        np.load(os.path.join(fp_dir, "predictions.npz"))["accept"],
        np.load(os.path.join(f_dir, "predictions.npz"))["accept"])
    # and it is variant-'f'-only
    with pytest.raises(SystemExit, match="pin-f-stats"):
        cli.main(["screen", "--data", tiny_npz, "--model-dir", train_dir,
                  "--variant", "d2", "--pin-f-stats",
                  "--out-dir", str(tmp_path / "bad")])

    torch = pytest.importorskip("torch")
    pth = str(tmp_path / "model.pth")
    rc = cli.main(["export-torch", "--model-dir", train_dir, "--out", pth])
    assert rc == 0
    state = torch.load(pth, map_location="cpu", weights_only=False)
    assert any(k.startswith("enc") or "fc_mu" in k for k in state)


def test_train_vae_all_classes_stacked(tiny_npz, tmp_path):
    """--all-classes trains C one-class VAEs as one vmapped program; the
    run dir serves stacked ((N, C) decisions) and exports per class."""
    train_dir = str(tmp_path / "vae_all")
    rc = cli.main(["train-vae", "--data", tiny_npz, "--all-classes",
                   "--epochs", "2", "--batch-size", "16",
                   "--latent-dim", "4", "--conv-blocks", "2",
                   "--n-filters", "4", "--hidden-fc", "16",
                   "--out-dir", train_dir])
    assert rc == 0
    params = _load_json(train_dir, "params.json")
    assert params["class_labels"] == [0, 1, 2]
    metrics = _load_json(train_dir, "metrics.json")
    assert set(metrics["d2"]) == {"0", "1", "2"}
    losses = _load_json(train_dir, "losses.json")
    assert np.asarray(losses["train_losses"]).shape == (3, 2)

    screen_dir = str(tmp_path / "vascreen")
    rc = cli.main(["screen", "--data", tiny_npz, "--model-dir", train_dir,
                   "--variant", "vaesimca", "--out-dir", screen_dir])
    assert rc == 0
    preds = np.load(os.path.join(screen_dir, "predictions.npz"))
    assert preds["accept"].shape[1] == 3
    sm = _load_json(screen_dir, "metrics.json")
    assert sm["vaesimca"]["1"] == pytest.approx(metrics["vaesimca"]["1"],
                                                abs=1e-6)

    pytest.importorskip("torch")
    with pytest.raises(SystemExit, match="--class-index"):
        cli.main(["export-torch", "--model-dir", train_dir,
                  "--out", str(tmp_path / "x.pth")])
    rc = cli.main(["export-torch", "--model-dir", train_dir,
                   "--class-index", "1", "--out",
                   str(tmp_path / "c1.pth")])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "c1.pth"))


def test_ingest_object_store(tmp_path):
    out = str(tmp_path / "store.h5")
    rc = cli.main(["ingest", "--images-per-class", "1", "--out", out])
    assert rc == 0
    from ocm_tpu.utils.io import read_object_store

    data = read_object_store(out)
    assert len(data) == 5
    assert all(objs and objs[0]["spectral_data"].shape[1] == 288
               for objs in data.values())

    # the store feeds any data-consuming command directly: fit SIMCA on
    # an object-level split of the ingested pixel spectra
    x_tr, y_tr, x_ts, y_ts = cli.load_dataset(out, seed=1)
    assert x_tr.shape[1] == 288 and set(np.unique(y_tr)) == set(range(5))
    fit_dir = str(tmp_path / "h5fit")
    rc = cli.main(["simca", "--data", out, "--n-components", "4",
                   "--quiet", "--out-dir", fit_dir])
    assert rc == 0
    assert "sensitivity" in _load_json(fit_dir, "metrics.json")["0"]


def test_stream_update_fit_screen(tiny_npz, tmp_path):
    """Two-chunk streamed calibration == fit_simca_moments on the full
    stream; the stream-fit run dir serves through screen."""
    mom_path = str(tmp_path / "state.msgpack")
    # chunk 1: train split, chunk 2: test split (same class filter)
    for split in ("train", "test"):
        rc = cli.main(["stream-update", "--data", tiny_npz,
                       "--moments", mom_path, "--split", split,
                       "--target-class", "0"])
        assert rc == 0

    fit_dir = str(tmp_path / "sfit")
    rc = cli.main(["stream-fit", "--moments", mom_path,
                   "--n-components", "5", "--out-dir", fit_dir])
    assert rc == 0
    meta = _load_json(fit_dir, cli.SIMCA_META_JSON)
    assert meta["streaming"] and meta["class_labels"] == [0]

    # parity with the direct API on the concatenated stream
    from ocm_tpu.models.simca import load_simca_model
    from ocm_tpu.models.streaming import fit_simca_moments, moments_from

    z = np.load(tiny_npz)
    x_all = np.concatenate([z["x_train"][z["y_train"] == 0],
                            z["x_test"][z["y_test"] == 0]])
    direct = fit_simca_moments(moments_from(jnp.asarray(x_all)), 5)
    loaded = load_simca_model(os.path.join(fit_dir, cli.SIMCA_MODEL_FILE))
    np.testing.assert_allclose(np.asarray(loaded.mean),
                               np.asarray(direct.mean), rtol=1e-5)
    np.testing.assert_allclose(float(loaded.d_limit),
                               float(direct.d_limit), rtol=1e-5)

    screen_dir = str(tmp_path / "sscreen")
    rc = cli.main(["screen", "--data", tiny_npz, "--model-dir", fit_dir,
                   "--out-dir", screen_dir])
    assert rc == 0
    metrics = _load_json(screen_dir, "metrics.json")
    assert metrics["0"]["sensitivity"] > 80.0


def test_stream_stacked_classes(tiny_npz, tmp_path):
    mom_path = str(tmp_path / "stacked.msgpack")
    rc = cli.main(["stream-update", "--data", tiny_npz,
                   "--moments", mom_path, "--class-labels", "0,1,2"])
    assert rc == 0
    # meta mismatch on a later chunk is rejected
    with pytest.raises(SystemExit):
        cli.main(["stream-update", "--data", tiny_npz,
                  "--moments", mom_path, "--class-labels", "0,1"])
    rc = cli.main(["stream-update", "--data", tiny_npz,
                   "--moments", mom_path, "--split", "test"])
    assert rc == 0

    fit_dir = str(tmp_path / "stfit")
    rc = cli.main(["stream-fit", "--moments", mom_path, "--solver",
                   "rsvd", "--n-components", "5", "--out-dir", fit_dir])
    assert rc == 0
    meta = _load_json(fit_dir, cli.SIMCA_META_JSON)
    assert meta["stacked"] and meta["class_labels"] == [0, 1, 2]

    screen_dir = str(tmp_path / "stscreen")
    rc = cli.main(["screen", "--data", tiny_npz, "--model-dir", fit_dir,
                   "--out-dir", screen_dir])
    assert rc == 0
    preds = np.load(os.path.join(screen_dir, "predictions.npz"))
    assert preds["accept"].shape[1] == 3


def test_remove_outliers_flag(tiny_npz, tmp_path):
    """--remove-outliers drops the injected extreme spectra per class
    (simca_nuts.py:127-150 protocol) before fitting."""
    z = np.load(tiny_npz)
    x_tr = np.array(z["x_train"])
    y_tr = np.asarray(z["y_train"])
    idx0 = np.where(y_tr == 0)[0][:2]
    x_tr[idx0] += 40.0  # gross outliers in the target class
    poisoned = tmp_path / "poisoned.npz"
    np.savez(poisoned, x_train=x_tr, y_train=y_tr,
             x_test=z["x_test"], y_test=z["y_test"])

    args = cli.build_parser().parse_args(
        ["simca", "--data", str(poisoned), "--remove-outliers",
         "--out-dir", str(tmp_path / "o")])
    x_kept, y_kept = cli._remove_outliers(args, x_tr, y_tr)
    assert len(x_kept) < len(x_tr)
    kept0 = set(np.where(y_kept == 0)[0])
    # the injected rows are gone (indices shift, so compare by content)
    for i in idx0:
        assert not any(np.array_equal(x_tr[i], r) for r in x_kept)

    rc = cli.main(["simca", "--data", str(poisoned), "--remove-outliers",
                   "--n-components", "5", "--quiet",
                   "--out-dir", str(tmp_path / "fit_clean")])
    assert rc == 0
    m = _load_json(str(tmp_path / "fit_clean"), "metrics.json")
    assert m["0"]["sensitivity"] > 80.0


def test_plsda_cli(tiny_npz, tmp_path):
    out = str(tmp_path / "plsda")
    rc = cli.main(["plsda", "--data", tiny_npz, "--max-components", "6",
                   "--n-folds", "3", "--plots", "--out-dir", out])
    assert rc == 0
    cv = _load_json(out, "cv.json")
    assert 1 <= cv["best_n_components"] <= 6
    assert len(cv["f1_cv"]) == 6
    metrics = _load_json(out, "metrics.json")
    assert metrics["f1_test"] > 0.9  # well-separated synthetic classes
    assert np.asarray(metrics["confusion"]).shape == (3, 3)
    assert os.path.exists(os.path.join(out, "plsda_f1.png"))


def test_no_prefix_abbreviation():
    """`--out` must error against --out-dir (and any other prefix), not
    silently bind — allow_abbrev=False on every parser (round-3 verdict:
    the ambiguity was reproduced live)."""
    p = cli.build_parser()
    for argv in (["simca", "--out", "x"],
                 ["cv", "--lv", "3"],
                 ["train-vae", "--epoch", "2"],
                 ["screen", "--model", "m", "--model-dir", "d"]):
        with pytest.raises(SystemExit):
            p.parse_args(argv)


def test_platform_accepted_after_subcommand():
    p = cli.build_parser()
    assert p.parse_args(["simca", "--platform", "cpu"]).platform == "cpu"
    assert p.parse_args(["--platform", "cpu", "simca"]).platform == "cpu"
    # the sub-level SUPPRESS default must not clobber a top-level value
    assert p.parse_args(["--platform", "cpu", "screen", "--model-dir",
                         "m"]).platform == "cpu"
    # explicit sub-level value wins over the top-level one
    assert p.parse_args(["--platform", "tpu", "simca", "--platform",
                         "cpu"]).platform == "cpu"
    assert p.parse_args(["simca"]).platform is None


def test_cv_refit_composes_with_screen(tiny_npz, tmp_path):
    """cv --refit writes a servable model dir: screen must run against it
    and agree with the direct API at the chosen LV."""
    cv_dir = str(tmp_path / "cvfit")
    rc = cli.main(["cv", "--data", tiny_npz, "--lv-min", "2", "--lv-max",
                   "3", "--n-splits", "3", "--refit", "--out-dir", cv_dir])
    assert rc == 0
    screen_dir = str(tmp_path / "cvscreen")
    rc = cli.main(["screen", "--data", tiny_npz, "--model-dir", cv_dir,
                   "--out-dir", screen_dir])
    assert rc == 0
    preds = np.load(os.path.join(screen_dir, "predictions.npz"))
    z = np.load(tiny_npz)
    assert len(preds["accept"]) == len(z["x_test"])

    from ocm_tpu.models.simca import load_simca_model, simca_decide

    model = load_simca_model(os.path.join(cv_dir, cli.SIMCA_MODEL_FILE))
    accept, _, _, _ = simca_decide(model, jnp.asarray(z["x_test"]), "alt")
    np.testing.assert_array_equal(np.asarray(accept),
                                  preds["accept"].astype(bool))


def test_screen_error_surfaces(tiny_npz, tmp_path):
    # missing model dir -> clean SystemExit, not a traceback
    with pytest.raises(SystemExit):
        cli.main(["screen", "--data", tiny_npz,
                  "--model-dir", str(tmp_path / "nope"),
                  "--out-dir", str(tmp_path / "s")])
    # a model dir with no model artifact -> clean SystemExit
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit):
        cli.main(["screen", "--data", tiny_npz, "--model-dir", str(empty),
                  "--out-dir", str(tmp_path / "s2")])


def test_hpo_tpe_tiny(tiny_npz, tmp_path):
    out = str(tmp_path / "hpo")
    space = tmp_path / "space.json"
    space.write_text(json.dumps({
        "latent_dim": ["int", 3, 6],
        "lr": ["loguniform", 1e-4, 1e-2],
    }))
    rc = cli.main(["hpo", "--data", tiny_npz, "--algo", "tpe",
                   "--n-trials", "2", "--max-epochs", "2",
                   "--space", str(space), "--quiet", "--out-dir", out])
    assert rc == 0
    params = _load_json(out, "params.json")
    assert 3 <= params["best_config"]["latent_dim"] <= 6
    trials = _load_json(out, "trials.json")
    assert len(trials["history"]) == 2
    assert os.path.exists(os.path.join(out, cli.BUNDLE_FILE))

    # an hpo run dir composes with screen (best-trial bundle is servable)
    screen_dir = str(tmp_path / "hposcreen")
    rc = cli.main(["screen", "--data", tiny_npz, "--model-dir", out,
                   "--variant", "d2", "--out-dir", screen_dir])
    assert rc == 0
    preds = np.load(os.path.join(screen_dir, "predictions.npz"))
    z = np.load(tiny_npz)
    assert len(preds["accept"]) == len(z["x_test"])
