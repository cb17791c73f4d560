"""SPMD tests on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8, the standard way to exercise
sharding without a TPU pod)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocm_tpu.models.cv import cv_simca_sweep
from ocm_tpu.models.simca import fit_simca_masked, simca_decide
from ocm_tpu.parallel.mesh import make_mesh, pad_to_multiple, shard_batch
from ocm_tpu.parallel.simca_dist import (cv_sweep_sharded,
                                         fit_simca_sharded, predict_sharded)

from oracles import make_class_spectra


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "tests need the virtual 8-device mesh"
    return make_mesh((8,), ("data",))


@pytest.fixture(scope="module")
def cls_data():
    rng = np.random.default_rng(21)
    x = make_class_spectra(rng, 120, 40)
    return x


def test_mesh_construction_errors():
    with pytest.raises(ValueError):
        make_mesh((3,), ("data",))          # 3 != 8 devices
    m = make_mesh((2, 4), ("data", "model"))
    assert m.shape["data"] == 2 and m.shape["model"] == 4


def test_shard_batch_divisibility(mesh, cls_data):
    with pytest.raises(ValueError):
        shard_batch(jnp.asarray(cls_data[:10]), mesh)
    padded, n_true = pad_to_multiple(cls_data[:10], 8)
    assert padded.shape[0] == 16 and n_true == 10
    np.testing.assert_array_equal(padded[10], padded[9])  # edge padding


def test_sharded_fit_matches_masked(mesh, cls_data):
    x, n_true = pad_to_multiple(cls_data, 8)
    w = (np.arange(x.shape[0]) < n_true).astype(np.float64)
    for dt, t2m, qm in [("alt", "Fdist", "jm"), ("dd", "chi2pom", "chi2pom"),
                        ("ci", "perc", "perc")]:
        m_dist = fit_simca_sharded(x, w, 5, mesh, decision_type=dt,
                                   t2_method=t2m, q_method=qm)
        m_ref = fit_simca_masked(jnp.asarray(x), jnp.asarray(w), 5,
                                 decision_type=dt, t2_method=t2m,
                                 q_method=qm)
        np.testing.assert_allclose(np.asarray(m_dist.mean),
                                   np.asarray(m_ref.mean), atol=1e-12)
        np.testing.assert_allclose(np.abs(np.asarray(m_dist.components)),
                                   np.abs(np.asarray(m_ref.components)),
                                   atol=1e-9)
        np.testing.assert_allclose(float(m_dist.t2_res.limit),
                                   float(m_ref.t2_res.limit), rtol=1e-9)
        np.testing.assert_allclose(float(m_dist.q_res.limit),
                                   float(m_ref.q_res.limit), rtol=1e-9)
        np.testing.assert_allclose(float(m_dist.d_limit),
                                   float(m_ref.d_limit), rtol=1e-9)


def test_sharded_predict_matches_local(mesh, cls_data):
    x, n_true = pad_to_multiple(cls_data, 8)
    w = (np.arange(x.shape[0]) < n_true).astype(np.float64)
    model = fit_simca_sharded(x, w, 5, mesh)
    rng = np.random.default_rng(3)
    x_new, _ = pad_to_multiple(make_class_spectra(rng, 60, 40,
                                                  center_shift=0.5), 8)
    acc_d, dred_d, t2_d, q_d = predict_sharded(model, x_new, mesh)
    acc_l, dred_l, t2_l, q_l = simca_decide(model, jnp.asarray(x_new), "alt")
    np.testing.assert_array_equal(np.asarray(acc_d), np.asarray(acc_l))
    np.testing.assert_allclose(np.asarray(dred_d), np.asarray(dred_l),
                               rtol=1e-9)


def test_cv_sweep_sharded_matches_local(cls_data):
    rng = np.random.default_rng(5)
    x_other = make_class_spectra(rng, 40, 40, center_shift=1.5)
    x = np.concatenate([cls_data, x_other])
    y = np.concatenate([np.zeros(len(cls_data)), np.ones(len(x_other))])
    mesh = make_mesh((8,), ("model",))
    lvs = [2, 4, 6]
    got = cv_sweep_sharded(x, y, 0, lvs, mesh, n_splits=8)
    want = cv_simca_sweep(x, y, 0, lvs, n_splits=8)
    np.testing.assert_allclose(got["spec"], want["spec"], atol=1e-8)
    np.testing.assert_allclose(got["sens"], want["sens"], atol=1e-8)


def test_cv_sweep_sharded_fold_padding(cls_data):
    """The reference's standard 5-fold protocol on an 8-chip model axis:
    folds auto-pad by repetition and the padded fits drop out of every
    aggregate — results identical to the single-chip sweep."""
    rng = np.random.default_rng(5)
    x_other = make_class_spectra(rng, 30, 40, center_shift=1.5)
    x = np.concatenate([cls_data, x_other])
    y = np.concatenate([np.zeros(len(cls_data)), np.ones(len(x_other))])
    mesh = make_mesh((8,), ("model",))
    got = cv_sweep_sharded(x, y, 0, [2, 4], mesh, n_splits=5)
    want = cv_simca_sweep(x, y, 0, [2, 4], n_splits=5)
    np.testing.assert_allclose(got["spec"], want["spec"], atol=1e-8)
    np.testing.assert_allclose(got["sens"], want["sens"], atol=1e-8)
    np.testing.assert_array_equal(got["pred"], want["pred"])


def test_dp_training_runs_and_learns(mesh):
    from ocm_tpu.models.trainer import TrainConfig
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.parallel.train_dist import train_vae_dp

    rng = np.random.default_rng(9)
    t = np.linspace(0, 1, 48)
    base = np.sin(2 * np.pi * 3 * t)
    mk = lambda n: (rng.normal(1, 0.05, (n, 1)) * base
                    + rng.normal(0, 0.02, (n, 48))).astype(np.float32)
    model = ConvVAE1D(input_length=48, latent_dim=4, conv_blocks=2,
                      n_filters=8, hidden_fc=32, bn_axis_name="data")
    cfg = TrainConfig(epochs=4, batch_size=32, lr=2e-3,
                      loss_type="euclidean")
    bundle, tl, vl, best_ep = train_vae_dp(model, mk(96), mk(32), cfg,
                                           jax.random.key(0), mesh)
    assert np.all(np.isfinite(tl)) and np.all(np.isfinite(vl))
    assert tl[-1] < tl[0]
    assert 0 <= best_ep < 4


def test_cv_sweep_2d_mesh_matches_local(cls_data):
    from ocm_tpu.parallel.simca_dist import cv_sweep_sharded_2d

    rng = np.random.default_rng(7)
    x_other = make_class_spectra(rng, 40, 40, center_shift=1.5)
    x = np.concatenate([cls_data, x_other])          # 160 rows
    y = np.concatenate([np.zeros(len(cls_data)), np.ones(len(x_other))])
    mesh2d = make_mesh((4, 2), ("model", "data"))
    lvs = [2, 4, 6]
    got = cv_sweep_sharded_2d(x, y, 0, lvs, mesh2d, n_splits=4)
    want = cv_simca_sweep(x, y, 0, lvs, n_splits=4)
    np.testing.assert_allclose(got["spec"], want["spec"], atol=1e-8)
    np.testing.assert_allclose(got["sens"], want["sens"], atol=1e-8)
    np.testing.assert_allclose(got["eff"], want["eff"], atol=1e-8)


def test_cv_sweep_2d_mesh_perc_limits(cls_data):
    """Order-statistic limits need the all_gather path — exercise it."""
    from ocm_tpu.parallel.simca_dist import cv_sweep_sharded_2d

    rng = np.random.default_rng(8)
    x_other = make_class_spectra(rng, 40, 40, center_shift=1.5)
    x = np.concatenate([cls_data, x_other])
    y = np.concatenate([np.zeros(len(cls_data)), np.ones(len(x_other))])
    mesh2d = make_mesh((2, 4), ("model", "data"))
    got = cv_sweep_sharded_2d(x, y, 0, [3, 5], mesh2d, n_splits=4,
                              t2_method="perc", q_method="perc")
    want = cv_simca_sweep(x, y, 0, [3, 5], n_splits=4, t2_method="perc",
                          q_method="perc")
    np.testing.assert_allclose(got["eff"], want["eff"], atol=1e-8)


def test_cv_sweep_2d_auto_padding(cls_data):
    from ocm_tpu.parallel.simca_dist import cv_sweep_sharded_2d

    y = np.zeros(len(cls_data))
    y[-30:] = 1
    mesh2d = make_mesh((4, 2), ("model", "data"))
    # fold axis auto-pads: 5 folds on a 4-chip model axis
    got = cv_sweep_sharded_2d(cls_data, y, 0, [2, 3], mesh2d, n_splits=5)
    want = cv_simca_sweep(cls_data, y, 0, [2, 3], n_splits=5)
    np.testing.assert_allclose(got["spec"], want["spec"], atol=1e-8)
    np.testing.assert_allclose(got["sens"], want["sens"], atol=1e-8)
    np.testing.assert_array_equal(got["pred"], want["pred"])
    # sample axis auto-pads: uneven N matches the local solve exactly
    got = cv_sweep_sharded_2d(cls_data[:119], y[:119], 0, [2, 4], mesh2d,
                              n_splits=4)
    want = cv_simca_sweep(cls_data[:119], y[:119], 0, [2, 4], n_splits=4)
    np.testing.assert_allclose(got["spec"], want["spec"], atol=1e-8)
    np.testing.assert_allclose(got["sens"], want["sens"], atol=1e-8)
    assert got["pred"].shape == want["pred"].shape


def test_sharded_fit_rsvd_matches_dense_rsvd(mesh, cls_data):
    """The psum-accumulated covariance + GEMM-only randomized fit equals
    the single-device rsvd fit: same covariance, same deterministic
    subspace iteration (fixed seed), so statistics agree to float
    tolerance."""
    from ocm_tpu.models.simca import fit_simca

    x, n_true = pad_to_multiple(cls_data, 8)
    w = (np.arange(x.shape[0]) < n_true).astype(np.float64)
    m_dist = fit_simca_sharded(x, w, 5, mesh, solver="rsvd")
    m_ref = fit_simca(jnp.asarray(cls_data), 5, solver="rsvd")
    np.testing.assert_allclose(np.asarray(m_dist.mean),
                               np.asarray(m_ref.mean), atol=1e-12)
    np.testing.assert_allclose(float(m_dist.t2_res.limit),
                               float(m_ref.t2_res.limit), rtol=1e-6)
    np.testing.assert_allclose(float(m_dist.q_res.limit),
                               float(m_ref.q_res.limit), rtol=1e-6)
    rng = np.random.default_rng(9)
    x_new = make_class_spectra(rng, 40, 40, center_shift=0.6)
    a_d, *_ = simca_decide(m_dist, jnp.asarray(x_new), "alt")
    a_r, *_ = simca_decide(m_ref, jnp.asarray(x_new), "alt")
    np.testing.assert_array_equal(np.asarray(a_d), np.asarray(a_r))


def test_cv_sweep_sharded_rsvd_matches_local_rsvd(cls_data):
    rng = np.random.default_rng(5)
    x_other = make_class_spectra(rng, 40, 40, center_shift=1.5)
    x = np.concatenate([cls_data, x_other])
    y = np.concatenate([np.zeros(len(cls_data)), np.ones(len(x_other))])
    mesh = make_mesh((8,), ("model",))
    lvs = [2, 4, 6]
    got = cv_sweep_sharded(x, y, 0, lvs, mesh, n_splits=8, solver="rsvd")
    want = cv_simca_sweep(x, y, 0, lvs, n_splits=8, solver="rsvd")
    np.testing.assert_allclose(got["spec"], want["spec"], atol=1e-8)
    np.testing.assert_allclose(got["sens"], want["sens"], atol=1e-8)


def test_cv_sweep_defaults_agree_everywhere():
    """Every CV path must carry IDENTICAL statistical defaults — round-2
    found cv_sweep_sharded silently fitting with subspace_iters=8 while
    every other path used 4.  Locks the shared keyword defaults of the
    local sweep, both sharded sweeps, and the masked/dense fits together."""
    import inspect

    from ocm_tpu.models.simca import fit_simca, fit_simca_masked
    from ocm_tpu.parallel.simca_dist import cv_sweep_sharded_2d

    fns = [cv_simca_sweep, cv_sweep_sharded, cv_sweep_sharded_2d,
           fit_simca, fit_simca_masked, fit_simca_sharded]
    shared = ["decision_type", "t2_method", "q_method", "t2_cl", "q_cl",
              "d_cl", "oversample", "subspace_iters"]
    defaults = {}
    for fn in fns:
        sig = inspect.signature(fn)
        for name in shared:
            if name not in sig.parameters:
                continue
            d = sig.parameters[name].default
            assert d is not inspect.Parameter.empty, (fn.__name__, name)
            defaults.setdefault(name, (fn.__name__, d))
            ref_fn, ref_d = defaults[name]
            assert d == ref_d, (f"{fn.__name__}.{name} defaults to {d!r} "
                                f"but {ref_fn}.{name} defaults to {ref_d!r}")


def test_cv_sweep_2d_rsvd_matches_local_rsvd(cls_data):
    from ocm_tpu.parallel.simca_dist import cv_sweep_sharded_2d

    rng = np.random.default_rng(7)
    x_other = make_class_spectra(rng, 40, 40, center_shift=1.5)
    x = np.concatenate([cls_data, x_other])
    y = np.concatenate([np.zeros(len(cls_data)), np.ones(len(x_other))])
    mesh = make_mesh((4, 2), ("model", "data"))
    lvs = [2, 4]
    got = cv_sweep_sharded_2d(x, y, 0, lvs, mesh, n_splits=4,
                              solver="rsvd")
    want = cv_simca_sweep(x, y, 0, lvs, n_splits=4, solver="rsvd")
    np.testing.assert_allclose(got["spec"], want["spec"], atol=1e-8)
    np.testing.assert_allclose(got["sens"], want["sens"], atol=1e-8)


def test_cv_sweep_sharded_multiclass(cls_data):
    """(class x fold) flattened onto the model axis: every class's sweep
    matches the local multi-class (and hence per-class) results, including
    when C*F does not divide the chip count (25 units on 8 chips)."""
    from ocm_tpu.models.cv import cv_simca_sweep_multiclass
    from ocm_tpu.parallel.simca_dist import cv_sweep_sharded_multiclass

    rng = np.random.default_rng(23)
    x_b = make_class_spectra(rng, 50, 40, center_shift=1.2)
    x_c = make_class_spectra(rng, 42, 40, center_shift=2.4)
    x = np.concatenate([cls_data, x_b, x_c])
    y = np.concatenate([np.zeros(len(cls_data)), np.ones(len(x_b)),
                        np.full(len(x_c), 2)])
    mesh = make_mesh((8,), ("model",))
    lvs = [2, 4]
    for solver in ("eigh", "rsvd"):
        got = cv_sweep_sharded_multiclass(x, y, [0, 1, 2], lvs, mesh,
                                          n_splits=5, solver=solver)
        want = cv_simca_sweep_multiclass(x, y, [0, 1, 2], lvs, n_splits=5,
                                         solver=solver)
        np.testing.assert_allclose(got["spec"], want["spec"], atol=1e-8)
        np.testing.assert_allclose(got["sens"], want["sens"], atol=1e-8)
        np.testing.assert_array_equal(got["pred"], want["pred"])


def test_sharded_config_sweep_matches_local():
    """The config-sharded sweep trainer (5 configs auto-padded onto the
    8-chip model axis) reproduces the local vmapped trainer's per-config
    trajectories: the SAME vmapped_train_body runs, only the config axis
    is partitioned, so losses match to fp tolerance (partitioned vs full
    vmap width reassociates f32 sums at the ulp level)."""
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.parallel.sweep_dist import train_vae_vmapped_sharded
    from ocm_tpu.utils.sweep import train_vae_vmapped

    rng = np.random.default_rng(31)
    t = np.linspace(0, 1, 40)
    mk = lambda n: (rng.normal(1, 0.06, (n, 1)) * np.sin(2 * np.pi * 3 * t)
                    + rng.normal(0, 0.02, (n, 40))).astype(np.float32)
    x_cal, x_val = mk(64), mk(24)
    model = ConvVAE1D(input_length=40, latent_dim=4, conv_blocks=2,
                      n_filters=8, hidden_fc=32)
    lrs = np.asarray([3e-4, 1e-3, 2e-3, 5e-3, 1e-2], np.float32)
    wds = np.zeros(5, np.float32)
    betas = np.full(5, 0.5, np.float32)
    mesh = make_mesh((8,), ("model",))
    key = jax.random.key(7)

    got = train_vae_vmapped_sharded(model, x_cal, x_val, lrs, wds, betas,
                                    mesh, epochs=3, batch_size=32,
                                    loss_type="euclidean", rng=key)
    want = train_vae_vmapped(model, x_cal, x_val, lrs, wds, betas,
                             epochs=3, batch_size=32,
                             loss_type="euclidean", rng=key)
    assert np.asarray(got.val_losses).shape == (5, 3)
    # tracking, not bitwise: each shard vmaps a NARROWER config slice than
    # the local full-width vmap, so f32 sums reassociate and Adam's g/|g|
    # amplifies the ulp differences to lr scale over epochs (the same
    # documented contract as vmapped-vs-sequential in utils/sweep.py) —
    # trajectories track at the 1e-2 level after 3 Adam epochs
    np.testing.assert_allclose(np.asarray(got.train_losses),
                               np.asarray(want.train_losses), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(got.val_losses),
                               np.asarray(want.val_losses), rtol=1e-2)
    # before Adam amplification compounds (first epoch), tracking is tight
    np.testing.assert_allclose(np.asarray(got.train_losses)[:, 0],
                               np.asarray(want.train_losses)[:, 0],
                               rtol=2e-3)
    with pytest.raises(ValueError, match="share their length"):
        train_vae_vmapped_sharded(model, x_cal, x_val, lrs, wds[:2], betas,
                                  mesh, epochs=1, batch_size=32,
                                  loss_type="euclidean", rng=key)


def test_asha_with_mesh_shards_fresh_rungs():
    """asha_vae_search(mesh=...) runs rung 0 through the config-sharded
    trainer and the rest through resume — end result structurally
    identical to the local search and the winner's objective finite."""
    from ocm_tpu.utils.sweep import asha_vae_search

    rng = np.random.default_rng(33)
    t = np.linspace(0, 1, 40)
    mk = lambda n: (rng.normal(1, 0.06, (n, 1)) * np.sin(2 * np.pi * 3 * t)
                    + rng.normal(0, 0.02, (n, 40))).astype(np.float32)
    x_cal, x_val = mk(64), mk(24)
    space = {"lr": ("loguniform", 1e-4, 1e-2)}
    base = {"latent_dim": 4, "conv_blocks": 1, "n_filters": 4,
            "kernel_size": 5, "hidden_fc": 16, "batch_size": 32,
            "loss_type": "euclidean"}
    mesh = make_mesh((8,), ("model",))
    out = asha_vae_search(x_cal, x_val, space, n_trials=4, max_epochs=4,
                          reduction=2, seed=5, base_config=base,
                          mesh=mesh, verbose=False)
    assert np.isfinite(out["best_value"])
    assert out["best_bundle"] is not None
    assert len(out["trials"]) == 4
    # halving actually happened (some budget saved vs full fidelity)
    assert out["total_epochs"] < 4 * 4


def test_cyclic_pad_helper():
    """cyclic_pad: leading-axis repetition, type preservation (np stays
    host-side, jnp/PRNG-key arrays stay jnp), zero-pad passthrough."""
    from ocm_tpu.parallel.mesh import cyclic_pad

    a = np.arange(10).reshape(5, 2)
    b = jnp.arange(5.0)
    k = jax.random.split(jax.random.key(0), 5)
    (pa, pb, pk), pad = cyclic_pad((a, b, k), 8)
    assert pad == 3
    assert isinstance(pa, np.ndarray) and pa.shape == (8, 2)
    np.testing.assert_array_equal(pa[5:], a[:3])
    assert isinstance(pb, jax.Array) and pb.shape == (8,)
    np.testing.assert_array_equal(np.asarray(pb[5:]), np.asarray(b[:3]))
    assert pk.shape == (8,) and jnp.issubdtype(pk.dtype, jax.dtypes.prng_key)
    same, pad0 = cyclic_pad((a,), 5)
    assert pad0 == 0 and same[0] is a


def test_sharded_config_sweep_rejects_missing_model_axis():
    """A mesh without the model axis fails fast with a named error, not a
    KeyError deep inside the shard_map."""
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.parallel.sweep_dist import train_vae_vmapped_sharded

    model = ConvVAE1D(input_length=40, latent_dim=4, conv_blocks=1,
                      n_filters=4, hidden_fc=16)
    x = np.zeros((32, 40), np.float32)
    data_mesh = make_mesh((8,), ("data",))
    with pytest.raises(ValueError, match="no axis 'model'"):
        train_vae_vmapped_sharded(model, x, x, [1e-3], [0.0], [1.0],
                                  data_mesh, epochs=1, batch_size=16,
                                  loss_type="euclidean",
                                  rng=jax.random.key(0))


def test_cv_sweep_sharded_gram_side_long_spectra():
    """N < L data: the 1-D sharded sweep auto-picks the SAME gram-side
    fold solve as the local sweep (x is replicated on the model axis, so
    the decomposition side matches by construction) — aggregates equal.
    The 2-D data-sharded path is cov-side by construction (psum'd (L, L)
    covariance) and keeps its own parity tests on N > L data."""
    rng = np.random.default_rng(29)
    x = np.concatenate([
        make_class_spectra(rng, 36, 100),
        make_class_spectra(rng, 24, 100, center_shift=0.8),
    ]).astype(np.float64)
    y = np.repeat([0, 1], [36, 24])
    mesh = make_mesh((8,), ("model",))
    kw = dict(lv_values=range(1, 5), n_splits=4)
    local = cv_simca_sweep(x, y, 0, **kw)
    shard = cv_sweep_sharded(x, y, 0, mesh=mesh, **kw)
    np.testing.assert_allclose(shard["sens"], local["sens"], atol=1e-8)
    np.testing.assert_allclose(shard["spec"], local["spec"], atol=1e-8)


def test_sharded_classes_trainer_matches_local():
    """train_vae_classes_sharded: 3 per-class VAEs (unequal class sizes)
    auto-padded onto the 8-chip model axis reproduce the local vmapped
    train_vae_classes trajectories — the SAME classes_train_body runs,
    only the class axis is partitioned, so losses match to the fp
    tracking tolerance (narrower per-shard vmap width reassociates f32;
    the train_vae_vmapped_sharded contract)."""
    from ocm_tpu.models.trainer import TrainConfig
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.parallel.sweep_dist import train_vae_classes_sharded
    from ocm_tpu.utils.sweep import train_vae_classes

    rng = np.random.default_rng(37)
    t = np.linspace(0, 1, 40)
    mk = lambda n, c: (rng.normal(1, .06, (n, 1))
                       * np.sin(2 * np.pi * (3 + c) * t)
                       + rng.normal(0, .02, (n, 40))).astype(np.float32)
    x_cals = [mk(64, 0), mk(48, 1), mk(56, 2)]   # unequal: cyclic pad
    x_vals = [mk(16, 0), mk(16, 1), mk(16, 2)]
    model = ConvVAE1D(input_length=40, latent_dim=4, conv_blocks=2,
                      n_filters=8, hidden_fc=32)
    cfg = TrainConfig(epochs=3, batch_size=32, loss_type="euclidean")
    mesh = make_mesh((8,), ("model",))
    key = jax.random.key(5)

    got = train_vae_classes_sharded(model, x_cals, x_vals, cfg, mesh, key)
    want = train_vae_classes(model, x_cals, x_vals, cfg, key)
    assert np.asarray(got.val_losses).shape == (3, 3)
    np.testing.assert_allclose(np.asarray(got.train_losses),
                               np.asarray(want.train_losses), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(got.val_losses),
                               np.asarray(want.val_losses), rtol=1e-2)
    # stacked-bundle layout: leading class axis on every leaf, directly
    # consumable by the multi-class VAEScorer
    assert np.asarray(got.bundle.spec_mean).shape[0] == 3
    with pytest.raises(ValueError, match="no axis"):
        train_vae_classes_sharded(model, x_cals, x_vals, cfg,
                                  make_mesh((8,), ("data",)), key)
