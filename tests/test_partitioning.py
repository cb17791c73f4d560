"""Partitioning assertions for every ``ocm_tpu.parallel`` entry point.

The numerical sharded-vs-local parity tests (tests/test_parallel.py)
cannot catch a GSPMD regression that silently replicates — a program
that all-gathers the batch and computes everything on every chip still
produces identical numbers.  These tests inspect the COMPILED
(post-partitioning) HLO on the virtual 8-device mesh and assert the
properties the sharding design (SURVEY.md 5.8) is supposed to produce:

- the expected collectives exist (psum -> all-reduce, gathers of the
  per-sample train statistics -> all-gather);
- embarrassingly-parallel axes compile to ZERO collectives;
- ENTRY parameters carry PER-SHARD shapes (1/n of the global), i.e. the
  data was actually partitioned, not replicated.

Forcing replication (P() specs, dropped in_shardings) flips both the
shape and the collective assertions, so the regression fails loudly.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocm_tpu.parallel.mesh import make_mesh


def entry_params(txt: str) -> str:
    """The ENTRY computation's parameter list of an HLO module text —
    where per-shard operand shapes are visible."""
    m = re.search(r"ENTRY [^(]*\(([^)]*)\)", txt)
    assert m, "no ENTRY computation found in HLO text"
    return m.group(1)


@pytest.fixture(scope="module")
def mesh1d():
    return make_mesh((8,), ("data",))


@pytest.fixture(scope="module")
def mesh_model():
    return make_mesh((8,), ("model",))


def _cls_data(n=16, length=12, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, length)
    x = (rng.normal(1, 0.08, (n, 1)) * np.sin(2 * np.pi * 3 * t)
         + rng.normal(0, 0.02, (n, length))).astype(np.float32)
    return x


def test_fit_simca_sharded_partitions_and_reduces(mesh1d):
    """The sharded fit: sample axis split 8 ways (per-shard (2, 12)
    operands), covariance/score-covariance accumulated with psum
    (all-reduce), per-sample train statistics gathered for the limit
    engines (all-gather).  The FULL (16, 12) batch must never appear —
    that would mean the partitioner replicated the data."""
    from ocm_tpu.parallel.simca_dist import fit_simca_sharded

    x = jnp.asarray(_cls_data())
    w = jnp.ones(16, jnp.float32)
    txt = (jax.jit(lambda a, b: fit_simca_sharded(a, b, 3, mesh1d))
           .lower(x, w).compile().as_text())
    assert txt.count("all-reduce") >= 1      # psum'd statistics
    assert txt.count("all-gather") >= 1      # gathered train T2/Q
    assert "f32[2,12]" in txt                # per-shard operand
    assert "f32[16,12]" not in txt           # no replicated full batch


def test_predict_sharded_is_collective_free(mesh1d):
    """Sharded scoring is embarrassingly parallel: per-shard spectra in
    the ENTRY signature, ZERO collectives (a collective here would mean
    the scoring path gathers the batch)."""
    from ocm_tpu.models.simca import fit_simca, simca_decide
    from ocm_tpu.parallel.mesh import batch_sharding, replicated

    model = fit_simca(jnp.asarray(_cls_data(24, 12)), 3)
    xs = jnp.asarray(_cls_data(16, 12, seed=1))
    # the exact jit predict_sharded builds (same shardings, same decide)
    import functools

    from ocm_tpu.parallel import simca_dist

    decide = functools.partial(simca_decide, decision_type="alt")
    fn = jax.jit(
        decide,
        in_shardings=(jax.tree.map(lambda _: replicated(mesh1d), model),
                      batch_sharding(mesh1d, "data")),
        out_shardings=batch_sharding(mesh1d, "data"))
    txt = fn.lower(model, xs).compile().as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "all-to-all"):
        assert txt.count(coll) == 0, f"unexpected {coll} in scoring path"
    assert "f32[2,12]" in entry_params(txt)
    assert "f32[16,12]" not in txt
    # and the production wrapper both runs and returns sharded outputs
    accept, dred, t2, q = simca_dist.predict_sharded(model, xs, mesh1d)
    assert {d.id for d in dred.sharding.device_set} == set(range(8))
    assert not dred.sharding.is_fully_replicated


def test_moments_ingest_partitions_batch(mesh1d):
    """Streaming ingest: batch sharded 8 ways, the three psums (count,
    mean, (L, L) scatter) appear as all-reduce, and cross-chip traffic
    is O(L^2) — the (16, 12) batch itself must not be gathered or
    replicated."""
    from ocm_tpu.models.streaming import moments_init
    from ocm_tpu.parallel.simca_dist import _moments_ingest_jit

    mom = moments_init(12, dtype=jnp.float64)
    x = jnp.asarray(_cls_data(), jnp.float64)
    w = jnp.ones(16, jnp.float64)
    run = _moments_ingest_jit(mesh1d, "data")
    txt = run.lower(mom, x, w).compile().as_text()
    assert txt.count("all-reduce") >= 1
    assert "f64[2,12]" in entry_params(txt)
    assert "f64[16,12]" not in txt


def test_cv_sweep_sharded_fold_axis_partitioned(mesh_model):
    """1-D CV sweep: the fold axis is the sharded axis — each chip holds
    1/8 of the (padded) fold masks; fold fits are independent, so the
    compiled program has NO collectives."""
    from ocm_tpu.parallel.simca_dist import cv_sweep_sharded

    x = _cls_data(20, 12)
    y = np.array([0] * 10 + [1] * 10)
    sink = []
    out = cv_sweep_sharded(x, y, 0, [2, 3], mesh_model, n_splits=5,
                           hlo_sink=sink)
    assert np.isfinite(out["spec"]).all()
    (txt,) = sink
    params = entry_params(txt)
    # 5 folds pad to 8 -> one (1, 20) mask pair per chip.  (This is a
    # GSPMD-partitioned path, not shard_map — the partitioner is free to
    # insert small collectives of its choosing, so the load-bearing
    # assertion is the per-shard ENTRY shape, which forced replication
    # would flip to (8, 20).)
    assert "pred[1,20]" in params
    assert "pred[8,20]" not in params


def test_cv_sweep_sharded_multiclass_unit_axis_partitioned(mesh_model):
    """Multi-class CV sweep: the flattened (class x fold) axis shards —
    2 classes x 4 folds = 8 units, one per chip; zero collectives."""
    from ocm_tpu.parallel.simca_dist import cv_sweep_sharded_multiclass

    x = _cls_data(20, 12)
    y = np.array([0] * 10 + [1] * 10)
    sink = []
    out = cv_sweep_sharded_multiclass(x, y, [0, 1], [2, 3], mesh_model,
                                      n_splits=4, hlo_sink=sink)
    assert np.isfinite(np.asarray(out["spec"])).all()
    (txt,) = sink
    params = entry_params(txt)
    # GSPMD path — per-shard ENTRY shapes are the partitioning proof
    # (see the fold-axis test above)
    assert "pred[1,20]" in params
    assert "pred[8,20]" not in params


def test_cv_sweep_sharded_2d_both_axes_partitioned():
    """2-D mesh sweep: folds shard over the model axis AND samples over
    the data axis — per-shard x is (N/2, L), fold masks are (F/4, N/2),
    class statistics psum along the data axis, and per-sample train
    statistics all_gather for the order-statistic limits."""
    from ocm_tpu.parallel.simca_dist import cv_sweep_sharded_2d

    mesh = make_mesh((4, 2), ("model", "data"))
    x = _cls_data(20, 12)
    y = np.array([0] * 10 + [1] * 10)
    sink = []
    out = cv_sweep_sharded_2d(x, y, 0, [2, 3], mesh, n_splits=4,
                              hlo_sink=sink)
    assert np.isfinite(out["spec"]).all()
    (txt,) = sink
    params = entry_params(txt)
    assert "f32[10,12]" in params            # x: 20 samples / 2 data shards
    assert "f32[20,12]" not in params
    assert "pred[1,10]" in params            # masks: 4 folds / 4 chips
    # psum'd covariance/counts AND the train-statistic gathers (XLA's CPU
    # pipeline rewrites small all-gathers into pad+all-reduce, so both
    # appear as all-reduce here)
    assert txt.count("all-reduce") >= 1


def test_sharded_config_sweep_partitions_configs(mesh_model):
    """HPO config sweep: the config axis shards (24 configs -> 3 per
    chip in the ENTRY signature); per-config training is independent, so
    the epoch loop compiles with zero collectives."""
    from ocm_tpu.models.trainer import TrainConfig
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.parallel.sweep_dist import _sharded_sweep_jit
    from ocm_tpu.utils.sweep import sweep_prep

    model = ConvVAE1D(input_length=32, latent_dim=2, conv_blocks=2,
                      n_filters=4, hidden_fc=16)
    n_cfg = 24
    x_cal = _cls_data(16, 32)
    x_val = _cls_data(8, 32, seed=1)
    lrs = np.full(n_cfg, 1e-3, np.float32)
    (lrs, wds, betas, cfg_rngs, xc_std, xv_std, mean, std, cfg) = \
        sweep_prep(x_cal, x_val, lrs, np.zeros(n_cfg, np.float32),
                   np.full(n_cfg, 0.5, np.float32), 1, 8, "euclidean",
                   "std", 1, None, jax.random.key(0), None)
    run = _sharded_sweep_jit(model, cfg, cfg.batch_size, mesh_model,
                             "model")
    txt = run.lower(0, xc_std, xv_std, mean, std, lrs, wds, betas,
                    cfg_rngs).compile().as_text()
    params = entry_params(txt)
    assert "f32[3]" in params                # 24 configs / 8 chips
    assert f"f32[{n_cfg}]" not in params
    for coll in ("all-reduce", "all-gather", "collective-permute"):
        assert txt.count(coll) == 0, f"unexpected {coll} in config sweep"


def test_dp_train_step_partitions_batch_and_reduces_grads(mesh1d):
    """Data-parallel train step: batch sharded 8 ways in the ENTRY
    signature, gradients (and the cross-replica BN statistics) reduce
    with psum -> all-reduce; the full batch never appears."""
    import optax

    from ocm_tpu.models.trainer import TrainConfig
    from ocm_tpu.models.vae import ConvVAE1D, init_vae
    from ocm_tpu.parallel.train_dist import make_dp_train_step

    model = ConvVAE1D(input_length=32, latent_dim=2, conv_blocks=2,
                      n_filters=4, hidden_fc=16, bn_axis_name="data")
    cfg = TrainConfig(epochs=1, batch_size=16, lr=1e-3,
                      loss_type="euclidean")
    params, batch_stats = init_vae(model, jax.random.key(0))
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)
    xb = jnp.asarray(_cls_data(16, 32))
    step = make_dp_train_step(model, tx, cfg, mesh1d)
    txt = step.lower(params, batch_stats, opt_state, xb,
                     jax.random.key(1)).compile().as_text()
    assert txt.count("all-reduce") >= 1
    assert "f32[2,32]" in entry_params(txt)
    assert "f32[16,32]" not in entry_params(txt)
