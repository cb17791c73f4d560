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
  data was actually partitioned, not replicated;
- collective BUDGETS hold (round-5): each entry point has an upper
  bound on all-reduce ROUNDS (instruction count — an extra dependent
  psum adds a latency round) and on all-reduce PAYLOAD bytes (XLA's
  combiner merges independent psums into one tuple all-reduce, so an
  accidental extra reduction can hide from the count — it cannot hide
  from the payload).  Budgets are the measured values of the current
  design, each annotated with the closed-form it realizes (see
  docs/DESIGN.md "communication volume" table); exceeding one means a
  new collective or a bigger payload snuck in.

Forcing replication (P() specs, dropped in_shardings) flips both the
shape and the collective assertions, so the regression fails loudly;
test_extra_psum_trips_budget demonstrates the budget tripping on a
deliberately polluted twin of the streaming-ingest body.
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


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "s32": 4, "u64": 8, "u32": 4, "s8": 1, "u8": 1, "pred": 1}


def collective_rounds(txt: str, op: str) -> int:
    """Number of ``op`` INSTRUCTIONS in the HLO text (definitions, not
    name references): each is one collective round of latency.  Matches
    the opcode token itself so tuple-typed (combiner-merged) collectives
    count once; async ``-start``/``-done`` pairs count once."""
    return len(re.findall(r"\b" + op + r"(?:-start)?\(", txt))


def allreduce_payload_bytes(txt: str) -> int:
    """Total bytes carried by all all-reduce instructions (per replica):
    the sum over instruction RESULT types, tuple elements included.
    This is what an accidental extra psum cannot hide from — XLA's
    all-reduce combiner can merge it into an existing round, but the
    merged tuple's payload grows by exactly the smuggled bytes."""
    total = 0
    for line in txt.splitlines():
        m = re.search(r"= (.*?) all-reduce(?:-start)?\(", line)
        if not m:
            continue
        for t in re.finditer(r"(f64|f32|bf16|f16|s64|s32|u64|u32|s8|u8|"
                             r"pred)\[([0-9,]*)\]", m.group(1)):
            dt, dims = t.groups()
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES[dt]
    return total


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
    # budget (round 5): 4 all-reduce rounds carrying exactly the fit
    # statistics — (mean+count) tuple, the (L, L) scatter, and the two
    # score-space moment reductions — and 3 all-gathers of per-sample
    # train statistics.  Payload = 4*(L^2 + L + 1 + k^2 + k) = 676 B at
    # (L=12, k=3); one extra psum'd scalar would read 680.
    assert collective_rounds(txt, "all-reduce") <= 4
    assert collective_rounds(txt, "all-gather") <= 3
    assert allreduce_payload_bytes(txt) <= 676


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
    # budget (round 5): the design's three psums (count, weighted sum,
    # (L, L) scatter) compile to <= 2 rounds (count+mean combine; the
    # scatter depends on the mean, so it is a second round) carrying
    # EXACTLY 8*(L^2 + L + 1) = 1256 B at L=12 f64 — any extra reduced
    # byte is a smuggled collective (see test_extra_psum_trips_budget).
    assert collective_rounds(txt, "all-reduce") <= 2
    assert allreduce_payload_bytes(txt) <= 8 * (12 * 12 + 12 + 1)


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
    # budget (round 5): fold fits are independent — the partitioner's
    # only collectives are two scalar pred[] bookkeeping all-reduces
    # (2 B total).  A psum'd statistic appearing here means the fold
    # axis stopped being embarrassingly parallel.
    assert collective_rounds(txt, "all-reduce") <= 2
    assert collective_rounds(txt, "all-gather") == 0
    assert allreduce_payload_bytes(txt) <= 2


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
    # budget (round 5): same independence argument as the fold axis
    assert collective_rounds(txt, "all-reduce") <= 2
    assert collective_rounds(txt, "all-gather") == 0
    assert allreduce_payload_bytes(txt) <= 2


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
    # budget (round 5): per data-axis step, each model-axis chip reduces
    # its local folds' (count, mean) tuple and (F/4, L, L) scatter (two
    # rounds) plus one s64 index-bookkeeping round: 3 rounds,
    # 4*(F/4)*(L^2+L+1) + 64 = 692 B at (F=4, L=12).
    assert collective_rounds(txt, "all-reduce") <= 3
    assert allreduce_payload_bytes(txt) <= 692


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
    # budget (round 5): the payload is the gradient pytree plus the
    # cross-replica BN statistics and the scalar loss — 4*n_param
    # (= 20,708 B here) + ~320 B of BN moments/counts, combiner-merged
    # into <= 9 rounds.  A second gradient reduction (e.g. an accidental
    # psum inside the loss) doubles the payload and fails loudly.
    n_param = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert collective_rounds(txt, "all-reduce") <= 9
    assert allreduce_payload_bytes(txt) <= 4 * n_param + 400


def test_extra_psum_trips_budget(mesh1d):
    """The budget assertions must actually catch pollution.  This
    compiles a deliberately polluted twin of the streaming-ingest body
    (ocm_tpu.parallel.simca_dist._moments_ingest_jit) — same specs, same
    statistics, plus ONE extra psum — and asserts the SAME budget the
    production test pins (<= 2 rounds, <= 8*(L^2+L+1) payload bytes) is
    exceeded, in both of the ways an accident can happen:

    - a DEPENDENT extra psum (re-reducing a psum'd quantity) adds a
      latency round — caught by ``collective_rounds``;
    - an INDEPENDENT extra psum gets merged by XLA's all-reduce combiner
      into an existing round (the count does NOT move — measured) — but
      the merged tuple's payload grows by the smuggled bytes, caught by
      ``allreduce_payload_bytes``.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ocm_tpu.models.streaming import SpectraMoments, moments_init

    L = 12
    budget_rounds, budget_bytes = 2, 8 * (L * L + L + 1)
    mom = moments_init(L, dtype=jnp.float64)
    x = jnp.asarray(_cls_data(), jnp.float64)
    w = jnp.ones(16, jnp.float64)

    def ingest(mom_r, x_loc, w_loc, extra):
        nb = jax.lax.psum(jnp.sum(w_loc), "data")
        safe_nb = jnp.where(nb > 0, nb, 1.0)
        mu_b = jax.lax.psum(
            jnp.sum(w_loc[:, None] * x_loc, axis=0), "data") / safe_nb
        xc = (x_loc - mu_b[None, :]) * jnp.sqrt(w_loc)[:, None]
        scatter_b = jax.lax.psum(xc.T @ xc, "data")
        if extra == "dependent":     # re-reduce a reduced quantity
            scatter_b = jax.lax.psum(scatter_b, "data") / 8.0
        elif extra == "independent":  # smuggle one more reduced vector
            mu_b = mu_b + 0.5 * jax.lax.psum((x_loc ** 2).sum(0), "data")
        return SpectraMoments(mom_r.n + nb, mu_b, scatter_b)

    def compile_twin(extra):
        rep = SpectraMoments(P(), P(), P())
        fn = jax.jit(shard_map(
            lambda m, a, b: ingest(m, a, b, extra), mesh=mesh1d,
            in_specs=(rep, P("data"), P("data")), out_specs=rep,
            check_vma=False))
        return fn.lower(mom, x, w).compile().as_text()

    clean = compile_twin("none")
    assert collective_rounds(clean, "all-reduce") <= budget_rounds
    assert allreduce_payload_bytes(clean) <= budget_bytes

    dep = compile_twin("dependent")
    assert collective_rounds(dep, "all-reduce") > budget_rounds

    indep = compile_twin("independent")
    # the combiner hides the extra ROUND ...
    assert collective_rounds(indep, "all-reduce") <= budget_rounds + 1
    # ... but not the extra PAYLOAD
    assert allreduce_payload_bytes(indep) > budget_bytes
