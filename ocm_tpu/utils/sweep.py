"""Hyperparameter sweeps: grid runner, vmapped same-shape batches, HPO hook.

The reference sweeps hyperparameters with sequential host for-loops over
``itertools.product`` grids — e.g. 96 configs x 3000 epochs at
``VAE_SIMCA.py:436-470``, grids at ``utils/final_vaesimca.py:267-301`` and
``vae_bce_nut.py:106-124`` — and Optuna TPE search in ``optim_bce_nuts.py``.
Each run writes ``params.json`` / ``losses.json`` / ``metrics.json`` into its
own directory plus global ``all_params.json`` / ``all_metrics.json``
(``utils/final_vaesimca.py:316-322,449,593-604``).

TPU-first additions:

- ``run_vae_sweep`` persists per-run state and RESUMES: runs whose
  ``metrics.json`` already exists are skipped (the failure-recovery model of
  SURVEY.md section 5.3 — sweep-level restartability without distributed
  checkpointing).
- ``train_vae_vmapped`` trains ALL configs that share one architecture in a
  single jitted program: optimizer hyperparameters (lr, weight decay, beta)
  are traced scalars closed over by the optax transforms, so the config
  axis is a plain vmap — one compile, C simultaneous training trajectories
  on one chip (BASELINE.json config 5).
- Optuna is optional (not installed here): ``optuna_objective`` builds the
  reference-equivalent objective lazily; ``random_search`` is the built-in
  dependency-free HPO fallback.
"""

from __future__ import annotations

import functools
import itertools
import os
from typing import Callable, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ocm_tpu.models.bundle import new_bundle, spectral_stats
from ocm_tpu.models.trainer import (TrainConfig, TrainResult, epoch_scan,
                                    make_eval_loss, make_train_step,
                                    torch_adam)
from ocm_tpu.models.vae import ConvVAE1D, init_vae
from ocm_tpu.utils.io import load_json, save_json


def grid_product(base: Mapping, grid: Mapping[str, Sequence]) -> list[dict]:
    """base params + cartesian grid (utils/final_vaesimca.py:296 pattern)."""
    keys = list(grid)
    out = []
    for values in itertools.product(*(grid[k] for k in keys)):
        out.append({**base, **dict(zip(keys, values))})
    return out


def run_vae_sweep(configs: Sequence[Mapping], x_cal, x_val, x_test, y_test,
                  out_dir: str,
                  evaluate: Optional[Callable] = None,
                  rng: Optional[jax.Array] = None,
                  verbose: bool = True) -> list[dict]:
    """Sequential sweep with per-run artifacts and resume.

    Each config dict holds architecture keys (latent_dim, conv_blocks,
    n_filters, kernel_size, hidden_fc, dropout, activation) and training
    keys (epochs, batch_size, lr, weight_decay, beta, loss_type).  For each
    run: train -> fit thresholds -> evaluate -> write artifacts.  Runs with
    an existing ``metrics.json`` are skipped (resume).
    """
    from ocm_tpu.models.vae_decision import decide_d2, fit_thresholds
    from ocm_tpu.stats.metrics import vae_binary_metrics

    if rng is None:
        rng = jax.random.key(42)
    results = []
    for i, cfg_dict in enumerate(configs):
        run_dir = os.path.join(out_dir, f"run_{i:04d}")
        metrics_path = os.path.join(run_dir, "metrics.json")
        if os.path.exists(metrics_path):
            if verbose:
                print(f"[sweep] run_{i:04d}: resume — already complete")
            results.append(load_json(run_dir, "metrics.json"))
            continue

        model = ConvVAE1D(
            input_length=np.asarray(x_cal).shape[1],
            latent_dim=int(cfg_dict.get("latent_dim", 16)),
            conv_blocks=int(cfg_dict.get("conv_blocks", 3)),
            n_filters=int(cfg_dict.get("n_filters", 32)),
            kernel_size=int(cfg_dict.get("kernel_size", 9)),
            hidden_fc=int(cfg_dict.get("hidden_fc", 256)),
            dropout=float(cfg_dict.get("dropout", 0.0)),
            activation=cfg_dict.get("activation", "elu"))
        tcfg = TrainConfig(
            epochs=int(cfg_dict.get("epochs", 100)),
            batch_size=int(cfg_dict.get("batch_size", 64)),
            lr=float(cfg_dict.get("lr", 1e-3)),
            weight_decay=float(cfg_dict.get("weight_decay", 0.0)),
            beta=float(cfg_dict.get("beta", 1.0)),
            loss_type=cfg_dict.get("loss_type", "cosine"))

        from ocm_tpu.models.trainer import train_vae

        result = train_vae(model, x_cal, x_val, tcfg,
                           jax.random.fold_in(rng, i))
        bundle = fit_thresholds(model, result.bundle, x_cal,
                                loss_type=tcfg.loss_type)
        save_json(dict(cfg_dict), run_dir, "params.json")
        from ocm_tpu.models.bundle import save_bundle

        # each run dir carries its deployable model, mirroring the
        # reference's per-run best-checkpoint save
        # (utils/final_vaesimca.py:445)
        save_bundle(os.path.join(run_dir, "model_bundle.msgpack"), bundle)
        save_json({"train_losses": np.asarray(result.train_losses),
                   "val_losses": np.asarray(result.val_losses),
                   "best_epoch": int(result.best_epoch)},
                  run_dir, "losses.json")

        if evaluate is not None:
            metrics = evaluate(model, bundle, x_test, y_test)
        else:
            dec = decide_d2(model, bundle, jnp.asarray(x_test))
            pred = np.where(np.asarray(dec.accept), 0, 1)
            n_true = int(np.max(y_test)) + 1
            m = vae_binary_metrics(jnp.asarray(pred), jnp.asarray(y_test),
                                   n_true)
            metrics = {"accuracy": float(m.accuracy),
                       "precision": float(m.precision),
                       "recall": float(m.recall), "f1": float(m.f1),
                       "mean_false_acceptance":
                           float(m.mean_false_acceptance)}
        metrics = {**metrics, "run": i,
                   "best_val_loss":
                       float(np.min(np.asarray(result.val_losses)))}
        save_json(metrics, run_dir, "metrics.json")
        results.append(metrics)
        if verbose:
            print(f"[sweep] run_{i:04d}: {metrics}")

    save_json([dict(c) for c in configs], out_dir, "all_params.json")
    save_json(results, out_dir, "all_metrics.json")
    return results


# ---------------------------------------------------------------------------
# Vmapped config-batch training: C trajectories in one jitted program.
# ---------------------------------------------------------------------------

def traced_adam(lr, weight_decay):
    """torch-style Adam built from TRACED hyperparameters: lr / weight decay
    may be vmap tracers, so a config axis over them batches cleanly (the
    transforms close over the traced scalars)."""
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                       optax.scale(-lr))


def vmapped_train_body(model: ConvVAE1D, cfg: TrainConfig, batch_size: int,
                       epoch_offset, xc_std, xv_std, mean, std,
                       lrs, weight_decays, betas, cfg_rngs, init_state):
    """The vmapped config-batch epoch loop — the UNJITTED body.  Calling
    it directly re-traces every time; the cached entry points are
    ``_vmapped_train_loop`` below (jit with static (model, cfg,
    batch_size) — repeated ASHA rungs / sweep benchmarks reuse one
    executable per rung length, the same trap CLAUDE.md records for
    trainer._train_loop) and ``parallel.sweep_dist._sharded_sweep_jit``,
    which shard_maps this same body over the config axis of a device
    mesh.  ``epoch_offset`` is a TRACED scalar (RNG fold_in + val_every
    modulus only), so rung resumes at different global epochs share one
    executable."""
    spec = (mean, std) if cfg.loss_space == "raw" else None

    def train_one(lr, wd, beta, cfg_rng, init):
        tx = traced_adam(lr, wd)
        init_rng, train_rng = jax.random.split(cfg_rng)
        if init is None:
            params, batch_stats = init_vae(model, init_rng)
            opt_state = tx.init(params)
        else:
            params, batch_stats, opt_state = init
        step_fn = make_train_step(model, tx, cfg, spec=spec, beta=beta)
        eval_fn = make_eval_loss(model, cfg, spec=spec, beta=beta)
        return epoch_scan(cfg, batch_size, epoch_offset, xc_std, xv_std,
                          step_fn, eval_fn, params, batch_stats, opt_state,
                          train_rng)

    if init_state is None:
        return jax.vmap(lambda lr, wd, b, r: train_one(lr, wd, b, r, None)
                        )(lrs, weight_decays, betas, cfg_rngs)
    return jax.vmap(train_one)(lrs, weight_decays, betas, cfg_rngs,
                               init_state)


_vmapped_train_loop = functools.partial(
    jax.jit, static_argnames=("model", "cfg", "batch_size"))(
        vmapped_train_body)


def train_vae_vmapped(model: ConvVAE1D, x_cal, x_val,
                      lrs, weight_decays, betas,
                      epochs: int, batch_size: int, loss_type: str,
                      rng: jax.Array = None, spec_stats=None,
                      loss_space: str = "std", val_every: int = 1,
                      init_state=None, epoch_offset: int = 0,
                      cfg_rngs=None):
    """Train len(lrs) configs of ONE architecture simultaneously via vmap.

    All configs share the data, epoch schedule and loss type; lr / weight
    decay / beta vary per config.  Returns a TrainResult whose pytree leaves
    have a leading config axis.  This is the TPU answer to the reference's
    sequential 96-config sweep loops (VAE_SIMCA.py:436-470): the config axis
    becomes an XLA batch dimension filling the MXU, one compile total.

    Config i runs the SAME computation as ``train_vae(model, ...,
    TrainConfig(lr=lrs[i], weight_decay=weight_decays[i], beta=betas[i],
    ...), rng=jax.random.split(rng, n)[i])`` — the epoch loop IS
    models.trainer.epoch_scan (val_every / loss_space / RNG folding
    included), so the batched-sweep speedup is a true apples-to-apples
    number.  Loss trajectories and best epochs match the sequential
    trainer to float tolerance
    (tests/test_sweep.py::test_vmapped_matches_sequential_trainer);
    parameter VALUES legitimately differ at the lr scale because the
    batched program reassociates f32 sums at the ulp level and Adam's
    g/|g| normalization amplifies that along flat directions from the
    first step — true of any two fp schedules of this computation.

    Mid-training resume (for rung-based HPO, see ``asha_vae_search``):
    pass ``init_state=(params, batch_stats, opt_state)`` pytrees with a
    leading config axis (from a previous call's ``final_*`` fields) plus
    ``epoch_offset``; per-config RNG streams continue exactly as in
    ``train_vae``'s resume.  ``cfg_rngs`` (an (n_cfg,) key array)
    overrides the default ``jax.random.split(rng, n_cfg)`` so callers
    whose config population changes between calls (rung kills) can keep
    each config's stream stable.
    """
    (lrs, weight_decays, betas, cfg_rngs, xc_std, xv_std, mean, std,
     cfg) = sweep_prep(x_cal, x_val, lrs, weight_decays, betas, epochs,
                       batch_size, loss_type, loss_space, val_every,
                       spec_stats, rng, cfg_rngs)
    init = tuple(init_state) if init_state is not None else None
    out = _vmapped_train_loop(model, cfg, cfg.batch_size, epoch_offset,
                              xc_std, xv_std, mean, std, lrs,
                              weight_decays, betas, cfg_rngs, init)
    return sweep_result(out, mean, std, model, epoch_offset)


def sweep_prep(x_cal, x_val, lrs, weight_decays, betas, epochs: int,
               batch_size: int, loss_type: str, loss_space: str,
               val_every: int, spec_stats, rng, cfg_rngs):
    """Shared config-sweep prologue (validation, standardization, the
    traced-placeholder TrainConfig, default per-config RNG streams) —
    single-sourced for the local vmapped trainer and the mesh-sharded one
    (parallel.sweep_dist), so their semantics cannot drift."""
    lrs = jnp.asarray(lrs, jnp.float32)
    weight_decays = jnp.asarray(weight_decays, jnp.float32)
    betas = jnp.asarray(betas, jnp.float32)
    n_cfg = lrs.shape[0]
    if weight_decays.shape[0] != n_cfg or betas.shape[0] != n_cfg:
        raise ValueError("lrs/weight_decays/betas must share their length")

    x_cal = jnp.asarray(x_cal)
    x_val = jnp.asarray(x_val)
    if spec_stats is None:
        mean, std = spectral_stats(np.asarray(x_cal))
    else:
        mean, std = spec_stats
    mean = jnp.asarray(mean, x_cal.dtype)
    std = jnp.asarray(std, x_cal.dtype)
    xc_std = (x_cal - mean) / std
    xv_std = (x_val - mean) / std
    bs = min(batch_size, x_cal.shape[0])
    # lr/weight_decay/beta are traced per-config; the placeholders in cfg
    # are never read by the step (tx and beta are passed explicitly)
    cfg = TrainConfig(epochs=epochs, batch_size=bs, loss_type=loss_type,
                      val_every=val_every, loss_space=loss_space)

    if cfg_rngs is None:
        if rng is None:
            raise ValueError("pass rng or cfg_rngs")
        cfg_rngs = jax.random.split(rng, n_cfg)
    return (lrs, weight_decays, betas, cfg_rngs, xc_std, xv_std, mean,
            std, cfg)


def sweep_result(out, mean, std, model, epoch_offset) -> TrainResult:
    """Shared config-sweep epilogue: unpack the epoch_scan 8-tuple, build
    per-config bundles, assemble the TrainResult (leading config axis)."""
    (f_params, f_bs, f_opt, best_params, best_bs, best_ep, tl, vls) = out
    bundles = jax.vmap(
        lambda p, b: new_bundle(p, b, mean, std, model.latent_dim)
    )(best_params, best_bs)
    return TrainResult(bundles, tl, vls, best_ep + epoch_offset,
                       f_params, f_bs, f_opt)


def classes_train_body(model: ConvVAE1D, cfg: TrainConfig, batch_size: int,
                       epoch_offset, xcs_std, xvs_std, means, stds,
                       cls_rngs):
    """The vmapped per-CLASS epoch loop (unjitted body): one architecture
    and one STATIC optimizer config (built from ``cfg`` exactly as
    ``models.trainer._train_loop`` does), with per-class data,
    standardization stats and RNG streams along the vmapped axis.  Cached
    entry point: ``_classes_train_loop``."""
    tx = torch_adam(cfg.lr, cfg.weight_decay)

    def train_one(xc, xv, mean, std, cls_rng):
        spec = (mean, std) if cfg.loss_space == "raw" else None
        step_fn = make_train_step(model, tx, cfg, spec=spec)
        eval_fn = make_eval_loss(model, cfg, spec=spec)
        init_rng, train_rng = jax.random.split(cls_rng)
        params, batch_stats = init_vae(model, init_rng)
        opt_state = tx.init(params)
        return epoch_scan(cfg, batch_size, epoch_offset, xc, xv, step_fn,
                          eval_fn, params, batch_stats, opt_state,
                          train_rng)

    return jax.vmap(train_one)(xcs_std, xvs_std, means, stds, cls_rngs)


_classes_train_loop = functools.partial(
    jax.jit, static_argnames=("model", "cfg", "batch_size"))(
        classes_train_body)


def classes_prep(x_cals, x_vals, spec_stats=None):
    """Shared per-class prep for the vmapped/sharded class trainers:
    validate, standardize each class by its OWN stats (the reference
    semantics), cyclic-pad unequal class sizes to the largest, stack.

    Returns ``(xcs, xvs, means, stds, n_max)`` as stacked NumPy arrays
    with a leading class axis (single implementation — consumed by both
    ``train_vae_classes`` and
    ``parallel.sweep_dist.train_vae_classes_sharded``)."""
    # function-level import: parallel.mesh sits below utils in the layer
    # order only at import time (parallel.sweep_dist imports this module)
    from ocm_tpu.parallel.mesh import cyclic_pad_to

    n_classes = len(x_cals)
    if n_classes < 1 or len(x_vals) != n_classes:
        raise ValueError(
            "x_cals and x_vals must be equal-length and non-empty")
    x_cals = [np.asarray(x) for x in x_cals]
    x_vals = [np.asarray(x) for x in x_vals]
    for i, (xc, xv) in enumerate(zip(x_cals, x_vals)):
        if xc.shape[0] == 0 or xv.shape[0] == 0:
            raise ValueError(
                f"class {i}: empty calibration or validation set "
                f"(shapes {xc.shape} / {xv.shape})")
    lengths = ({x.shape[1] for x in x_cals}
               | {x.shape[1] for x in x_vals})
    if len(lengths) != 1:
        raise ValueError("classes must share one spectral length, got "
                         f"{sorted(lengths)}")
    if spec_stats is None:
        stats = [spectral_stats(x) for x in x_cals]
    else:
        stats = [tuple(s) for s in spec_stats]
        if len(stats) != n_classes:
            raise ValueError("spec_stats must give (mean, std) per class")
    n_max = max(x.shape[0] for x in x_cals)
    m_max = max(x.shape[0] for x in x_vals)
    xcs, xvs, means, stds = [], [], [], []
    for xc, xv, (mean, std) in zip(x_cals, x_vals, stats):
        mean = np.asarray(mean, xc.dtype)
        std = np.asarray(std, xc.dtype)
        xcs.append(cyclic_pad_to((xc - mean) / std, n_max))
        xvs.append(cyclic_pad_to((xv - mean) / std, m_max))
        means.append(mean)
        stds.append(std)
    return (np.stack(xcs), np.stack(xvs), np.stack(means),
            np.stack(stds), n_max)


def classes_result(out, means, stds, model: ConvVAE1D) -> TrainResult:
    """Shared per-class epilogue: stacked bundles (exactly the
    ``models.bundle.stack_bundles`` layout) + TrainResult."""
    (f_params, f_bs, f_opt, best_params, best_bs, best_ep, tl,
     vls) = out
    bundles = jax.vmap(
        lambda p, b, m, s: new_bundle(p, b, m, s, model.latent_dim)
    )(best_params, best_bs, jnp.asarray(means), jnp.asarray(stds))
    return TrainResult(bundles, tl, vls, best_ep, f_params, f_bs, f_opt)


def train_vae_classes(model: ConvVAE1D, x_cals, x_vals, cfg: TrainConfig,
                      rng: jax.Array, spec_stats=None) -> TrainResult:
    """Train one VAE per CLASS (one architecture, per-class data) as ONE
    vmapped compiled program.

    The reference trains its per-nut-type one-class VAEs by re-running a
    whole driver per type (vae_simca_nuts_peanut.py is a single-type
    script; vae_bce_nut.py trains one target per run) — C sequential
    training loops.  Here the class axis is a vmap axis: per-class
    calibration/validation sets, per-class standardization stats (each
    class's own ``spectral_stats``, the reference semantics) and
    per-class RNG streams batch into one program on the MXU.

    Unequal class sizes are CYCLIC-padded (verbatim row repeats) to the
    largest class, so a smaller class trains on a cyclically oversampled
    calibration set: every sample still appears each epoch, early rows
    twice, and its padded validation mean re-weights duplicates — exact
    equality holds for any class at the max size.  With equal sizes,
    class c runs exactly ``train_vae(model, x_cals[c], x_vals[c], cfg,
    jax.random.split(rng, C)[c])`` modulo batched-f32 reassociation (the
    ``train_vae_vmapped`` contract; asserted in tests/test_sweep.py).

    Returns a TrainResult with a leading class axis.  ``result.bundle``
    is stacked exactly as ``models.bundle.stack_bundles`` produces, so
    after per-class ``vae_decision.fit_thresholds`` (on the unstacked
    bundles: ``jax.tree.map(lambda a: a[c], result.bundle)``) the
    re-stacked models feed the multi-class ``serving.VAEScorer`` directly.

    ``spec_stats``: optional per-class sequence of (mean, std) overrides.
    """
    xcs, xvs, means, stds, n_max = classes_prep(x_cals, x_vals, spec_stats)
    bs = min(cfg.batch_size, n_max)
    cls_rngs = jax.random.split(rng, len(x_cals))
    out = _classes_train_loop(model, cfg, bs, 0, jnp.asarray(xcs),
                              jnp.asarray(xvs), jnp.asarray(means),
                              jnp.asarray(stds), cls_rngs)
    return classes_result(out, means, stds, model)


# ---------------------------------------------------------------------------
# HPO: Optuna hook (optional dep) + dependency-free random search.
# ---------------------------------------------------------------------------

SEARCH_SPACE_DEFAULT = {
    # the reference's Optuna space (optim_bce_nuts.py:118-126)
    "latent_dim": ("int", 4, 64),
    "lr": ("loguniform", 1e-4, 1e-2),
    "beta": ("loguniform", 1e-3, 4.0),
    "batch_size": ("categorical", [32, 64, 128]),
}


def sample_config(space: Mapping, rng: np.random.Generator) -> dict:
    out = {}
    for k, spec in space.items():
        kind = spec[0]
        if kind == "int":
            out[k] = int(rng.integers(spec[1], spec[2] + 1))
        elif kind == "uniform":
            out[k] = float(rng.uniform(spec[1], spec[2]))
        elif kind == "loguniform":
            out[k] = float(np.exp(rng.uniform(np.log(spec[1]),
                                              np.log(spec[2]))))
        elif kind == "categorical":
            out[k] = spec[1][int(rng.integers(len(spec[1])))]
        else:
            raise ValueError(f"unknown search-space kind {kind!r}")
    return out


def random_search(objective: Callable[[dict], float], space: Mapping,
                  n_trials: int, seed: int = 42, maximize: bool = True):
    """Dependency-free HPO: seeded random search over the space.

    Returns (best_config, best_value, history).  Stands in for the
    reference's Optuna TPE study (optim_bce_nuts.py:286-307) when optuna is
    unavailable.
    """
    rng = np.random.default_rng(seed)
    best_cfg, best_val, history = None, None, []
    for t in range(n_trials):
        cfg = sample_config(space, rng)
        val = float(objective(cfg))
        history.append({"trial": t, "config": cfg, "value": val})
        better = (best_val is None or
                  (val > best_val if maximize else val < best_val))
        if better:
            best_cfg, best_val = cfg, val
    return best_cfg, best_val, history


def asha_vae_search(x_cal, x_val, space: Mapping = None, n_trials: int = 9,
                    max_epochs: int = 27, reduction: int = 3,
                    min_epochs: Optional[int] = None, seed: int = 42,
                    base_config: Optional[Mapping] = None,
                    configs: Optional[Sequence[Mapping]] = None,
                    mesh=None, verbose: bool = True) -> dict:
    """Dependency-free adaptive HPO: successive halving (the synchronous
    core of ASHA) over the resident trainers.

    Capability-matches the reference's Optuna TPE + MedianPruner protocol
    (optim_bce_nuts.py:286-307) without optuna: every trial trains
    ``min_epochs`` first, then at each rung boundary the bottom
    (1 - 1/reduction) of trials by best validation loss are KILLED and the
    survivors continue training from their exact optimizer state (Adam
    moments and RNG streams included — no retraining).  TPU-first twist:
    within each rung, survivors sharing an architecture train as ONE
    vmapped program (``train_vae_vmapped``), so a rung costs one compile
    and one device dispatch per architecture group instead of one run per
    trial.

    ``space`` defaults to SEARCH_SPACE_DEFAULT (the reference's Optuna
    space).  Sampled/base config keys: latent_dim, conv_blocks, n_filters,
    kernel_size, hidden_fc, dropout, activation, batch_size, loss_type,
    lr, weight_decay, beta.  Minimizes best validation loss.

    ``configs`` (optional) bypasses sampling: an explicit sequence of
    config dicts (each merged over ``base_config``) becomes the trial
    cohort and ``n_trials``/``space`` sampling is ignored — the hook that
    lets an outer sampler (e.g. ``utils.tpe.bohb_vae_search``) choose the
    cohort while this function provides the vmapped halving schedule.

    ``mesh`` (optional, a ``jax.sharding.Mesh`` with a ``'model'`` axis)
    shards FRESH rungs' config axes over the mesh
    (``parallel.sweep_dist.train_vae_vmapped_sharded``) — rung 0, the
    widest, trains its configs on distinct chips.  Resumed rungs stay on
    the single-program vmapped path (their survivor states are already
    stacked device-local).  Sharded trajectories are equivalent fp
    schedules of the local ones, not bitwise copies (see sweep_dist).

    Returns ``{"best_config", "best_value", "best_bundle", "history",
    "total_epochs", "rungs", "trials"}``; ``total_epochs`` (sum of epochs
    actually trained) is the budget to compare against
    ``n_trials * max_epochs`` for non-adaptive search; ``trials`` is the
    per-trial summary ``[{"id", "config", "best_val", "epochs"}, ...]``
    (killed trials included, at the budget they reached).
    """
    import math

    from ocm_tpu.models.vae import ConvVAE1D as _VAE

    if reduction < 2:
        raise ValueError(f"reduction must be >= 2, got {reduction}")
    if n_trials < 1 or max_epochs < 1:
        raise ValueError("n_trials and max_epochs must be >= 1")
    if min_epochs is not None and not 1 <= min_epochs <= max_epochs:
        raise ValueError(
            f"min_epochs must be in [1, max_epochs], got {min_epochs}")
    if space is None:
        space = SEARCH_SPACE_DEFAULT
    host_rng = np.random.default_rng(seed)
    master = jax.random.key(seed)
    base_config = dict(base_config or {})
    if configs is not None:
        if not configs:
            raise ValueError("configs must be a non-empty sequence")
        n_trials = len(configs)
        sampled = [dict(c) for c in configs]
    else:
        sampled = [sample_config(space, host_rng) for _ in range(n_trials)]
    trials = [{"id": t, "config": {**base_config, **sampled[t]},
               "best_val": np.inf, "bundle": None, "state": None,
               "epochs": 0}
              for t in range(n_trials)]

    if min_epochs is None:
        k0 = max(1, math.ceil(math.log(max(n_trials, reduction))
                              / math.log(reduction)))
        min_epochs = max(1, max_epochs // reduction ** k0)
    rungs = []
    r = min_epochs
    while r < max_epochs:
        rungs.append(r)
        r *= reduction
    rungs.append(max_epochs)

    input_length = int(np.asarray(x_cal).shape[1])
    spec_stats = spectral_stats(np.asarray(x_cal))

    def arch_of(c):
        return (int(c.get("latent_dim", 16)), int(c.get("conv_blocks", 3)),
                int(c.get("n_filters", 32)), int(c.get("kernel_size", 9)),
                int(c.get("hidden_fc", 256)), float(c.get("dropout", 0.0)),
                c.get("activation", "elu"), int(c.get("batch_size", 64)),
                c.get("loss_type", "cosine"))

    alive = list(trials)
    history = []
    total_epochs = 0
    for rung_i, target in enumerate(rungs):
        delta = target - alive[0]["epochs"]
        groups: dict = {}
        for tr in alive:
            groups.setdefault(arch_of(tr["config"]), []).append(tr)
        for arch, grp in groups.items():
            model = _VAE(input_length=input_length, latent_dim=arch[0],
                         conv_blocks=arch[1], n_filters=arch[2],
                         kernel_size=arch[3], hidden_fc=arch[4],
                         dropout=arch[5], activation=arch[6])
            cfgs = [tr["config"] for tr in grp]
            cfg_rngs = jnp.stack([jax.random.fold_in(master, tr["id"])
                                  for tr in grp])
            init = None
            if grp[0]["state"] is not None:
                init = jax.tree.map(lambda *xs: jnp.stack(xs),
                                    *[tr["state"] for tr in grp])
            grp_lrs = [float(c.get("lr", 1e-3)) for c in cfgs]
            grp_wds = [float(c.get("weight_decay", 0.0)) for c in cfgs]
            grp_betas = [float(c.get("beta", 1.0)) for c in cfgs]
            if mesh is not None and init is None:
                # The sharded path has no resume contract (fresh runs
                # only) and is called without epoch_offset: both are safe
                # ONLY at the first rung.  Assert the invariant rather
                # than rely on it — a future warm-started cohort or a
                # state-freeing change would otherwise silently restart
                # trajectories at offset 0.
                if grp[0]["epochs"] != 0:
                    raise AssertionError(
                        "sharded rung reached with trained trials but no "
                        "resume state — would restart trajectories")
                from ocm_tpu.parallel.sweep_dist import (
                    train_vae_vmapped_sharded)

                res = train_vae_vmapped_sharded(
                    model, x_cal, x_val, grp_lrs, grp_wds, grp_betas,
                    mesh, epochs=delta, batch_size=arch[7],
                    loss_type=arch[8], spec_stats=spec_stats,
                    cfg_rngs=cfg_rngs)
            else:
                res = train_vae_vmapped(
                    model, x_cal, x_val, grp_lrs, grp_wds, grp_betas,
                    epochs=delta, batch_size=arch[7], loss_type=arch[8],
                    spec_stats=spec_stats, cfg_rngs=cfg_rngs,
                    init_state=init, epoch_offset=grp[0]["epochs"])
            vls = np.asarray(res.val_losses)            # (n_grp, delta)
            for j, tr in enumerate(grp):
                tr["epochs"] = target
                v = float(np.min(vls[j]))
                if np.isfinite(v) and v < tr["best_val"]:
                    tr["best_val"] = v
                    tr["bundle"] = jax.tree.map(lambda a: a[j], res.bundle)
                tr["state"] = jax.tree.map(
                    lambda a: a[j], (res.final_params,
                                     res.final_batch_stats,
                                     res.final_opt_state))
            total_epochs += delta * len(grp)

        alive.sort(key=lambda tr: tr["best_val"])
        last_rung = rung_i == len(rungs) - 1
        keep = len(alive) if last_rung else max(
            1, math.ceil(len(alive) / reduction))
        killed, alive = alive[keep:], alive[:keep]
        for tr in killed:
            # a killed trial never trains again and can never become the
            # winner — drop its stacked device state (params + batch_stats
            # + Adam moments) and bundle so HBM isn't held for the rest of
            # the search
            tr["state"] = None
            tr["bundle"] = None
        history.append({
            "rung": rung_i, "epochs": target,
            "alive": [tr["id"] for tr in alive],
            "killed": [tr["id"] for tr in killed],
            "values": {tr["id"]: tr["best_val"] for tr in alive + killed}})
        if verbose:
            print(f"[asha] rung {rung_i} @ {target} ep: "
                  f"kept {len(alive)}, killed {len(killed)}, "
                  f"best={alive[0]['best_val']:.5f}")
        if len(alive) == 1 and last_rung:
            break

    best = alive[0]
    if best["bundle"] is None:
        raise RuntimeError(
            "asha_vae_search: no trial produced a finite validation loss "
            "(all trajectories diverged) — widen/lower the lr range or "
            "check the loss_type against the data scale")
    return {"best_config": dict(best["config"]),
            "best_value": best["best_val"],
            "best_bundle": best["bundle"], "history": history,
            "total_epochs": total_epochs, "rungs": rungs,
            "trials": [{"id": tr["id"], "config": dict(tr["config"]),
                        "best_val": tr["best_val"], "epochs": tr["epochs"]}
                       for tr in sorted(trials, key=lambda tr: tr["id"])]}


def pruning_report(trial) -> Callable:
    """Per-epoch pruning callback for ``train_vae_blocked`` from an
    Optuna-style trial — the reference's mid-trial protocol
    (``trial.report(loss, epoch)`` then prune, optim_bce_nuts.py:197-199).

    Works with any object exposing ``report(value, step)`` and
    ``should_prune() -> bool`` (fake trials in tests, real Optuna trials
    when installed).  Usage::

        from ocm_tpu.models.trainer import train_vae_blocked
        r = train_vae_blocked(model, x_cal, x_val, cfg, rng,
                              block_epochs=1, report=pruning_report(trial))

    With ``block_epochs=1`` the cadence is exactly the reference's; larger
    blocks amortize host round trips at the cost of pruning latency.
    """
    def report(epoch: int, train_loss: float, val_loss: float) -> bool:
        trial.report(val_loss, epoch)
        return bool(trial.should_prune())
    return report


def optuna_objective(objective: Callable[[dict], float], space: Mapping):
    """Wrap a config-dict objective as an Optuna objective (lazy import;
    mirrors trial.suggest_* usage of optim_bce_nuts.py:118-126)."""
    def _objective(trial):
        cfg = {}
        for k, spec in space.items():
            kind = spec[0]
            if kind == "int":
                cfg[k] = trial.suggest_int(k, spec[1], spec[2])
            elif kind == "uniform":
                cfg[k] = trial.suggest_float(k, spec[1], spec[2])
            elif kind == "loguniform":
                cfg[k] = trial.suggest_float(k, spec[1], spec[2], log=True)
            elif kind == "categorical":
                cfg[k] = trial.suggest_categorical(k, list(spec[1]))
            else:
                raise ValueError(f"unknown search-space kind {kind!r}")
        return objective(cfg)
    return _objective


def run_optuna_study(objective: Callable[[dict], float], space: Mapping,
                     n_trials: int = 50, seed: int = 42,
                     direction: str = "maximize"):
    """Reference-equivalent Optuna study (TPESampler(seed) + MedianPruner,
    optim_bce_nuts.py:286-292).  Raises ImportError when optuna is absent —
    use ``random_search`` then."""
    try:
        import optuna
    except ImportError as e:
        raise ImportError(
            "optuna is not installed; use ocm_tpu.utils.sweep.random_search "
            "for the dependency-free HPO path") from e
    study = optuna.create_study(
        direction=direction,
        sampler=optuna.samplers.TPESampler(seed=seed),
        pruner=optuna.pruners.MedianPruner(n_warmup_steps=10))
    study.optimize(optuna_objective(objective, space), n_trials=n_trials)
    return study
