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

import itertools
import os
from typing import Callable, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ocm_tpu.models.bundle import new_bundle, spectral_stats
from ocm_tpu.models.trainer import (TrainConfig, TrainResult,
                                    _batch_indices)
from ocm_tpu.models.vae import ConvVAE1D, beta_vae_loss, init_vae
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


def train_vae_vmapped(model: ConvVAE1D, x_cal, x_val,
                      lrs, weight_decays, betas,
                      epochs: int, batch_size: int, loss_type: str,
                      rng: jax.Array, spec_stats=None):
    """Train len(lrs) configs of ONE architecture simultaneously via vmap.

    All configs share the data, epoch schedule and loss type; lr / weight
    decay / beta vary per config.  Returns a TrainResult whose pytree leaves
    have a leading config axis.  This is the TPU answer to the reference's
    sequential 96-config sweep loops (VAE_SIMCA.py:436-470): the config axis
    becomes an XLA batch dimension filling the MXU, one compile total.
    """
    lrs = jnp.asarray(lrs, jnp.float32)
    weight_decays = jnp.asarray(weight_decays, jnp.float32)
    betas = jnp.asarray(betas, jnp.float32)
    n_cfg = lrs.shape[0]
    assert weight_decays.shape[0] == n_cfg and betas.shape[0] == n_cfg

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

    n = x_cal.shape[0]
    bs = min(batch_size, n)

    def train_one(lr, wd, beta, cfg_rng):
        tx = traced_adam(lr, wd)
        init_rng, train_rng = jax.random.split(cfg_rng)
        params, batch_stats = init_vae(model, init_rng)
        opt_state = tx.init(params)

        def train_step(params, batch_stats, opt_state, xb, step_rng):
            r1, r2 = jax.random.split(step_rng)

            def loss_fn(p):
                variables = {"params": p}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                out, mutated = model.apply(
                    variables, xb, train=True,
                    rngs={"reparam": r1, "dropout": r2},
                    mutable=["batch_stats"] if batch_stats else [])
                x_rec, mu, logvar = out
                total, _, _ = beta_vae_loss(xb, x_rec, mu, logvar,
                                            beta=beta, loss_type=loss_type)
                new_bs = (mutated.get("batch_stats", batch_stats)
                          if batch_stats else batch_stats)
                return total, new_bs

            (total, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_bs, new_opt,
                    total)

        def eval_loss(params, batch_stats, rng_):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            x_rec, mu, logvar = model.apply(variables, xv_std, train=False,
                                            rngs={"reparam": rng_})
            total, _, _ = beta_vae_loss(xv_std, x_rec, mu, logvar,
                                        beta=beta, loss_type=loss_type)
            return total

        def epoch_body(carry, epoch):
            params, batch_stats, opt_state, best = carry
            ep_rng = jax.random.fold_in(train_rng, epoch)
            idx = _batch_indices(jax.random.fold_in(ep_rng, 0), n, bs)

            def step_body(inner, si):
                p, bst, os_ = inner
                p, bst, os_, loss = train_step(
                    p, bst, os_, xc_std[idx[si]],
                    jax.random.fold_in(ep_rng, 1 + si))
                return (p, bst, os_), loss

            (params, batch_stats, opt_state), losses = jax.lax.scan(
                step_body, (params, batch_stats, opt_state),
                jnp.arange(idx.shape[0]))
            vl = eval_loss(params, batch_stats,
                           jax.random.fold_in(ep_rng, 1 + idx.shape[0]))
            best_val, best_params, best_bs, best_ep = best
            is_best = vl < best_val
            take = lambda a, b: jax.tree.map(
                lambda u, v: jnp.where(is_best, u, v), a, b)
            best = (jnp.where(is_best, vl, best_val),
                    take(params, best_params), take(batch_stats, best_bs),
                    jnp.where(is_best, epoch, best_ep))
            return (params, batch_stats, opt_state, best), (
                jnp.mean(losses), vl)

        best0 = (jnp.asarray(jnp.inf, xc_std.dtype), params, batch_stats,
                 jnp.asarray(0))
        carry, (tl, vls) = jax.lax.scan(
            epoch_body, (params, batch_stats, opt_state, best0),
            jnp.arange(epochs))
        _, _, _, best = carry
        best_val, best_params, best_bs, best_ep = best
        return best_params, best_bs, best_ep, tl, vls

    cfg_rngs = jax.random.split(rng, n_cfg)
    run = jax.jit(jax.vmap(train_one))
    best_params, best_bs, best_ep, tl, vls = run(lrs, weight_decays, betas,
                                                 cfg_rngs)
    bundles = jax.vmap(
        lambda p, b: new_bundle(p, b, mean, std, model.latent_dim)
    )(best_params, best_bs)
    return TrainResult(bundles, tl, vls, best_ep, None, None, None)


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
