"""Hyperparameter search for the nut VAE (reference optim_bce_nuts.py):
objective = test accuracy of the f-distance decision, ROC-AUC recorded per
trial.  Uses Optuna TPE when installed (optim_bce_nuts.py:286-292),
otherwise the built-in dependency-free TPE sampler
(ocm_tpu.utils.tpe.tpe_search — same algorithm family as optuna's default
sampler).

    python examples/hpo_nuts.py [--n-trials 20]

``--tpe`` runs the reference's FULL adaptive protocol without optuna:
``ocm_tpu.utils.tpe.tpe_vae_search`` = TPESampler(seed) + per-epoch
MedianPruner(n_warmup_steps) over the blocked trainer — the literal
capability of optim_bce_nuts.py:197-199 + 286-292 (trial.report per epoch,
prune when the best val loss so far is worse than the running median).

``--bohb`` composes the two adaptive modes (BOHB-style,
``ocm_tpu.utils.tpe.bohb_vae_search``): the TPE sampler draws each
bracket's cohort, vmapped successive halving trains it, and every trial's
outcome is told back to the sampler before the next bracket.

``--asha`` instead runs the parallelism-oriented ADAPTIVE search
(ocm_tpu.utils.sweep.asha_vae_search): successive halving kills the worst
trials at rung boundaries, survivors resume from their exact optimizer
state, and arch-sharing survivors train as one vmapped program.  Both
adaptive modes print the epoch budget actually spent vs the
n_trials * epochs a non-adaptive search would train.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__))
                if "__file__" in globals() else os.getcwd())
import _bootstrap  # noqa: E402,F401  repo root on sys.path + TPU-outage CPU fallback

import jax
import numpy as np


def main(n_trials=10, target="peanut", epochs=25, seed=42,
         out_dir="out/hpo_nuts", asha=False, tpe=False, bohb=False,
         brackets=3):
    import jax.numpy as jnp

    from ocm_tpu.models import vae_decision as D
    from ocm_tpu.models.trainer import TrainConfig, train_vae
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.stats.metrics import roc_auc, vae_binary_metrics
    from ocm_tpu.utils.io import save_json
    from ocm_tpu.utils.splits import object_aware_splits
    from ocm_tpu.utils.sweep import asha_vae_search, run_optuna_study

    import _synthetic

    data = _synthetic.nut_objects()
    nut_types = list(data)
    length = data[target][0].shape[1]
    res = object_aware_splits(data, nut_types, target, length, verbose=False)
    y_bin = res.y_test

    if bohb or tpe or asha:
        # one evaluation epilogue for all three adaptive modes: rebuild the
        # winner, fit thresholds, score the test set, persist + print
        space = {"latent_dim": ("categorical", [8, 16, 32]),
                 "lr": ("loguniform", 1e-4, 1e-2),
                 "beta": ("loguniform", 1e-3, 4.0)}
        base = {"conv_blocks": 3, "n_filters": 16, "hidden_fc": 64,
                "batch_size": 64, "loss_type": "bce"}
        if bohb:
            from ocm_tpu.utils.tpe import bohb_vae_search
            tag, budget, extra = "bohb", brackets * n_trials * epochs, {}
            out = bohb_vae_search(res.x_cal, res.x_val, space,
                                  n_brackets=brackets,
                                  trials_per_bracket=n_trials,
                                  max_epochs=epochs, reduction=3,
                                  seed=seed, base_config=base)
        elif tpe:
            from ocm_tpu.utils.tpe import tpe_vae_search
            tag, budget = "tpe", n_trials * epochs
            out = tpe_vae_search(res.x_cal, res.x_val, space,
                                 n_trials=n_trials, max_epochs=epochs,
                                 seed=seed, base_config=base,
                                 n_warmup_steps=min(10, max(2,
                                                            epochs // 5)))
            extra = {"n_pruned": out["n_pruned"]}
        else:
            tag, budget = "asha", n_trials * epochs
            out = asha_vae_search(res.x_cal, res.x_val, space,
                                  n_trials=n_trials, max_epochs=epochs,
                                  reduction=3, seed=seed, base_config=base)
            extra = {"rungs": out["rungs"]}
        cfg = out["best_config"]
        model = ConvVAE1D(input_length=length,
                          latent_dim=int(cfg["latent_dim"]), conv_blocks=3,
                          n_filters=16, hidden_fc=64)
        b = D.fit_thresholds(model, out["best_bundle"], res.x_cal,
                             loss_type="bce")
        dec = D.decide_f(model, b, jnp.asarray(res.x_test))
        pred = np.where(np.asarray(dec.accept), 0, 1)
        m = vae_binary_metrics(jnp.asarray(pred), jnp.asarray(y_bin), 2)
        os.makedirs(out_dir, exist_ok=True)
        save_json({"best_config": cfg, "best_val_loss": out["best_value"],
                   "test_accuracy": float(m.accuracy),
                   "total_epochs": out["total_epochs"],
                   "full_fidelity_epochs": budget,
                   **extra, "history": out["history"]},
                  out_dir, f"hpo_{tag}.json")
        print(f"[{tag}] best val loss {out['best_value']:.5f} "
              f"(test acc {float(m.accuracy):.4f}) with {cfg}; "
              f"trained {out['total_epochs']} epochs vs {budget} "
              f"non-adaptive "
              f"({out['total_epochs'] / budget:.0%})")
        return cfg, out["best_value"]

    space = {
        # the reference's search space (optim_bce_nuts.py:118-126)
        "latent_dim": ("int", 4, 32),
        "lr": ("loguniform", 1e-4, 1e-2),
        "beta": ("loguniform", 1e-3, 4.0),
        "batch_size": ("categorical", [64, 128]),
    }
    trial_auc = []

    def objective(cfg):
        model = ConvVAE1D(input_length=length,
                          latent_dim=int(cfg["latent_dim"]), conv_blocks=3,
                          n_filters=16, hidden_fc=64)
        tc = TrainConfig(epochs=epochs, batch_size=int(cfg["batch_size"]),
                         lr=float(cfg["lr"]), beta=float(cfg["beta"]),
                         loss_type="bce")
        r = train_vae(model, res.x_cal, res.x_val, tc, jax.random.key(seed))
        b = D.fit_thresholds(model, r.bundle, res.x_cal, loss_type="bce")
        dec = D.decide_f(model, b, jnp.asarray(res.x_test))
        pred = np.where(np.asarray(dec.accept), 0, 1)
        m = vae_binary_metrics(jnp.asarray(pred), jnp.asarray(y_bin), 2)
        auc = float(roc_auc(jnp.asarray(y_bin), jnp.asarray(dec.q + dec.d2)))
        trial_auc.append(auc)   # user-attr equivalent (optim_bce_nuts.py:241)
        return float(m.accuracy)

    try:
        study = run_optuna_study(objective, space, n_trials=n_trials,
                                 seed=seed)
        best_cfg, best_val = study.best_params, study.best_value
        history = [{"trial": t.number, "value": t.value,
                    "config": t.params} for t in study.trials]
    except ImportError:
        from ocm_tpu.utils.tpe import tpe_search
        best_cfg, best_val, history = tpe_search(objective, space,
                                                 n_trials, seed=seed,
                                                 maximize=True)

    os.makedirs(out_dir, exist_ok=True)
    save_json({"best_config": best_cfg, "best_accuracy": best_val,
               "history": history, "roc_auc_per_trial": trial_auc},
              out_dir, "hpo.json")
    print("best accuracy:", best_val, "with", best_cfg)
    return best_cfg, best_val


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-trials", type=int, default=10)
    p.add_argument("--target", default="peanut")
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out-dir", default="out/hpo_nuts")
    p.add_argument("--asha", action="store_true",
                   help="adaptive successive-halving search instead of "
                        "random/TPE full-fidelity trials")
    p.add_argument("--tpe", action="store_true",
                   help="built-in TPE sampler + per-epoch median pruning "
                        "(the reference's exact optuna protocol, "
                        "dependency-free)")
    p.add_argument("--bohb", action="store_true",
                   help="TPE-sampled brackets of vmapped successive "
                        "halving (n_trials = trials per bracket)")
    p.add_argument("--brackets", type=int, default=3,
                   help="number of BOHB brackets")
    main(**vars(p.parse_args()))
