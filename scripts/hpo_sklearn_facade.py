"""sklearn facade as a search surface (round-5 verdict item 8): show
``RandomizedSearchCV`` over ``VAESIMCAOneClass`` reaching the same
incumbent objective as ``tpe_vae_search`` on the shared-protocol space.

Protocol (small budget, 1 seed — the verdict's ask):
- data, space and base config are EXACTLY scripts/hpo_shared_protocol.py
  (synthetic nut objects, object-aware splits, target = peanut;
  latent_dim in {8,16,32}, lr loguniform [1e-4, 1e-2], beta loguniform
  [1e-3, 4.0]; conv_blocks=3, n_filters=16, hidden_fc=64, batch 64,
  BCE), budget ``--n-trials`` (default 12) x ``--max-epochs``
  (default 27), pruning DISABLED in both arms (RandomizedSearchCV has
  no pruning, so the fair twin is the full-fidelity TPE anchor);
- arm A: ``tpe_vae_search`` (n_warmup_steps = max_epochs disables the
  median rule) on (x_cal, x_val);
- arm B: ``RandomizedSearchCV(VAESIMCAOneClass(...), scoring=
  neg_val_loss, cv=[one trivial split])`` over the concatenated rows
  with ``val_indices`` pinning the SAME validation rows — the facade's
  objective is numerically the same quantity (best val loss on the same
  val set under the same trainer).

Both arms run in one invocation on the same backend.  Prints the two
incumbents and a docs/QUALITY.md markdown row; writes
``out/hpo_sklearn_facade.json``.

Run:  python scripts/hpo_sklearn_facade.py [--n-trials 12] [--seed 11]
      [--platform cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "examples"))

SPACE = {"latent_dim": ("categorical", [8, 16, 32]),
         "lr": ("loguniform", 1e-4, 1e-2),
         "beta": ("loguniform", 1e-3, 4.0)}
BASE = {"conv_blocks": 3, "n_filters": 16, "hidden_fc": 64,
        "batch_size": 64, "loss_type": "bce"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-trials", type=int, default=12)
    ap.add_argument("--max-epochs", type=int, default=27)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    ap.add_argument("--out", default="out/hpo_sklearn_facade.json")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_hpo")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np
    from scipy.stats import loguniform
    from sklearn.model_selection import RandomizedSearchCV

    import _synthetic
    from ocm_tpu.sklearn_api import VAESIMCAOneClass, neg_val_loss
    from ocm_tpu.utils.splits import object_aware_splits
    from ocm_tpu.utils.tpe import tpe_vae_search

    data = _synthetic.nut_objects()
    nut_types = list(data)
    length = data["peanut"][0].shape[1]
    res = object_aware_splits(data, nut_types, "peanut", length,
                              verbose=False)
    x_cal, x_val = np.asarray(res.x_cal), np.asarray(res.x_val)
    print(f"backend={jax.default_backend()}  cal={x_cal.shape} "
          f"val={x_val.shape}", flush=True)

    # ---- arm A: in-repo TPE, pruning disabled (full-fidelity) ----------
    t0 = time.time()
    tpe = tpe_vae_search(x_cal, x_val, SPACE, n_trials=args.n_trials,
                         max_epochs=args.max_epochs, seed=args.seed,
                         base_config=BASE,
                         n_warmup_steps=args.max_epochs, verbose=False)
    t_tpe = time.time() - t0
    print(f"[tpe ] best {tpe['best_value']:.6f}  config "
          f"{tpe['best_config']}  {tpe['total_epochs']} epochs  "
          f"{t_tpe:.1f} s", flush=True)

    # ---- arm B: RandomizedSearchCV over the facade ---------------------
    x_all = np.vstack([x_cal, x_val]).astype(np.float32)
    n = x_all.shape[0]
    val_idx = np.arange(x_cal.shape[0], n)      # the SAME validation rows
    base_est = VAESIMCAOneClass(
        epochs=args.max_epochs, val_indices=val_idx,
        random_state=args.seed, **BASE)
    search = RandomizedSearchCV(
        base_est,
        {"latent_dim": [8, 16, 32],
         "lr": loguniform(1e-4, 1e-2),
         "beta": loguniform(1e-3, 4.0)},
        n_iter=args.n_trials, scoring=neg_val_loss,
        cv=[(np.arange(n), np.arange(2))], random_state=args.seed,
        refit=True, error_score="raise", n_jobs=1)
    t0 = time.time()
    search.fit(x_all)
    t_skl = time.time() - t0
    skl_best = -float(search.best_score_)
    print(f"[skl ] best {skl_best:.6f}  config {search.best_params_}  "
          f"{args.n_trials * args.max_epochs} epochs  {t_skl:.1f} s",
          flush=True)

    rel = abs(skl_best - tpe["best_value"]) / abs(tpe["best_value"])
    out = {"backend": jax.default_backend(), "seed": args.seed,
           "n_trials": args.n_trials, "max_epochs": args.max_epochs,
           "tpe": {"best_value": float(tpe["best_value"]),
                   "best_config": {k: (float(v) if hasattr(v, "item")
                                       else v)
                                   for k, v in tpe["best_config"].items()},
                   "wall_s": round(t_tpe, 1)},
           "sklearn": {"best_value": skl_best,
                       "best_config": {k: (float(v) if hasattr(v, "item")
                                           else v)
                                       for k, v in
                                       search.best_params_.items()},
                       "wall_s": round(t_skl, 1)},
           "rel_gap": rel}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)

    print("\nQUALITY.md row:")
    print("| search surface | best val loss | incumbent | wall |")
    print("|---|---|---|---|")
    cfg_t = tpe["best_config"]
    cfg_s = search.best_params_
    print(f"| `tpe_vae_search` (no pruning) | {tpe['best_value']:.5f} | "
          f"ld={cfg_t.get('latent_dim')}, lr={cfg_t.get('lr'):.2e}, "
          f"beta={cfg_t.get('beta'):.2e} | {t_tpe:.0f} s |")
    print(f"| `RandomizedSearchCV(VAESIMCAOneClass)` | {skl_best:.5f} | "
          f"ld={cfg_s.get('latent_dim')}, lr={cfg_s.get('lr'):.2e}, "
          f"beta={cfg_s.get('beta'):.2e} | {t_skl:.0f} s |")
    print(f"relative incumbent gap: {rel:.2%}")


if __name__ == "__main__":
    main()
