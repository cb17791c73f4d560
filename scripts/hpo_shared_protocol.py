"""Shared-protocol HPO comparison: TPE, ASHA, BOHB on the SAME space,
SAME trial count, SAME epoch cap, 3 seeds (the round-3 verdict's ask —
the earlier tables gave ASHA a fixed 8-config cohort while TPE/BOHB
sampled the continuous space, so the arms were not cross-comparable).

Protocol (per seed in {11, 23, 47}):
- space: latent_dim categorical {8,16,32}, lr loguniform [1e-4, 1e-2],
  beta loguniform [1e-3, 4.0] (the reference's optim_bce_nuts.py space
  shape); base config conv_blocks=3, n_filters=16, hidden_fc=64,
  batch=64, BCE loss; object-aware nut splits, target = peanut.
- every arm gets 18 trials x <= 27 epochs (486 non-adaptive epochs):
  - full-fidelity anchor: TPE sampling, pruning disabled
    (n_warmup_steps >= max_epochs, so the median rule never fires)
  - TPE + MedianPruner (the reference protocol, dependency-free twin)
  - ASHA: 18 sampled trials, rungs 3/9/27 (reduction 3)
  - BOHB: 3 brackets x 6 TPE-sampled trials, same rung schedule
- report best val loss + epochs actually trained, per seed and mean.

Writes out/hpo_shared_protocol.json and prints the markdown table for
docs/QUALITY.md.  CPU run (the schedulers' QUALITY is platform-free;
wall-clock comparisons live in docs/BENCHMARKS.md).
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

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the arms share three ConvVAE1D architectures
# (latent_dim in {8,16,32}), so later seeds/arms/invocations skip the
# trainer compiles entirely
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_hpo")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

SEEDS = (11, 23, 47)
N_TRIALS = 18
MAX_EPOCHS = 27
SPACE = {"latent_dim": ("categorical", [8, 16, 32]),
         "lr": ("loguniform", 1e-4, 1e-2),
         "beta": ("loguniform", 1e-3, 4.0)}
BASE = {"conv_blocks": 3, "n_filters": 16, "hidden_fc": 64,
        "batch_size": 64, "loss_type": "bce"}


def main():
    from ocm_tpu.utils.splits import object_aware_splits
    from ocm_tpu.utils.sweep import asha_vae_search
    from ocm_tpu.utils.tpe import bohb_vae_search, tpe_vae_search

    import _synthetic

    data = _synthetic.nut_objects()
    nut_types = list(data)
    length = data["peanut"][0].shape[1]
    res = object_aware_splits(data, nut_types, "peanut", length,
                              verbose=False)
    x_cal, x_val = res.x_cal, res.x_val

    def arm_full(seed):
        # pruning disabled: warm-up >= max_epochs means the median rule
        # never fires, so every trial trains to the cap
        return tpe_vae_search(x_cal, x_val, SPACE, n_trials=N_TRIALS,
                              max_epochs=MAX_EPOCHS, seed=seed,
                              base_config=BASE,
                              n_warmup_steps=MAX_EPOCHS, verbose=False)

    def arm_tpe(seed):
        return tpe_vae_search(x_cal, x_val, SPACE, n_trials=N_TRIALS,
                              max_epochs=MAX_EPOCHS, seed=seed,
                              base_config=BASE, n_warmup_steps=5,
                              verbose=False)

    def arm_asha(seed):
        return asha_vae_search(x_cal, x_val, SPACE, n_trials=N_TRIALS,
                               max_epochs=MAX_EPOCHS, reduction=3,
                               seed=seed, base_config=BASE, verbose=False)

    def arm_bohb(seed):
        return bohb_vae_search(x_cal, x_val, SPACE, n_brackets=3,
                               trials_per_bracket=N_TRIALS // 3,
                               max_epochs=MAX_EPOCHS, reduction=3,
                               seed=seed, base_config=BASE, verbose=False)

    all_arms = {"full": ("full-fidelity (TPE sampler, no pruning)",
                         arm_full),
                "tpe": ("TPE + MedianPruner", arm_tpe),
                "asha": ("ASHA (rungs 3/9/27)", arm_asha),
                "bohb": ("BOHB (3 brackets x 6)", arm_bohb)}

    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", nargs="+", default=list(all_arms),
                    choices=list(all_arms))
    ap.add_argument("--seeds", nargs="+", type=int, default=list(SEEDS))
    ap.add_argument("--out", default="out/hpo_shared_protocol.json")
    args = ap.parse_args()

    # append to an existing record so the protocol can run as several
    # invocations (cheap adaptive arms first, the expensive full-fidelity
    # anchor as time allows)
    record = {"seeds": list(SEEDS), "n_trials": N_TRIALS,
              "max_epochs": MAX_EPOCHS, "space": str(SPACE),
              "base": BASE, "results": {}}
    if os.path.exists(args.out):
        with open(args.out) as f:
            record = json.load(f)

    for seed in args.seeds:
        for key in args.arms:
            name, fn = all_arms[key]
            rows = record["results"].setdefault(name, [])
            if any(r["seed"] == seed for r in rows):
                continue
            t0 = time.time()
            out = fn(seed)
            rows.append({"seed": seed,
                         "best_value": float(out["best_value"]),
                         "total_epochs": int(out["total_epochs"]),
                         "wall_s": round(time.time() - t0, 1)})
            print(f"[{name}] seed {seed}: best "
                  f"{rows[-1]['best_value']:.6f}, "
                  f"{rows[-1]['total_epochs']} epochs, "
                  f"{rows[-1]['wall_s']} s", flush=True)
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "w") as f:
                json.dump(record, f, indent=1)

    print(f"\n| arm | best val loss ({len(args.seeds)} seeds) | mean | "
          "epochs | mean % of 486 |")
    print("|---|---|---|---|---|")
    for name, rows in record["results"].items():
        vals = [r["best_value"] for r in rows]
        eps = [r["total_epochs"] for r in rows]
        print(f"| {name} | {', '.join(f'{v:.5f}' for v in vals)} | "
              f"{np.mean(vals):.5f} | {', '.join(str(e) for e in eps)} | "
              f"{np.mean(eps) / (N_TRIALS * MAX_EPOCHS):.0%} |")


if __name__ == "__main__":
    main()
