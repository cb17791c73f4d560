"""VAE hyperparameter sweeps, two ways (reference VAE_SIMCA.py:436-470,
utils/final_vaesimca.py:267-322):

1. ``--mode runner``: the resumable artifact-writing grid runner (one run
   dir per config with params/losses/metrics JSON; re-running skips
   completed runs).
2. ``--mode vmapped``: all same-architecture configs trained SIMULTANEOUSLY
   in one jitted program — the config axis is a vmap batch dimension
   (BASELINE.json config 5).
3. ``--mode sharded``: the same config batch with its axis SHARDED over a
   device mesh — distinct configs on distinct chips
   (parallel.sweep_dist; runs on the virtual CPU mesh via
   JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8).

    python examples/sweep_vae.py --mode vmapped
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


def main(mode="vmapped", epochs=20, out_dir="out/sweep_vae", seed=42):
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.utils.sweep import (grid_product, run_vae_sweep,
                                     train_vae_vmapped)

    import _synthetic

    x_tr, y_tr, x_ts, y_ts = _synthetic.cheese_like(seed=seed)
    x_cls = x_tr[y_tr == 0]
    n_val = max(len(x_cls) // 6, 8)
    x_cal, x_val = x_cls[:-n_val], x_cls[-n_val:]
    y_bin = np.where(y_ts == 0, 0, np.maximum(y_ts, 1))

    if mode == "runner":
        configs = grid_product(
            {"epochs": epochs, "batch_size": 64, "latent_dim": 8,
             "conv_blocks": 2, "n_filters": 16, "hidden_fc": 64,
             "loss_type": "cosine"},
            {"lr": [1e-3, 3e-3], "beta": [0.1, 1.0]})
        results = run_vae_sweep(configs, x_cal, x_val, x_ts, y_bin, out_dir)
        best = max(results, key=lambda r: r["accuracy"])
        print("best:", best)
        return results

    # vmapped: one compile, len(lrs) simultaneous trajectories
    model = ConvVAE1D(input_length=x_tr.shape[1], latent_dim=8,
                      conv_blocks=2, n_filters=16, hidden_fc=64)
    lrs = [1e-3, 3e-3, 1e-2, 3e-4]
    if mode == "sharded":
        from ocm_tpu.parallel.mesh import make_mesh
        from ocm_tpu.parallel.sweep_dist import train_vae_vmapped_sharded

        mesh = make_mesh((jax.device_count(),), ("model",))
        res = train_vae_vmapped_sharded(
            model, x_cal, x_val, lrs, [0.0] * 4, [1.0, 1.0, 0.1, 0.1],
            mesh, epochs=epochs, batch_size=64, loss_type="cosine",
            rng=jax.random.key(seed))
    else:
        res = train_vae_vmapped(model, x_cal, x_val,
                                lrs=lrs, weight_decays=[0.0] * 4,
                                betas=[1.0, 1.0, 0.1, 0.1],
                                epochs=epochs, batch_size=64,
                                loss_type="cosine", rng=jax.random.key(seed))
    vl = np.asarray(res.val_losses)  # (4, epochs)
    per_cfg = np.where(np.isfinite(vl), vl, np.inf).min(axis=1)
    best = int(np.argmin(per_cfg))         # a diverged (NaN) config never wins
    print("per-config best val loss:", np.round(per_cfg, 4),
          "-> best config", best, f"(lr={lrs[best]})")
    return res


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="vmapped",
                   choices=["runner", "vmapped", "sharded"])
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--out-dir", default="out/sweep_vae")
    p.add_argument("--seed", type=int, default=42)
    main(**vars(p.parse_args()))
