"""VAE one-class modeling on cheese FTIR with all five decision variants
(reference drivers D5-D10: VAE_SIMCA.py, utils/new_vae_simca*.py,
utils/final_vaesimca.py, vae_simca_bce.py).

Trains the canonical ConvVAE1D on the target class only, fits thresholds on
calibration, then evaluates every decision rule of SURVEY.md section 2.3:

  d2        latent Mahalanobis percentile      (new_vae_simca.py:456)
  d2_q      D^2 AND spectral Q                  (new_vae_simca_Q.py:502-503)
  f         compute_q_h_f full distance        (vae_simca_bce.py:438-452)
  full      final_vaesimca f vs chi2           (final_vaesimca.py:511-533)
  vaesimca  latent-SIMCA T2+Q limits           (VAE_SIMCA.py:348-382)

Artifacts per run: params.json, losses.json, metrics.json, loss curves,
serialized model bundle.

    python examples/vae_simca_cheese.py [--loss-type cosine --epochs 200]
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


def main(loss_type="cosine", epochs=100, batch_size=64, lr=1e-3,
         weight_decay=0.0, beta=1.0, latent_dim=16, conv_blocks=3,
         n_filters=32, hidden_fc=256, target_class=0, seed=42,
         out_dir="out/vae_simca_cheese"):
    import jax.numpy as jnp

    from ocm_tpu.models import vae_decision as D
    from ocm_tpu.models.bundle import save_bundle
    from ocm_tpu.models.trainer import TrainConfig, train_vae
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.models.vaesimca import VAESIMCA
    from ocm_tpu.stats.metrics import vae_binary_metrics
    from ocm_tpu.utils.io import save_json
    from ocm_tpu.utils.report import plot_losses

    import _synthetic

    x_tr, y_tr, x_ts, y_ts = _synthetic.cheese_like(seed=seed)
    x_cls = x_tr[y_tr == target_class]
    n_val = max(len(x_cls) // 6, 8)
    x_cal, x_val = x_cls[:-n_val], x_cls[-n_val:]
    y_bin = np.where(y_ts == target_class, 0, 1)
    n_true = int(np.max(y_ts)) + 1

    model = ConvVAE1D(input_length=x_tr.shape[1], latent_dim=latent_dim,
                      conv_blocks=conv_blocks, n_filters=n_filters,
                      hidden_fc=hidden_fc)
    cfg = TrainConfig(epochs=epochs, batch_size=batch_size, lr=lr,
                      weight_decay=weight_decay, beta=beta,
                      loss_type=loss_type)
    result = train_vae(model, x_cal, x_val, cfg, jax.random.key(seed))
    bundle = D.fit_thresholds(model, result.bundle, x_cal,
                              loss_type=loss_type)

    def binary_metrics(accept):
        pred = np.where(np.asarray(accept), 0, 1)
        m = vae_binary_metrics(jnp.asarray(pred),
                               jnp.asarray(np.where(y_ts == target_class, 0,
                                                    np.maximum(y_ts, 1))),
                               n_true)
        return {"accuracy": float(m.accuracy),
                "precision": float(m.precision),
                "recall": float(m.recall), "f1": float(m.f1),
                "mean_false_acceptance": float(m.mean_false_acceptance)}

    x_ts_j = jnp.asarray(x_ts)
    # corrected f/full decisions freeze their statistics on calibration
    # (quirks Q3/Q4 produce nearly-vacuous batch-relative rules on test
    # sets dominated by anomalies — reproduced under the plain keys)
    from ocm_tpu.models.bundle import decode, encode, standardize
    from ocm_tpu.stats.qhf import qhf_fit

    x_cal_j = jnp.asarray(x_cal)
    mu_cal, _ = encode(model, bundle, x_cal_j)
    x_rec_cal = decode(model, bundle, mu_cal)
    calib = qhf_fit(standardize(bundle, x_cal_j),
                    standardize(bundle, x_rec_cal), mu_cal)
    q_cal, _, _ = D.reconstruction_errors(model, bundle, x_cal_j,
                                          "euclidean")
    h_cal = jnp.sum((mu_cal - bundle.latent_mean) ** 2, axis=1)
    frozen_moments = (jnp.mean(h_cal), jnp.std(h_cal),
                      jnp.mean(q_cal), jnp.std(q_cal))

    metrics = {
        "d2": binary_metrics(D.decide_d2(model, bundle, x_ts_j).accept),
        "d2_q": binary_metrics(
            D.decide_d2_q(model, bundle, x_ts_j, loss_type).accept),
        "f": binary_metrics(D.decide_f(model, bundle, x_ts_j).accept),
        "f_corrected": binary_metrics(
            D.decide_f(model, bundle, x_ts_j, calibration=calib).accept),
        "full": binary_metrics(
            D.decide_full_distance(model, bundle, x_ts_j).accept),
        "full_corrected": binary_metrics(
            D.decide_full_distance(model, bundle, x_ts_j,
                                   moments=frozen_moments).accept),
    }
    vs = VAESIMCA(model, bundle, type="alt").fit_thresholds(x_cal)
    acc, _, _ = vs.predict(x_ts)
    metrics["vaesimca"] = binary_metrics(acc)

    os.makedirs(out_dir, exist_ok=True)
    save_json({"loss_type": loss_type, "epochs": epochs, "lr": lr,
               "weight_decay": weight_decay, "beta": beta,
               "latent_dim": latent_dim, "conv_blocks": conv_blocks,
               "n_filters": n_filters, "hidden_fc": hidden_fc},
              out_dir, "params.json")
    save_json({"train_losses": np.asarray(result.train_losses),
               "val_losses": np.asarray(result.val_losses),
               "best_epoch": int(result.best_epoch)}, out_dir, "losses.json")
    save_json(metrics, out_dir, "metrics.json")
    save_bundle(os.path.join(out_dir, "model_bundle.msgpack"), bundle)
    plot_losses(np.asarray(result.train_losses),
                np.asarray(result.val_losses),
                best_epoch=int(result.best_epoch),
                save_path=os.path.join(out_dir, "losses.png"))
    for name, m in metrics.items():
        print(f"{name:9s} acc={m['accuracy']:.3f} f1={m['f1']:.3f} "
              f"mFA={m['mean_false_acceptance']:.3f}")
    return metrics


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--loss-type", default="cosine",
                   choices=["cosine", "bce", "euclidean", "bce_prob"])
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--latent-dim", type=int, default=16)
    p.add_argument("--conv-blocks", type=int, default=3)
    p.add_argument("--n-filters", type=int, default=32)
    p.add_argument("--hidden-fc", type=int, default=256)
    p.add_argument("--target-class", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out-dir", default="out/vae_simca_cheese")
    main(**vars(p.parse_args()))
