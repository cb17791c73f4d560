"""VAE one-class modeling on nut HSI pixel spectra (reference
vae_simca_nuts_peanut.py + vae_bce_nut.py): object-aware splits, BCE or
cosine training on the target nut, f-distance / D^2 decisions.

    python examples/vae_nuts.py [--target peanut --loss-type bce]
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


def main(store_path=None, target="peanut", loss_type="bce", epochs=60,
         batch_size=128, lr=1e-3, latent_dim=16, out_dir="out/vae_nuts",
         seed=42, threshold_on_val=False):
    import jax.numpy as jnp

    from ocm_tpu.models import vae_decision as D
    from ocm_tpu.models.trainer import TrainConfig, train_vae
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.stats.metrics import roc_auc, vae_binary_metrics
    from ocm_tpu.utils.io import save_json
    from ocm_tpu.utils.splits import object_aware_splits

    if store_path:
        from ocm_tpu.utils.io import read_object_store
        data = read_object_store(store_path)
    else:
        import _synthetic
        data = _synthetic.nut_objects()
    nut_types = list(data)
    if target not in nut_types:
        raise ValueError(f"target {target!r} not in {nut_types}")
    n_wavelengths = np.asarray(
        data[target][0]["spectral_data"]
        if isinstance(data[target][0], dict) else data[target][0]).shape[1]

    res = object_aware_splits(data, nut_types, target, n_wavelengths,
                              verbose=False)
    model = ConvVAE1D(input_length=n_wavelengths, latent_dim=latent_dim,
                      conv_blocks=3, n_filters=32, hidden_fc=128)
    cfg = TrainConfig(epochs=epochs, batch_size=batch_size, lr=lr,
                      loss_type=loss_type)
    result = train_vae(model, res.x_cal, res.x_val, cfg, jax.random.key(seed))
    bundle = D.fit_thresholds(
        model, result.bundle, res.x_cal, loss_type=loss_type,
        # corrective option: percentile thresholds from held-out objects so
        # they transfer to unseen objects (docs/QUALITY.md)
        x_threshold=res.x_val if threshold_on_val else None)

    x_ts = jnp.asarray(res.x_test)
    dec_f = D.decide_f(model, bundle, x_ts)
    dec_d2 = D.decide_d2(model, bundle, x_ts)
    y_bin = res.y_test  # 0 = target, 1 = other

    out = {}
    for name, dec in [("f", dec_f), ("d2", dec_d2)]:
        pred = np.where(np.asarray(dec.accept), 0, 1)
        m = vae_binary_metrics(jnp.asarray(pred), jnp.asarray(y_bin), 2)
        out[name] = {"accuracy": float(m.accuracy), "f1": float(m.f1),
                     "recall": float(m.recall),
                     "precision": float(m.precision)}
    # ROC-AUC of the f-distance as anomaly score (optim_bce_nuts.py:241)
    out["roc_auc_f"] = float(roc_auc(jnp.asarray(y_bin),
                                     jnp.asarray(dec_f.q + dec_f.d2)))

    os.makedirs(out_dir, exist_ok=True)
    save_json(out, out_dir, "metrics.json")
    print(target, out)
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--store-path", default=None)
    p.add_argument("--target", default="peanut")
    p.add_argument("--loss-type", default="bce",
                   choices=["cosine", "bce", "euclidean", "bce_prob"])
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--latent-dim", type=int, default=16)
    p.add_argument("--out-dir", default="out/vae_nuts")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--threshold-on-val", action="store_true")
    main(**vars(p.parse_args()))
