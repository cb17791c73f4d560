"""The whole framework end to end — every stage a reference user strings
together across separate scripts (nut_data.py -> data_utils ->
simca_nuts.py -> optim_bce_nuts.py -> vae_bce_nut.py -> ad-hoc serving),
as ONE pipeline on synthetic SWIR data:

1. HSI ingest: synthetic cubes -> background masking + connected-component
   object extraction -> HDF5 object store (reference nut_data.py / C15).
2. Object-aware cal/val/test splits with outlier removal (C10) + SNV+SavGol.
3. Classical multi-class SIMCA: CV LV-selection sweep for the target
   (rsvd solver — the production fit), all-class batched fit, fused
   multi-class test screen (C1/C7/C8).
4. Deep one-class: BOHB HPO (TPE-sampled brackets of vmapped successive
   halving) -> best β-VAE -> latent-D² decision on the test stream
   (reference optim_bce_nuts.py capability, dependency-free).
5. Deploy: msgpack OCMBundle + reference-format torch .pth export +
   resident SIMCAScorer / VAEScorer screens (serving layer).

    python examples/full_pipeline.py [--quick] [--target peanut]

Every stage prints its result; a JSON summary lands in --out-dir.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__))
                if "__file__" in globals() else os.getcwd())
import _bootstrap  # noqa: E402,F401  repo root on sys.path + TPU-outage CPU fallback

import jax
import jax.numpy as jnp
import numpy as np


def stage_ingest(out_dir, n_images):
    """Cubes -> object store -> object_aware_splits input shape."""
    import _synthetic
    from ocm_tpu.utils.io import (extract_objects, read_object_store,
                                  write_object_store)

    store = {}
    for i, nut in enumerate(_synthetic.NUT_TYPES):
        store[nut] = [extract_objects(
            _synthetic.nut_cube(seed=100 * i + img, nut_idx=i),
            background_threshold=0.1, min_pixels=4)
            for img in range(n_images)]
    path = os.path.join(out_dir, "nuts.h5")
    write_object_store(path, store)
    data = read_object_store(path)
    n_objects = {c: len(v) for c, v in data.items()}
    print(f"[1 ingest] {path}: objects per class {n_objects}")
    return data


def stage_splits(data, target):
    from ocm_tpu.ops.preprocess import snv_savgol
    from ocm_tpu.utils.splits import object_aware_splits

    nut_types = list(data)
    length = next(np.asarray(o["spectral_data"]).shape[1]
                  for objs in data.values() for o in objs)
    res = object_aware_splits(data, nut_types, target, length,
                              verbose=False)
    prep = lambda a: np.asarray(snv_savgol(jnp.asarray(a), 5, 2, 1))
    print(f"[2 splits] target={target}: cal {res.x_cal.shape} "
          f"val {res.x_val.shape} test {res.x_test.shape} "
          f"({int(np.sum(res.y_test == 0))} in / "
          f"{int(np.sum(res.y_test == 1))} out)")
    return res, prep, nut_types, length


def stage_classical(data, res, prep, nut_types, target, lv_max, out_dir):
    """CV LV selection (rsvd) for the target, then a fused multi-class
    screen of the global test set through the serving layer."""
    from ocm_tpu.models.cv import cv_simca_sweep
    from ocm_tpu.models.simca import fit_classes
    from ocm_tpu.serving import SIMCAScorer
    from ocm_tpu.stats.metrics import conformity_metrics

    # per-class calibration spectra (preprocessed) for the batched fit;
    # the target class's split was already computed by stage_splits
    from ocm_tpu.utils.splits import object_aware_splits
    length = res.x_cal.shape[1]
    cal_x, cal_y = [], []
    for ci, cls in enumerate(nut_types):
        xc = res.x_cal if cls == target else object_aware_splits(
            data, nut_types, cls, length, verbose=False).x_cal
        cal_x.append(prep(xc))
        cal_y.append(np.full(xc.shape[0], ci, dtype=int))
    x_all = np.concatenate(cal_x)
    y_all = np.concatenate(cal_y)

    # LV selection for the target class: one jitted (fold x LV) sweep
    ti = nut_types.index(target)
    lvs = list(range(1, lv_max + 1))
    sweep = cv_simca_sweep(x_all, y_all, ti, lvs, n_splits=5,
                           solver="rsvd")
    best_lv = lvs[int(np.argmax(sweep["eff"]))]
    print(f"[3 classical] CV eff by LV {np.round(sweep['eff'], 3)} "
          f"-> best LV {best_lv}")

    # batched all-class fit + fused multi-class serving screen
    models = fit_classes(x_all, y_all, list(range(len(nut_types))),
                         n_components=best_lv, solver="rsvd")
    scorer = SIMCAScorer(models, decision_type="alt")
    x_test = prep(res.x_test)
    out = scorer.score(x_test)
    accept_t = np.asarray(out["accept"])[:, ti].astype(np.int32)
    # y_test: 0 = target, 1 = other -> in-class truth is class_index 0
    m = conformity_metrics(jnp.asarray(res.y_test),
                           jnp.asarray(accept_t), class_index=0)
    metrics = {"best_lv": best_lv,
               "sensitivity": float(m.sensitivity),
               "specificity": float(m.specificity),
               "efficiency": float(m.efficiency)}
    print(f"[3 classical] fused {len(nut_types)}-class screen: "
          f"sens={metrics['sensitivity']:.2f} "
          f"spec={metrics['specificity']:.2f} "
          f"eff={metrics['efficiency']:.2f}")
    return metrics


def stage_vae(res, target, quick, seed, out_dir):
    """BOHB HPO -> best bundle -> latent-D² decision quality."""
    from ocm_tpu.models import vae_decision as D
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.stats.metrics import vae_binary_metrics
    from ocm_tpu.utils.tpe import bohb_vae_search

    space = {"lr": ("loguniform", 1e-4, 1e-2),
             "beta": ("loguniform", 1e-3, 1.0)}
    base = {"latent_dim": 8, "conv_blocks": 2, "n_filters": 8,
            "hidden_fc": 32, "batch_size": 64, "loss_type": "bce"}
    brackets, per, epochs = (2, 4, 9) if quick else (3, 9, 27)
    out = bohb_vae_search(res.x_cal, res.x_val, space,
                          n_brackets=brackets, trials_per_bracket=per,
                          max_epochs=epochs, reduction=3, seed=seed,
                          base_config=base, verbose=False)
    cfg = out["best_config"]
    model = ConvVAE1D(input_length=res.x_cal.shape[1],
                      latent_dim=int(cfg["latent_dim"]),
                      conv_blocks=int(cfg["conv_blocks"]),
                      n_filters=int(cfg["n_filters"]),
                      hidden_fc=int(cfg["hidden_fc"]))
    b = D.fit_thresholds(model, out["best_bundle"], res.x_cal,
                         loss_type="bce")
    dec = D.decide_d2(model, b, jnp.asarray(res.x_test))
    pred = np.where(np.asarray(dec.accept), 0, 1)
    m = vae_binary_metrics(jnp.asarray(pred), jnp.asarray(res.y_test), 2)
    metrics = {"best_val_loss": float(out["best_value"]),
               "hpo_epochs": int(out["total_epochs"]),
               "hpo_epochs_full_fidelity": brackets * per * epochs,
               "test_accuracy": float(m.accuracy),
               "config": {k: (float(v) if isinstance(v, float) else v)
                          for k, v in cfg.items()}}
    print(f"[4 vae] BOHB best val {metrics['best_val_loss']:.5f} in "
          f"{metrics['hpo_epochs']}/{metrics['hpo_epochs_full_fidelity']} "
          f"epochs; latent-D² test accuracy "
          f"{metrics['test_accuracy']:.3f}")
    return model, b, metrics


def stage_deploy(model, bundle, res, out_dir):
    """Persist both formats and run the resident serving screen."""
    from ocm_tpu.models.bundle import save_bundle
    from ocm_tpu.serving import VAEScorer

    bundle_path = os.path.join(out_dir, "vae_bundle.msgpack")
    save_bundle(bundle_path, bundle)
    paths = {"bundle": bundle_path}
    try:
        from ocm_tpu.models.torch_export import save_torch_checkpoint
        pth = os.path.join(out_dir, "vae_reference_format.pth")
        save_torch_checkpoint(pth, bundle, model)
        paths["torch_pth"] = pth
    except ImportError:                      # torch not installed
        paths["torch_pth"] = None
    scorer = VAEScorer(model, bundle, variant="d2", chunk_size=4096)
    out = scorer.score(res.x_test)
    n_acc = int(np.asarray(out["accept"]).sum())
    print(f"[5 deploy] {paths}; resident VAEScorer accepted "
          f"{n_acc}/{res.x_test.shape[0]} of the test stream")
    return paths


def main(target="peanut", quick=False, seed=11, lv_max=8,
         out_dir="out/full_pipeline", n_images=2):
    os.makedirs(out_dir, exist_ok=True)
    from ocm_tpu.utils.io import save_json

    data = stage_ingest(out_dir, n_images)
    res, prep, nut_types, length = stage_splits(data, target)
    classical = stage_classical(data, res, prep, nut_types, target,
                                lv_max, out_dir)
    model, bundle, vae_metrics = stage_vae(res, target, quick, seed,
                                           out_dir)
    paths = stage_deploy(model, bundle, res, out_dir)
    summary = {"target": target, "classical": classical,
               "vae": vae_metrics, "artifacts": paths}
    save_json(summary, out_dir, "pipeline_summary.json")
    print(f"[done] summary -> {out_dir}/pipeline_summary.json")
    return summary


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target", default="peanut")
    p.add_argument("--quick", action="store_true",
                   help="small HPO budget (2 brackets x 4 trials x 9 ep)")
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--lv-max", type=int, default=8)
    p.add_argument("--out-dir", default="out/full_pipeline")
    p.add_argument("--n-images", type=int, default=2)
    main(**vars(p.parse_args()))
