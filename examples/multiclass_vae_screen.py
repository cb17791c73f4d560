"""Multi-class VAE screening: one stacked compiled program for all classes.

The reference screens multiple nut types by re-running its whole driver per
type — one VAE trained and scored per class, sequentially
(vae_bce_nut.py:113-121; vae_simca_nuts_peanut.py is a single-type clone).
Here the per-class models are fitted independently (same architecture),
stacked into one pytree (models.bundle.stack_bundles), and the mixed test
set is screened against ALL classes by a single resident scorer — one
dispatch and one host->device transfer per chunk instead of C of each
(serving.VAEScorer multi-class path; parity with per-class scorers is
asserted in tests/test_serving.py).

    python examples/multiclass_vae_screen.py [--epochs 8 --variant d2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__))
                if "__file__" in globals() else os.getcwd())
import _bootstrap  # noqa: E402,F401  repo root on sys.path + TPU-outage CPU fallback

import jax
import numpy as np


def main(epochs=8, variant="d2", latent_dim=6, chunk_size=2048, seed=42):
    import jax.numpy as jnp

    import _synthetic
    from ocm_tpu.models import vae_decision as D
    from ocm_tpu.models.bundle import stack_bundles
    from ocm_tpu.models.trainer import TrainConfig
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.models.vaesimca import fit_vaesimca
    from ocm_tpu.serving import VAEScorer
    from ocm_tpu.utils.splits import object_aware_splits

    data = _synthetic.nut_objects(seed=seed)
    nut_types = list(data)
    length = data[nut_types[0]][0].shape[1]
    model = ConvVAE1D(input_length=length, latent_dim=latent_dim,
                      conv_blocks=2, n_filters=16, hidden_fc=64)
    cfg = TrainConfig(epochs=epochs, batch_size=64, lr=1e-3,
                      loss_type="euclidean")

    # one VAE per class, ALL classes trained in one vmapped program
    # (utils.sweep.train_vae_classes — the class axis replaces the
    # reference's sequential per-type driver runs; unequal class sizes
    # cyclic-pad to the largest) --------------------------------------
    from ocm_tpu.utils.sweep import train_vae_classes

    splits = [object_aware_splits(data, nut_types, nut, length,
                                  verbose=False) for nut in nut_types]
    res = train_vae_classes(model, [s.x_cal for s in splits],
                            [s.x_val for s in splits], cfg,
                            jax.random.key(seed))
    bundles, vs_models, tests = [], [], []
    for i, nut in enumerate(nut_types):
        b = jax.tree.map(lambda a: a[i], res.bundle)
        b = D.fit_thresholds(model, b, splits[i].x_cal,
                             loss_type=cfg.loss_type)
        bundles.append(b)
        vs_models.append(fit_vaesimca(model, b, splits[i].x_cal))
        # the class's OWN held-out test objects (x_test is the global
        # all-class set, identical across splits — concatenating it per
        # class would screen C duplicate copies of every spectrum)
        tests.append(np.asarray(splits[i].x_test_in, np.float32))
        best = float(np.asarray(res.val_losses)[
            i, int(np.asarray(res.best_epoch)[i])])
        print(f"[fit] {nut}: cal={splits[i].x_cal.shape[0]} "
              f"best val={best:.5f}")

    x_mix = np.concatenate(tests)
    stacked = stack_bundles(bundles)
    kw = dict(variant=variant, loss_type=cfg.loss_type,
              chunk_size=chunk_size)
    if variant == "vaesimca":
        kw["vaesimca_model"] = stack_bundles(vs_models)

    scorer = VAEScorer(model, stacked, **kw)
    out = scorer.score(x_mix)                      # warm (compile included)
    t0 = time.perf_counter()
    out = scorer.score(x_mix)
    t_stacked = time.perf_counter() - t0

    # the per-class loop the stacked path replaces ------------------------
    single = []
    for i, nut in enumerate(nut_types):
        skw = dict(kw)
        if variant == "vaesimca":
            skw["vaesimca_model"] = vs_models[i]
        single.append(VAEScorer(model, bundles[i], **skw))
    for s in single:
        s.score(x_mix)                             # warm
    t0 = time.perf_counter()
    ref = [s.score(x_mix) for s in single]
    t_loop = time.perf_counter() - t0

    agree = np.mean([np.mean(out["accept"][:, c] == ref[c]["accept"])
                     for c in range(len(nut_types))])
    print(f"\nscreen {x_mix.shape[0]} spectra x {len(nut_types)} classes "
          f"(variant={variant}):")
    print(f"  stacked one-program : {t_stacked * 1e3:8.1f} ms")
    print(f"  per-class loop      : {t_loop * 1e3:8.1f} ms  "
          f"({t_loop / t_stacked:.2f}x)")
    if jax.default_backend() == "cpu":
        print("  (CPU note: the stacked win is dispatch/H2D amortization "
              "on accelerators — C round trips become 1 per chunk; on CPU "
              "there is no dispatch latency so the two run about even. "
              "The class axis lowers through lax.map — sequential dense "
              "network passes in one program; a vmapped class axis would "
              "pay a measured 1.7x grouped-conv penalty on the MXU, see "
              "docs/BENCHMARKS.md 'Stacked multi-class VAE paths')")
    print(f"  decision agreement  : {agree:.4f}")
    accept_rate = np.asarray(out["accept"]).mean(axis=0)
    for nut, rate in zip(nut_types, accept_rate):
        print(f"  acceptance[{nut:>8s}] = {rate:.3f}")
    assert agree >= 0.99, f"stacked screen diverged from per-class: {agree}"
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--variant", default="d2",
                    choices=["d2", "d2_q", "f", "full", "vaesimca"])
    ap.add_argument("--latent-dim", type=int, default=6)
    ap.add_argument("--chunk-size", type=int, default=2048)
    args = ap.parse_args()
    main(epochs=args.epochs, variant=args.variant,
         latent_dim=args.latent_dim, chunk_size=args.chunk_size)
