"""Channel-width occupancy probe (companion to probe_train_roofline):
does the train step's %-of-peak rise with conv width?

The roofline probe measures the flagship architecture (n_filters=32,
channels 1->32->64->128) at ~35% of the measured matmul peak.  The
structural explanation is MXU lane occupancy: the MXU is a 128x128
systolic array, and a conv whose channel dims are 1/32/64 wide cannot
fill it regardless of scheduling.  If that is the true ceiling — and
not a fixable scheduling loss — the SAME step at wider channels must
climb toward the peak, and at narrower channels must fall.  This probe
measures exactly that: the full optimizer step at n_filters in
{8, 32, 128}, B=256, f32, slope-timed (see probe_train_roofline's
measurement-discipline note), with FLOPs from the compiled program's
cost_analysis.

Run on the real TPU:  python scripts/probe_conv_width.py
    [--peak-tflops 159.6]

Pass ``--peak-tflops`` from a FULL probe_train_roofline run.  The
built-in quick peak (m=2048, 32-iter chain) carries only ~3.4 ms of
device work per slope point, so +-2 ms tunnel RTT jitter dominates the
difference and the reading is garbage (measured 284 TF/s on a chip
whose full-probe peak is 159.6 — docs/BENCHMARKS.md width-sweep note).
"""

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

from probe_train_roofline import (INNER, compiled_flops, make_scan_steps,
                                  matmul_peaks, per_iter)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--peak-tflops", type=float, default=None,
                    help="measured default-precision matmul peak from a "
                         "full probe_train_roofline run (TF/s)")
    args = ap.parse_args()

    print("backend:", jax.default_backend(), flush=True)
    if args.peak_tflops is not None:
        peaks = {"f32": args.peak_tflops * 1e12}
    else:
        peaks = matmul_peaks(quick=True)   # see docstring: jitter-prone
    print(json.dumps({"peak_f32_tflops": peaks["f32"] / 1e12}), flush=True)

    from ocm_tpu.models.trainer import (TrainConfig, make_train_step,
                                        torch_adam)
    from ocm_tpu.models.vae import ConvVAE1D, init_vae

    length, b = 501, 256
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, length)
    xb = jnp.asarray(
        (rng.normal(1, .08, (b, 1)) * np.sin(2 * np.pi * 3 * t)
         + rng.normal(0, .02, (b, length))).astype(np.float32))
    key = jax.random.key(1)
    cfg = TrainConfig(epochs=1, batch_size=64, lr=1e-3, loss_type="bce")
    tx = torch_adam(cfg.lr)

    for nf in (8, 32, 128):
        model = ConvVAE1D(input_length=length, latent_dim=16,
                          conv_blocks=3, n_filters=nf, hidden_fc=256)
        params, batch_stats = init_vae(model, jax.random.key(0))
        opt_state = tx.init(params)
        step = make_train_step(model, tx, cfg)
        fl = compiled_flops(step, params, batch_stats, opt_state, xb, key)
        dt = per_iter(make_scan_steps(step),
                      (params, batch_stats, opt_state, xb, key), INNER[b])
        print(json.dumps({"n_filters": nf, "ms_per_step": dt * 1e3,
                          "flops_per_step": fl,
                          "achieved_tflops": fl / dt / 1e12,
                          "pct_of_peak": 100.0 * fl / dt / peaks["f32"]}),
              flush=True)


if __name__ == "__main__":
    main()
