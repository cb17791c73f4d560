"""Device timing of the stacked multi-class VAE paths (round-3 session-6
additions, docs/BENCHMARKS.md):

1. SCREEN — one vmapped C-class decide per chunk (serving.VAEScorer
   multi-class path) vs the per-class sequential loop it replaces
   (the reference's per-nut-type driver re-runs, vae_bce_nut.py:113-121).
   Device-resident inputs, inner fori_loop with a loop-carried
   perturbation, ALL outputs consumed (the round-3 DCE lesson: summing
   only t2 dead-codes the decode+re-encode Q path).

2. TRAIN — train_vae_classes (C per-class VAEs as ONE vmapped program)
   vs C sequential train_vae runs.  Wall-clock with compile excluded;
   the win is batching + host-boundary amortization, the same lever as
   the fused CV sweep.

Usage: python scripts/probe_stacked_vae.py [--small] [--inner N]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_classes(rng, n_per, length, n_classes):
    t = np.linspace(0, 1, length)
    xs = []
    for c in range(n_classes):
        base = np.sin(2 * np.pi * (3 + c) * t)
        xs.append((rng.normal(1, .08, (n_per, 1)) * base
                   + rng.normal(0, .02, (n_per, length))).astype(np.float32))
    return xs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes on CPU (script self-check)")
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), flush=True)

    from ocm_tpu.models import vae_decision as D
    from ocm_tpu.models.bundle import stack_bundles
    from ocm_tpu.models.trainer import TrainConfig, train_vae
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.models.vaesimca import fit_vaesimca, predict_vaesimca
    from ocm_tpu.utils.sweep import train_vae_classes
    from ocm_tpu.utils.profiling import timeit

    if args.small:
        length, n_per, n_chunk, epochs = 64, 96, 256, 2
        model = ConvVAE1D(input_length=length, latent_dim=4,
                          conv_blocks=2, n_filters=8, hidden_fc=32)
    else:
        length, n_per, n_chunk, epochs = 501, 640, 8192, 10
        model = ConvVAE1D(input_length=length, latent_dim=16,
                          conv_blocks=3, n_filters=32, hidden_fc=256)
    n_classes = 3
    rng = np.random.default_rng(7)
    xs = make_classes(rng, n_per, length, n_classes)
    vals = [x[:64] for x in xs]
    cfg = TrainConfig(epochs=epochs, batch_size=64, lr=1e-3,
                      loss_type="cosine")

    # ------------------------------------------------------------- train
    def run_stacked(seed):
        r = train_vae_classes(model, xs, vals, cfg, jax.random.key(seed))
        jax.block_until_ready(r.final_params)
        return r

    def run_loop(seed):
        rs = [train_vae(model, x, v, cfg, jax.random.key(seed))
              for x, v in zip(xs, vals)]
        jax.block_until_ready([r.final_params for r in rs])
        return rs

    res = run_stacked(0)                                   # compile
    np.asarray(res.val_losses)                             # force fetch
    t0 = time.perf_counter()
    res = run_stacked(1)
    np.asarray(res.val_losses)
    t_stacked = time.perf_counter() - t0

    loop_res = run_loop(0)                                 # compile
    np.asarray(loop_res[0].val_losses)
    t0 = time.perf_counter()
    loop_res = run_loop(1)
    np.asarray(loop_res[-1].val_losses)
    t_loop = time.perf_counter() - t0

    tot_steps = n_classes * epochs * (n_per // cfg.batch_size)
    print(f"train {n_classes} per-class VAEs, {epochs} epochs each "
          f"(L={length}, N={n_per}/class):")
    print(f"  vmapped one-program : {t_stacked*1e3:8.1f} ms "
          f"({tot_steps/t_stacked:.0f} steps/s)")
    print(f"  sequential loop     : {t_loop*1e3:8.1f} ms "
          f"({tot_steps/t_loop:.0f} steps/s)  "
          f"-> {t_loop/t_stacked:.2f}x", flush=True)

    # ------------------------------------------------------------ screen
    bundles = []
    for i in range(n_classes):
        b = jax.tree.map(lambda a: a[i], res.bundle)
        bundles.append(D.fit_thresholds(model, b, xs[i],
                                        loss_type=cfg.loss_type))
    vs_models = [fit_vaesimca(model, b, x)
                 for b, x in zip(bundles, xs)]
    stacked = stack_bundles(bundles)
    stacked_vs = stack_bundles(vs_models)

    x_mix = np.concatenate([make_classes(rng, n_chunk // n_classes + 1,
                                         length, n_classes)[c]
                            for c in range(n_classes)])[:n_chunk]
    xd = jnp.asarray(x_mix)
    inner = args.inner

    def consume(tree):
        return sum(jnp.sum(v) for v in jax.tree.leaves(tree))

    def screen_timer(decide):
        @jax.jit
        def fn(x):
            def body(i, acc):
                # loop-carried single-row rewrite: the network pass cannot
                # be hoisted, and no full-tensor write is added
                xi = x.at[0, 0].set(acc * 1e-20 + 1.0)
                return acc + consume(decide(xi))
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))
        st = timeit(fn, xd, warmup=2, repeats=args.repeats)
        return st["best"] / inner

    for name, one in [
            ("d2", lambda b, xc: D.decide_d2(model, b, xc)._asdict()),
            ("vaesimca", None)]:
        if name == "vaesimca":
            one = lambda b_vm, xc: predict_vaesimca(
                model, b_vm[0], b_vm[1], xc)
            vm = jax.vmap(one, in_axes=((0, 0), None))
            dt_stacked = screen_timer(lambda xc: vm((stacked, stacked_vs),
                                                    xc))
            singles = [lambda xc, b=b, v=v: one((b, v), xc)
                       for b, v in zip(bundles, vs_models)]
        else:
            vm = jax.vmap(one, in_axes=(0, None))
            dt_stacked = screen_timer(lambda xc: vm(stacked, xc))
            singles = [lambda xc, b=b: one(b, xc) for b in bundles]

        def loop_decide(xc):
            return [s(xc) for s in singles]
        dt_loop = screen_timer(loop_decide)
        n_work = n_chunk * n_classes
        print(f"screen[{name}] {n_chunk} spectra x {n_classes} classes:")
        print(f"  stacked vmapped  : {dt_stacked*1e3:7.2f} ms/chunk "
              f"({n_work/dt_stacked/1e6:6.2f} M class-screens/s)")
        print(f"  per-class calls  : {dt_loop*1e3:7.2f} ms/chunk "
              f"({n_work/dt_loop/1e6:6.2f} M class-screens/s)  "
              f"-> {dt_loop/dt_stacked:.2f}x", flush=True)


if __name__ == "__main__":
    main()
