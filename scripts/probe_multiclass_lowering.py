"""vmap vs lax.map vs unrolled-loop lowering of the multi-class VAE
screen (one jit, device-resident chunk).

probe_stacked_vae.py measured the vmapped class axis 1.6-1.7x SLOWER on
device than sequential per-class networks in the same jit: vmap turns
the per-class convs into grouped convolutions, which the MXU tiles
poorly (the same feature-group dim GSPMD refuses to split —
parallel/sweep_dist.py).  This probe picks the lowering for
serving.VAEScorer's multi-class decide.

Usage: python scripts/probe_multiclass_lowering.py [--small]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--inner", type=int, default=8)
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
    from ocm_tpu.utils.profiling import timeit

    if args.small:
        length, n_chunk = 64, 256
        model = ConvVAE1D(input_length=length, latent_dim=4,
                          conv_blocks=2, n_filters=8, hidden_fc=32)
    else:
        length, n_chunk = 501, 8192
        model = ConvVAE1D(input_length=length, latent_dim=16,
                          conv_blocks=3, n_filters=32, hidden_fc=256)
    n_classes = 3
    rng = np.random.default_rng(11)
    t = np.linspace(0, 1, length)
    bundles = []
    for c in range(n_classes):
        x = (rng.normal(1, .08, (256, 1)) * np.sin(2 * np.pi * (3 + c) * t)
             + rng.normal(0, .02, (256, length))).astype(np.float32)
        r = train_vae(model, x, x[:64],
                      TrainConfig(epochs=2, batch_size=64,
                                  loss_type="cosine"),
                      jax.random.key(c))
        bundles.append(D.fit_thresholds(model, r.bundle, x,
                                        loss_type="cosine"))
    stacked = stack_bundles(bundles)
    xd = jnp.asarray((rng.normal(1, .1, (n_chunk, 1))
                      * np.sin(2 * np.pi * 3 * t)
                      + rng.normal(0, .05, (n_chunk, length))
                      ).astype(np.float32))
    inner = args.inner

    one = lambda b, xc: D.decide_d2(model, b, xc)._asdict()

    def timed(name, decide):
        @jax.jit
        def fn(x):
            def body(i, acc):
                xi = x.at[0, 0].set(acc * 1e-20 + 1.0)
                out = decide(xi)
                return acc + sum(jnp.sum(v) for v in jax.tree.leaves(out))
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))
        st = timeit(fn, xd, warmup=2, repeats=5)
        print(f"{name:10s} {st['best']/inner*1e3:7.2f} ms/chunk",
              flush=True)
        return st["best"] / inner

    timed("vmap", lambda xc: jax.vmap(one, in_axes=(0, None))(stacked, xc))
    timed("lax.map", lambda xc: jax.lax.map(lambda b: one(b, xc), stacked))
    timed("unrolled", lambda xc: jax.tree.map(
        lambda *ls: jnp.stack(ls),
        *[one(jax.tree.map(lambda a, i=i: a[i], stacked), xc)
          for i in range(n_classes)]))

    # parity of the three lowerings
    f_v = jax.jit(lambda xc: jax.vmap(one, (0, None))(stacked, xc))
    f_m = jax.jit(lambda xc: jax.lax.map(lambda b: one(b, xc), stacked))
    a, b = f_v(xd), f_m(xd)
    agree = np.mean(np.asarray(a["accept"]) == np.asarray(b["accept"]))
    print(f"vmap-vs-map accept agreement: {agree:.4f}")


if __name__ == "__main__":
    main()
