"""Data-parallel VAE training over a device mesh.

The reference trains on exactly one device (SURVEY.md section 2.5).  Here the
minibatch shards across chips on the ``'data'`` axis under ``shard_map``:
each chip runs the forward/backward on its shard, gradients (and the scalar
losses) reduce with ``psum`` over ICI, the optimizer update happens
replicated.  BatchNorm uses cross-replica statistics via the same axis name
(ConvVAE1D.bn_axis_name), so training is numerically equivalent to
single-chip large-batch training — not an approximation.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ocm_tpu.models.trainer import TrainConfig
from ocm_tpu.models.vae import ConvVAE1D, beta_vae_loss
from ocm_tpu.parallel.mesh import DATA_AXIS


def make_dp_train_step(model: ConvVAE1D, tx, cfg: TrainConfig, mesh: Mesh,
                       axis: str = DATA_AXIS):
    """Build a jitted data-parallel train step.

    ``model`` must be constructed with ``bn_axis_name=axis`` when BatchNorm
    is enabled, so batch statistics sync across shards.  The returned step
    takes (params, batch_stats, opt_state, xb_std, rng) with ``xb_std``
    sharded on its sample axis and everything else replicated.
    """

    def local_step(params, batch_stats, opt_state, xb, rng):
        n_local = xb.shape[0]
        n_global = jax.lax.psum(n_local, axis)

        def loss_fn(p):
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out, mutated = model.apply(
                variables, xb, train=True,
                rngs={"reparam": jax.random.fold_in(
                          rng, jax.lax.axis_index(axis)),
                      "dropout": jax.random.fold_in(
                          rng, jax.lax.axis_index(axis) + 65536)},
                mutable=["batch_stats"] if batch_stats else [])
            x_rec, mu, logvar = out
            total, recon, kl = beta_vae_loss(xb, x_rec, mu, logvar,
                                             beta=cfg.beta,
                                             loss_type=cfg.loss_type)
            new_bs = (mutated.get("batch_stats", batch_stats)
                      if batch_stats else batch_stats)
            return total, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn,
                                                   has_aux=True)(params)
        # mean-of-means == global mean for equal shards; weight by shard size
        scale = n_local / n_global
        grads = jax.tree.map(lambda g: jax.lax.psum(g * scale, axis), grads)
        loss = jax.lax.psum(loss * scale, axis)
        # batch_stats from BN are already cross-replica (axis_name) — every
        # shard holds identical values; keep one replicated copy.
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    rep = P()
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(rep, rep, rep, P(axis), rep),
        out_specs=(rep, rep, rep, rep),
        check_vma=False)
    return jax.jit(step)


def make_dp_eval_loss(model: ConvVAE1D, cfg: TrainConfig, mesh: Mesh,
                      axis: str = DATA_AXIS):
    """Sharded validation loss (stochastic forward, replicated scalar out)."""

    def local_eval(params, batch_stats, xb, rng):
        n_local = xb.shape[0]
        n_global = jax.lax.psum(n_local, axis)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        x_rec, mu, logvar = model.apply(
            variables, xb, train=False,
            rngs={"reparam": jax.random.fold_in(
                rng, jax.lax.axis_index(axis))})
        total, _, _ = beta_vae_loss(xb, x_rec, mu, logvar, beta=cfg.beta,
                                    loss_type=cfg.loss_type)
        return jax.lax.psum(total * (n_local / n_global), axis)

    rep = P()
    fn = shard_map(local_eval, mesh=mesh,
                   in_specs=(rep, rep, P(axis), rep), out_specs=rep,
                   check_vma=False)
    return jax.jit(fn)


def train_vae_dp(model: ConvVAE1D, x_cal, x_val, cfg: TrainConfig,
                 rng: jax.Array, mesh: Mesh, axis: str = DATA_AXIS,
                 spec_stats=None):
    """Full data-parallel training run (the sharded twin of
    ocm_tpu.models.trainer.train_vae): dataset resident sharded in HBM,
    epochs host-stepped, per-epoch shuffling with a replicated permutation.

    Batches are global: each step consumes ``cfg.batch_size`` samples split
    evenly across the mesh (cfg.batch_size must divide by the axis size).
    Returns (bundle, train_losses, val_losses, best_epoch).
    """
    import numpy as np

    from ocm_tpu.models.bundle import new_bundle, spectral_stats
    from ocm_tpu.models.trainer import torch_adam
    from ocm_tpu.models.vae import init_vae
    from ocm_tpu.parallel.mesh import pad_to_multiple, shard_batch

    n_shards = mesh.shape[axis]
    if cfg.batch_size % n_shards:
        raise ValueError(f"batch_size {cfg.batch_size} not divisible by "
                         f"mesh axis size {n_shards}")

    x_cal = np.asarray(x_cal)
    if spec_stats is None:
        mean, std = spectral_stats(x_cal)
    else:
        mean, std = spec_stats
    xc_std = (x_cal - mean) / std
    xv_std, _ = pad_to_multiple((np.asarray(x_val) - mean) / std, n_shards)
    xv_std = shard_batch(jnp.asarray(xv_std, jnp.float32), mesh, axis)

    init_rng, train_rng = jax.random.split(rng)
    params, batch_stats = init_vae(model, init_rng)
    tx = torch_adam(cfg.lr, cfg.weight_decay)
    opt_state = tx.init(params)
    step_fn = make_dp_train_step(model, tx, cfg, mesh, axis)
    eval_fn = make_dp_eval_loss(model, cfg, mesh, axis)

    n = xc_std.shape[0]
    bs = min(cfg.batch_size, (n // n_shards) * n_shards)
    bs = max(bs, n_shards)
    steps = max(n // bs, 1)

    best = (np.inf, params, batch_stats, 0)
    train_losses, val_losses = [], []
    for epoch in range(cfg.epochs):
        ep_rng = jax.random.fold_in(train_rng, epoch)
        perm = np.asarray(jax.random.permutation(
            jax.random.fold_in(ep_rng, 0), n))
        ep_loss = 0.0
        for si in range(steps):
            xb = jnp.asarray(xc_std[perm[si * bs:(si + 1) * bs]],
                             jnp.float32)
            xb = shard_batch(xb, mesh, axis)
            params, batch_stats, opt_state, loss = step_fn(
                params, batch_stats, opt_state, xb,
                jax.random.fold_in(ep_rng, 1 + si))
            ep_loss += float(loss)
        train_losses.append(ep_loss / steps)
        vl = float(eval_fn(params, batch_stats, xv_std,
                           jax.random.fold_in(ep_rng, 1 + steps)))
        val_losses.append(vl)
        if vl < best[0]:
            best = (vl, params, batch_stats, epoch)

    _, b_params, b_bs, b_epoch = best
    bundle = new_bundle(b_params, b_bs, jnp.asarray(mean, jnp.float32),
                        jnp.asarray(std, jnp.float32), model.latent_dim)
    return bundle, np.asarray(train_losses), np.asarray(val_losses), b_epoch
