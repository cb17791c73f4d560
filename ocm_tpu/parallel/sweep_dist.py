"""Mesh-sharded HPO config sweeps: the vmapped config-batch trainer
(utils.sweep.train_vae_vmapped) with its CONFIG axis placed on the device
mesh — distinct hyperparameter configs train on distinct chips.

The reference runs its 96-config sweeps and Optuna studies strictly
sequentially on one device (VAE_SIMCA.py:436-470, optim_bce_nuts.py:295).
This framework first batches the config axis with vmap (one compile, MXU
filled — utils.sweep), and here scales it over the mesh: the SAME
``utils.sweep.vmapped_train_body`` runs under a jit whose config-axis
inputs/outputs carry a ``P(model_axis)`` sharding, so XLA partitions the
embarrassingly-parallel config axis across chips (SURVEY.md §5.8's
'model' axis) with zero collectives in the epoch loop — per-config
training is independent; nothing rides ICI but the initial broadcast of
the replicated spectra.

Config count auto-pads to the mesh size by cyclic repetition
(parallel.mesh.cyclic_pad, shared with the fold/unit padding in
parallel.simca_dist); padded configs train real trajectories but are
dropped from every output.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ocm_tpu.models.trainer import TrainConfig, TrainResult
from ocm_tpu.parallel.mesh import cyclic_pad, require_mesh_axis
from ocm_tpu.utils.sweep import (classes_prep, classes_result,
                                 classes_train_body, sweep_prep,
                                 sweep_result, vmapped_train_body)

__all__ = ["train_vae_vmapped_sharded", "train_vae_classes_sharded"]


@functools.lru_cache(maxsize=None)
def _sharded_sweep_jit(model, cfg: TrainConfig, batch_size: int,
                       mesh: Mesh, model_axis: str):
    """One compiled sharded sweep per (architecture, train config, batch,
    mesh) — module-level cache so repeated sweeps reuse the executable
    (the closure-jit retrace trap, CLAUDE.md design rules).

    shard_map rather than jit-with-shardings: each device runs the plain
    vmapped body over ITS config slice.  (GSPMD cannot partition the
    config axis here — under vmap the ConvVAE1D convs lower to
    feature-group convolutions whose group dimension the partitioner
    refuses to split.)  Per-config training is independent, so the body
    needs no collectives at all."""
    from jax import shard_map

    def body(epoch_offset, xc_std, xv_std, mean, std, lrs, weight_decays,
             betas, cfg_rngs):
        return vmapped_train_body(model, cfg, batch_size, epoch_offset,
                                  xc_std, xv_std, mean, std, lrs,
                                  weight_decays, betas, cfg_rngs, None)

    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(),) * 5 + (P(model_axis),) * 4,
        out_specs=P(model_axis), check_vma=False))


def train_vae_vmapped_sharded(model, x_cal, x_val, lrs, weight_decays,
                              betas, mesh: Mesh, *, epochs: int,
                              batch_size: int, loss_type: str,
                              rng: jax.Array = None, cfg_rngs=None,
                              spec_stats=None, loss_space: str = "std",
                              val_every: int = 1,
                              model_axis: str = "model") -> TrainResult:
    """``utils.sweep.train_vae_vmapped`` with the config axis sharded.

    Same contract: config i runs the trajectory of
    ``train_vae(..., TrainConfig(lr=lrs[i], ...), rng=split(rng, n)[i])``;
    the returned TrainResult's leaves carry a leading config axis of
    length ``len(lrs)``.  Configs auto-pad to a multiple of the mesh's
    ``model_axis`` size (padded trajectories are computed and dropped).

    Numerics: each shard vmaps a NARROWER config slice than the local
    full-width vmap, so f32 reductions reassociate and Adam amplifies
    the ulp-level gradient differences to lr scale over epochs — the
    same fp contract documented for ``train_vae_vmapped`` vs the
    sequential trainer.  Trajectories TRACK the local vmapped run
    (tests/test_parallel.py: ~1e-2 after 3 Adam epochs, ~1e-3 on the
    first); per-config results are equivalent fp schedules of the same
    computation, not bitwise copies.
    Fresh runs only (``init_state`` resume stays on the single-chip path —
    rung-based HPO re-enters with the kept configs' states stacked, which
    would need a gather across the kill pattern here).
    """
    (lrs, weight_decays, betas, cfg_rngs, xc_std, xv_std, mean, std,
     cfg) = sweep_prep(x_cal, x_val, lrs, weight_decays, betas, epochs,
                       batch_size, loss_type, loss_space, val_every,
                       spec_stats, rng, cfg_rngs)
    n_cfg = lrs.shape[0]

    require_mesh_axis(mesh, model_axis)
    (lrs, weight_decays, betas, cfg_rngs), pad = cyclic_pad(
        (lrs, weight_decays, betas, cfg_rngs), mesh.shape[model_axis])

    run = _sharded_sweep_jit(model, cfg, cfg.batch_size, mesh, model_axis)
    out = run(0, xc_std, xv_std, mean, std, lrs, weight_decays, betas,
              cfg_rngs)
    if pad:
        out = jax.tree.map(lambda a: a[:n_cfg], out)
    return sweep_result(out, mean, std, model, epoch_offset=0)


@functools.lru_cache(maxsize=None)
def _sharded_classes_jit(model, cfg: TrainConfig, batch_size: int,
                         mesh: Mesh, model_axis: str):
    """One compiled sharded per-class trainer per (architecture, config,
    batch, mesh) — same module-level cache + shard_map rationale as
    ``_sharded_sweep_jit`` (GSPMD cannot split the vmapped convs'
    feature-group axis; per-class training needs no collectives)."""
    from jax import shard_map

    def body(epoch_offset, xcs, xvs, means, stds, cls_rngs):
        return classes_train_body(model, cfg, batch_size, epoch_offset,
                                  xcs, xvs, means, stds, cls_rngs)

    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(),) + (P(model_axis),) * 5,
        out_specs=P(model_axis), check_vma=False))


def train_vae_classes_sharded(model, x_cals, x_vals, cfg: TrainConfig,
                              mesh: Mesh, rng: jax.Array,
                              spec_stats=None,
                              model_axis: str = "model") -> TrainResult:
    """``utils.sweep.train_vae_classes`` with the CLASS axis on the mesh:
    every per-class one-class VAE trains on its own chip(s).

    The reference trains per-nut-type VAEs by re-running a whole driver
    per type, sequentially on one device (vae_bce_nut.py trains one
    target per run); ``train_vae_classes`` batches that class axis with
    vmap, and this variant spreads it across the mesh — C independent
    calibrations become one multi-chip program with zero collectives in
    the epoch loop.  Same contract as the local version: per-class
    standardization stats, cyclic padding of unequal class sizes, and a
    TrainResult whose leaves carry a leading class axis stacked exactly
    as ``models.bundle.stack_bundles`` (feeds the multi-class
    ``serving.VAEScorer`` after per-class ``fit_thresholds``).

    Classes auto-pad to a multiple of the mesh's ``model_axis`` size by
    cyclic repetition (padded classes train real trajectories, dropped
    from every output).  Numerics: each shard vmaps a NARROWER class
    slice than the local full-width vmap — the same f32-reassociation
    tracking contract as ``train_vae_vmapped_sharded`` above.
    """
    require_mesh_axis(mesh, model_axis)
    xcs, xvs, means, stds, n_max = classes_prep(x_cals, x_vals, spec_stats)
    n_classes = xcs.shape[0]
    bs = min(cfg.batch_size, n_max)
    cls_rngs = jax.random.split(rng, n_classes)
    (xcs, xvs, means_p, stds_p, cls_rngs), pad = cyclic_pad(
        (xcs, xvs, means, stds, cls_rngs), mesh.shape[model_axis])

    run = _sharded_classes_jit(model, cfg, bs, mesh, model_axis)
    out = run(0, jax.numpy.asarray(xcs), jax.numpy.asarray(xvs),
              jax.numpy.asarray(means_p), jax.numpy.asarray(stds_p),
              cls_rngs)
    if pad:
        out = jax.tree.map(lambda a: a[:n_classes], out)
    return classes_result(out, means, stds, model)
