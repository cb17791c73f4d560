"""On-device VAE training: the whole multi-epoch loop is ONE jitted program.

The reference trains with a host loop over DataLoader batches, paying a
host->device copy per batch and a device->host sync per loss item
(``utils/final_vaesimca.py:357-445``, SURVEY.md section 3.4).  Chemometric
calibration sets are small (10^2-10^5 spectra x ~500 wavelengths), so the
TPU-first formulation keeps the WHOLE dataset resident in HBM and runs

    lax.scan over epochs ( lax.scan over minibatches ( jitted train step ) )

with best-checkpoint selection done functionally inside the scan carry
(jnp.where over the parameter pytree) — zero host round-trips from first to
last epoch.  Optimizer matches torch ``optim.Adam(lr, weight_decay)``
(utils/final_vaesimca.py:351): L2 penalty added to the gradient BEFORE the
Adam moments (not decoupled AdamW).

Batching semantics: torch DataLoader(shuffle=True) keeps a ragged final
batch; static XLA shapes instead use ceil(N/B) steps with the epoch
permutation wrapped around to fill the last batch (documented deviation —
a handful of samples are seen twice per epoch; the optimization trajectory
cannot match torch bit-wise anyway since RNG streams differ).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ocm_tpu.models.bundle import OCMBundle, new_bundle, spectral_stats
from ocm_tpu.models.vae import ConvVAE1D, beta_vae_loss, init_vae


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters of one VAE training run (the reference's ``param``
    dict, utils/final_vaesimca.py:267-301)."""

    epochs: int = 100
    batch_size: int = 64
    lr: float = 1e-3
    weight_decay: float = 0.0
    beta: float = 1.0
    loss_type: str = "cosine"   # cosine | bce | euclidean | bce_prob
    # validation cadence: 1 = every epoch (the reference protocol,
    # utils/final_vaesimca.py:380); k > 1 skips k-1 of every k validation
    # passes (production knob; best-checkpoint tracking then only sees the
    # validated epochs, and skipped epochs report +inf val loss)
    val_every: int = 1
    # loss comparison space: 'std' compares standardized spectra (one fused
    # standardization up front — the TPU-friendly default); 'raw' rescales
    # the reconstruction back to raw spectral space first, which is the
    # reference's exact objective (vae_model.py:128 + the losses on raw x)
    # — cosine/BCE losses are NOT invariant to the per-wavelength affine
    # map, so use 'raw' for objective-level parity
    loss_space: str = "std"


class TrainResult(NamedTuple):
    bundle: OCMBundle            # best-val-epoch parameters (thresholds unset)
    train_losses: jnp.ndarray    # (epochs,)
    val_losses: jnp.ndarray      # (epochs,)
    best_epoch: jnp.ndarray      # scalar int
    final_params: Any            # last-epoch params (for resume)
    final_batch_stats: Any
    final_opt_state: Any


def torch_adam(lr: float, weight_decay: float = 0.0):
    """optax equivalent of torch.optim.Adam(lr=lr, weight_decay=wd):
    g <- g + wd*p, then Adam(b1=0.9, b2=0.999, eps=1e-8)."""
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    steps.append(optax.scale(-lr))
    return optax.chain(*steps)


@functools.partial(jax.jit, static_argnames="with_wd")
def _adam_init(params, with_wd: bool):
    """Cached optimizer-state init (structure depends only on whether a
    weight-decay stage is chained; the moment buffers are zeros_like).
    Saves ~30 ms of per-call host dispatch in sweep/HPO loops."""
    return torch_adam(1e-3, 1e-2 if with_wd else 0.0).init(params)


def _batch_indices(rng, n: int, batch_size: int):
    """Shuffled epoch indices, wrapped to fill ceil(n/B) full batches."""
    steps = -(-n // batch_size)
    perm = jax.random.permutation(rng, n)
    pad = steps * batch_size - n
    filled = jnp.concatenate([perm, perm[:pad]]) if pad else perm
    return filled.reshape(steps, batch_size)


def _loss_pair(cfg: TrainConfig, xb_std, x_rec_std, spec):
    """(target, reconstruction) in the configured loss space; ``spec`` is
    (mean, std) or None when loss_space == 'std'."""
    if cfg.loss_space == "raw" and spec is not None:
        mean, std = spec
        return xb_std * std + mean, x_rec_std * std + mean
    return xb_std, x_rec_std


def make_train_step(model: ConvVAE1D, tx, cfg: TrainConfig, spec=None,
                    beta=None):
    """One jitted optimizer step over a standardized minibatch.

    ``spec=(mean, std)`` enables the 'raw' loss space (the reference's exact
    objective — losses on unstandardized spectra, vae_model.py:123-129).
    ``beta`` overrides ``cfg.beta`` with a (possibly traced) scalar — the
    hook that lets the vmapped config-batch trainer vary beta along a
    batch axis while reusing this exact step."""
    beta = cfg.beta if beta is None else beta

    def step(params, batch_stats, opt_state, xb_std, rng):
        r1, r2 = jax.random.split(rng)

        def loss_fn(p):
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out, mutated = model.apply(
                variables, xb_std, train=True,
                rngs={"reparam": r1, "dropout": r2},
                mutable=["batch_stats"] if batch_stats else [])
            x_rec, mu, logvar = out
            # mixed-precision contract: a reduced-precision model (e.g.
            # ConvVAE1D(dtype=bf16) — conv GEMMs on the MXU's native
            # tier) still gets f32 losses, KL reductions and gradients;
            # params/Adam moments are f32 throughout (flax param_dtype).
            # No-op for the default f32 model.
            x_rec = x_rec.astype(xb_std.dtype)
            mu = mu.astype(xb_std.dtype)
            logvar = logvar.astype(xb_std.dtype)
            x_cmp, r_cmp = _loss_pair(cfg, xb_std, x_rec, spec)
            total, recon, kl = beta_vae_loss(x_cmp, r_cmp, mu, logvar,
                                             beta=beta,
                                             loss_type=cfg.loss_type)
            new_bs = mutated.get("batch_stats", batch_stats) if batch_stats else batch_stats
            return total, (recon, kl, new_bs)

        (total, (recon, kl, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, total

    return step


def make_eval_loss(model: ConvVAE1D, cfg: TrainConfig, spec=None,
                   beta=None):
    """Validation loss over a full standardized set (stochastic forward, as
    the reference's eval-mode forward still samples z;
    utils/final_vaesimca.py:380-393).  ``beta`` overrides ``cfg.beta``
    (traced scalars allowed, see make_train_step)."""
    beta = cfg.beta if beta is None else beta

    def eval_loss(params, batch_stats, x_std, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        x_rec, mu, logvar = model.apply(variables, x_std, train=False,
                                        rngs={"reparam": rng})
        x_rec = x_rec.astype(x_std.dtype)           # f32 loss reductions
        mu = mu.astype(x_std.dtype)                 # (see make_train_step)
        logvar = logvar.astype(x_std.dtype)
        x_cmp, r_cmp = _loss_pair(cfg, x_std, x_rec, spec)
        total, _, _ = beta_vae_loss(x_cmp, r_cmp, mu, logvar, beta=beta,
                                    loss_type=cfg.loss_type)
        return total

    return eval_loss


def train_vae(model: ConvVAE1D, x_cal, x_val, cfg: TrainConfig,
              rng: jax.Array, spec_stats: Optional[tuple] = None,
              init_state: Optional[tuple] = None,
              epoch_offset: int = 0) -> TrainResult:
    """Train one VAE fully on device and return the best-val-epoch bundle.

    Mid-training resume (beyond the reference, which only reloads best
    weights for evaluation — SURVEY.md section 5.4): pass
    ``init_state=(final_params, final_batch_stats, final_opt_state)`` from a
    previous ``TrainResult`` plus ``epoch_offset`` = epochs already run, and
    optimization continues exactly where it stopped (Adam moments included;
    the per-epoch RNG folds in the global epoch index so the shuffle stream
    continues too).

    ``x_cal``/``x_val`` are RAW spectra; standardization stats are computed
    on the calibration set (utils/final_vaesimca.py:261-262) unless passed.
    The loss is computed in standardized space, matching the reference
    (its ``vae(xb)`` returns unstandardized x_rec and compares against raw
    x, which is equivalent up to the per-wavelength scale; we standardize
    once up front so the network never leaves standardized space —
    equivalent for cosine/euclidean up to the fixed linear map, exact for
    decisions since thresholds are refit in the same space).
    """
    x_cal = jnp.asarray(x_cal)
    x_val = jnp.asarray(x_val)
    if spec_stats is None:
        mean, std = spectral_stats(np.asarray(x_cal))
    else:
        mean, std = spec_stats
    mean = jnp.asarray(mean, x_cal.dtype)
    std = jnp.asarray(std, x_cal.dtype)
    xc_std = (x_cal - mean) / std
    xv_std = (x_val - mean) / std

    init_rng, train_rng = jax.random.split(rng)
    if init_state is None:
        params, batch_stats = init_vae(model, init_rng)
        opt_state = _adam_init(params, bool(cfg.weight_decay))
    else:
        params, batch_stats, opt_state = init_state

    batch_size = min(cfg.batch_size, x_cal.shape[0])
    (f_params, f_bs, f_opt, best_params, best_bs, best_epoch,
     train_losses, val_losses) = _train_loop(
        model, cfg, batch_size, epoch_offset, xc_std, xv_std, mean, std,
        params, batch_stats, opt_state, train_rng)

    bundle = new_bundle(best_params, best_bs, mean, std, model.latent_dim)
    return TrainResult(bundle, train_losses, val_losses,
                       best_epoch + epoch_offset, f_params, f_bs, f_opt)


def train_vae_blocked(model: ConvVAE1D, x_cal, x_val, cfg: TrainConfig,
                      rng: jax.Array, block_epochs: int = 10,
                      report: Optional[Callable] = None,
                      spec_stats: Optional[tuple] = None) -> TrainResult:
    """Train in ``block_epochs``-sized jitted blocks with a host callback
    between blocks — the mid-training HPO pruning hook the reference gets
    from per-epoch ``trial.report`` + ``TrialPruned``
    (optim_bce_nuts.py:197-199).

    ``report(epoch, train_loss, val_loss) -> bool`` is called once per
    COMPLETED epoch (host floats); returning True stops training at the
    enclosing block boundary (``block_epochs=1`` reproduces the reference's
    exact per-epoch pruning cadence; larger blocks trade pruning latency
    for fewer device round trips).

    The trajectory is IDENTICAL to the monolithic ``train_vae`` run with
    the same rng (tests/test_sweep.py): each block resumes from
    ``final_params/batch_stats/opt_state`` with ``epoch_offset`` set, and
    the per-epoch RNG folds in the GLOBAL epoch index, so the shuffle and
    reparameterization streams continue exactly.  Only the epochs-per-jit
    blocking differs, and each distinct block length compiles once
    (module-level jit keyed on cfg).
    """
    x_cal = jnp.asarray(x_cal)
    if spec_stats is None:
        spec_stats = spectral_stats(np.asarray(x_cal))

    state = None
    train_losses, val_losses = [], []
    best_val, best_bundle, best_epoch = np.inf, None, 0
    done = 0
    stopped = False
    while done < cfg.epochs and not stopped:
        k = min(block_epochs, cfg.epochs - done)
        bcfg = dataclasses.replace(cfg, epochs=k)
        entry_state = state
        r = train_vae(model, x_cal, x_val, bcfg, rng,
                      spec_stats=spec_stats, init_state=state,
                      epoch_offset=done)
        state = (r.final_params, r.final_batch_stats, r.final_opt_state)
        tl = np.asarray(r.train_losses)
        vl = np.asarray(r.val_losses)
        seen = k
        for e in range(k):
            train_losses.append(float(tl[e]))
            val_losses.append(float(vl[e]))
            if report is not None and report(done + e, float(tl[e]),
                                             float(vl[e])):
                stopped = True
                seen = e + 1
                break
        # best-checkpoint tracking over the REPORTED prefix only (a pruned
        # block's unreported tail never becomes the best model).  When the
        # prune cuts before the block's own argmin, r.bundle holds the
        # wrong (unreported) epoch — re-run the deterministic prefix from
        # the block's entry state to materialize the reported best
        # checkpoint instead, so TrainResult.bundle is always the best
        # OBSERVED epoch and never None once any epoch was reported.
        if seen and np.isfinite(vl[:seen]).any():
            # nanargmin: plain argmin returns the index of a NaN, so a
            # block whose tail diverged would never adopt its finite best
            prefix_best = int(np.nanargmin(vl[:seen]))
            if float(vl[prefix_best]) < best_val:
                best_val = float(vl[prefix_best])
                best_epoch = done + prefix_best
                if int(r.best_epoch) - done == prefix_best:
                    best_bundle = r.bundle
                else:
                    rr = train_vae(
                        model, x_cal, x_val,
                        dataclasses.replace(cfg, epochs=prefix_best + 1),
                        rng, spec_stats=spec_stats, init_state=entry_state,
                        epoch_offset=done)
                    best_bundle = rr.bundle
        done += k

    return TrainResult(best_bundle,
                       jnp.asarray(train_losses), jnp.asarray(val_losses),
                       jnp.asarray(best_epoch), *state)


@functools.partial(
    jax.jit, static_argnames=("model", "cfg", "batch_size"))
def _train_loop(model: ConvVAE1D, cfg: TrainConfig, batch_size: int,
                epoch_offset, xc_std, xv_std, mean, std, params,
                batch_stats, opt_state, train_rng):
    """The whole multi-epoch loop as ONE cached compiled program.

    Module-level jit keyed on (model, cfg, batch_size) and the array
    shapes — repeated calls (sweeps, resumes, benchmarks) hit the compile
    cache instead of re-tracing a per-call closure.  ``epoch_offset`` is a
    TRACED scalar (it only feeds RNG fold_in and the val_every modulus), so
    mid-train resumes — per-epoch blocked pruning cadence included — reuse
    the same executable at every offset instead of recompiling per block
    (at block_epochs=1 the static version cost one full-loop compile PER
    EPOCH of every pruned HPO trial).
    """
    tx = torch_adam(cfg.lr, cfg.weight_decay)
    spec = (mean, std) if cfg.loss_space == "raw" else None
    step_fn = make_train_step(model, tx, cfg, spec=spec)
    eval_fn = make_eval_loss(model, cfg, spec=spec)
    return epoch_scan(cfg, batch_size, epoch_offset, xc_std, xv_std,
                      step_fn, eval_fn, params, batch_stats, opt_state,
                      train_rng)


def epoch_scan(cfg: TrainConfig, batch_size: int, epoch_offset: int,
               xc_std, xv_std, step_fn, eval_fn, params, batch_stats,
               opt_state, train_rng):
    """lax.scan over epochs (scan over minibatches) with in-carry
    best-checkpoint selection — THE single epoch-loop implementation,
    shared by the canonical trainer and the vmapped config-batch trainer
    (utils.sweep.train_vae_vmapped), so batched sweeps run the exact
    trajectory of ``train_vae`` (val_every / loss_space / RNG folding
    included)."""
    n = xc_std.shape[0]

    def epoch_body(carry, epoch):
        params, batch_stats, opt_state, best = carry
        ep_rng = jax.random.fold_in(train_rng, epoch + epoch_offset)
        idx = _batch_indices(jax.random.fold_in(ep_rng, 0), n, batch_size)

        def step_body(inner, si):
            p, bs, os = inner
            xb = xc_std[idx[si]]
            p, bs, os, loss = step_fn(p, bs, os, xb,
                                      jax.random.fold_in(ep_rng, 1 + si))
            return (p, bs, os), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            step_body, (params, batch_stats, opt_state),
            jnp.arange(idx.shape[0]))
        train_loss = jnp.mean(losses)
        if cfg.val_every > 1:
            val_loss = jax.lax.cond(
                (epoch + epoch_offset + 1) % cfg.val_every == 0,
                lambda: eval_fn(params, batch_stats, xv_std,
                                jax.random.fold_in(ep_rng,
                                                   1 + idx.shape[0])),
                lambda: jnp.asarray(jnp.inf, xc_std.dtype))
        else:
            val_loss = eval_fn(params, batch_stats, xv_std,
                               jax.random.fold_in(ep_rng, 1 + idx.shape[0]))

        best_val, best_params, best_bs, best_epoch = best
        is_best = val_loss < best_val
        best_val = jnp.where(is_best, val_loss, best_val)
        best_epoch = jnp.where(is_best, epoch, best_epoch)
        take = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(is_best, a, b), new, old)
        best = (best_val, take(params, best_params),
                take(batch_stats, best_bs), best_epoch)
        return (params, batch_stats, opt_state, best), (train_loss, val_loss)

    carry = (params, batch_stats, opt_state,
             (jnp.asarray(jnp.inf, xc_std.dtype), params, batch_stats,
              jnp.asarray(0)))
    carry, (train_losses, val_losses) = jax.lax.scan(
        epoch_body, carry, jnp.arange(cfg.epochs))
    params, batch_stats, opt_state, best = carry
    _, best_params, best_bs, best_epoch = best
    return (params, batch_stats, opt_state, best_params, best_bs,
            best_epoch, train_losses, val_losses)
