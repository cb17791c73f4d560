"""OCMBundle: one pytree = one deployable one-class model.

The reference makes a checkpoint self-contained by registering all decision
state as buffers on the torch module (``vae_model.py:29-32,83-88``): spectral
standardization stats, latent mean / inverse covariance, and the D2/Q/h/f
thresholds travel inside ``state_dict`` (saved at
``utils/final_vaesimca.py:439-445``, reloaded for eval at ``:453-467``).

Here the same contract is a NamedTuple pytree: ``params + batch_stats``
(the network) plus ``spec_mean/spec_std`` (standardization,
vae_model.py:83-84,124-128), ``latent_mean/latent_cov_inv``
(vae_model.py:87-88) and the four thresholds (vae_model.py:29-32).  Being a
pytree it serializes with ``flax.serialization`` msgpack (save_bundle /
load_bundle), jits/shards/donates cleanly, and one file is a complete
deployable model.
"""

from __future__ import annotations

from typing import Any, NamedTuple


import jax
import jax.numpy as jnp
import numpy as np

from ocm_tpu.models.vae import ConvVAE1D


class OCMBundle(NamedTuple):
    """Complete one-class VAE model: network + preprocessing + decision state."""

    params: Any
    batch_stats: Any
    spec_mean: jnp.ndarray       # (L,) per-wavelength mean
    spec_std: jnp.ndarray        # (L,) per-wavelength std
    latent_mean: jnp.ndarray     # (k,)
    latent_cov_inv: jnp.ndarray  # (k, k)
    threshold: jnp.ndarray       # D^2 threshold (scalar)
    threshold_q: jnp.ndarray     # Q threshold
    threshold_h: jnp.ndarray     # h threshold
    threshold_f: jnp.ndarray     # f threshold


def new_bundle(params, batch_stats, spec_mean, spec_std,
               latent_dim: int) -> OCMBundle:
    """Fresh bundle with identity latent stats and zero thresholds
    (the reference's initial buffer values, vae_model.py:29-32,87-88)."""
    dtype = spec_mean.dtype
    return OCMBundle(
        params=params, batch_stats=batch_stats,
        spec_mean=jnp.asarray(spec_mean), spec_std=jnp.asarray(spec_std),
        latent_mean=jnp.zeros((latent_dim,), dtype),
        latent_cov_inv=jnp.eye(latent_dim, dtype=dtype),
        threshold=jnp.zeros((), dtype), threshold_q=jnp.zeros((), dtype),
        threshold_h=jnp.zeros((), dtype), threshold_f=jnp.zeros((), dtype),
    )


def standardize(bundle: OCMBundle, x):
    """(x - spec_mean) / spec_std (vae_model.py:124)."""
    return (x - bundle.spec_mean) / bundle.spec_std


def unstandardize(bundle: OCMBundle, x_std):
    """x_std * spec_std + spec_mean (vae_model.py:128)."""
    return x_std * bundle.spec_std + bundle.spec_mean


def _variables(bundle: OCMBundle):
    v = {"params": bundle.params}
    if bundle.batch_stats:
        v["batch_stats"] = bundle.batch_stats
    return v


def encode(model: ConvVAE1D, bundle: OCMBundle, x):
    """Raw spectra -> (mu, logvar), eval mode (standardization included)."""
    return model.apply(_variables(bundle), standardize(bundle, x),
                       train=False, method=ConvVAE1D.encode)


def decode(model: ConvVAE1D, bundle: OCMBundle, z):
    """Latent -> raw spectra, eval mode (unstandardization included)."""
    x_std = model.apply(_variables(bundle), z, train=False,
                        method=ConvVAE1D.decode)
    return unstandardize(bundle, x_std)


def forward(model: ConvVAE1D, bundle: OCMBundle, x, rng):
    """Full VAE forward on raw spectra (vae_model.py:123-129)."""
    x_rec_std, mu, logvar = model.apply(
        _variables(bundle), standardize(bundle, x), train=False,
        rngs={"reparam": rng})
    return unstandardize(bundle, x_rec_std), mu, logvar


def reconstruct(model: ConvVAE1D, bundle: OCMBundle, x):
    """Deterministic reconstruction through mu (the eval path every
    reference driver uses for scoring, e.g. utils/final_vaesimca.py:470-477)."""
    mu, _ = encode(model, bundle, x)
    return decode(model, bundle, mu), mu


# ---------------------------------------------------------------------------
# Serialization: one msgpack file == one deployable model (SURVEY.md 5.4).
# ---------------------------------------------------------------------------

def save_bundle(path: str, bundle: OCMBundle) -> None:
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(bundle._asdict()))


def load_bundle(path: str, template: OCMBundle) -> OCMBundle:
    """Load a bundle saved by ``save_bundle``; ``template`` provides the
    pytree structure (an untrained bundle of the same architecture)."""
    from flax import serialization

    with open(path, "rb") as f:
        state = serialization.from_bytes(template._asdict(), f.read())
    return OCMBundle(**state)


def stack_bundles(items):
    """Stack matching model pytrees along a new leading class axis.

    The multi-class serving input: independently fitted per-class pytrees
    (``OCMBundle``s of one shared architecture, or their fitted
    ``vaesimca.VAESIMCAModel``s) become ONE stacked pytree whose leaves
    carry a leading (C,) axis, so a C-class screen — the reference's
    sequential per-nut-type loop (vae_bce_nut.py:113-121,
    vae_simca_nuts_peanut.py per-type reruns) — runs as one vmapped
    compiled program (``serving.VAEScorer``) instead of C model passes.

    All pytrees must share tree structure and leaf shapes (same
    architecture/latent size); mismatches raise with the leaf path.
    """
    if not items:
        raise ValueError("stack_bundles needs at least one pytree")
    leaves0, treedef = jax.tree.flatten(items[0])
    for i, b in enumerate(items[1:], 1):
        if jax.tree.structure(b) != treedef:
            raise ValueError(
                f"stack_bundles: pytree {i} has a different structure "
                "than pytree 0 (mixed architectures?)")
    paths = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_flatten_with_path(items[0])[0]]
    out = []
    for path, *leaves in zip(paths, leaves0,
                             *(jax.tree.flatten(b)[0] for b in items[1:])):
        shapes = {np.shape(leaf) for leaf in leaves}
        if len(shapes) != 1:
            raise ValueError(
                f"stack_bundles: leaf {path} shapes differ across classes: "
                f"{sorted(shapes)} — all classes must share one "
                "architecture/latent size")
        out.append(jnp.stack(leaves))
    return jax.tree.unflatten(treedef, out)


def spectral_stats(x_train) -> tuple[np.ndarray, np.ndarray]:
    """Per-wavelength mean/std of the calibration set with the reference's
    additive 1e-12 guard (utils/final_vaesimca.py:261-262)."""
    x = np.asarray(x_train)
    return x.mean(axis=0), x.std(axis=0) + 1e-12
