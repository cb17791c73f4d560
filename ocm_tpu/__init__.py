"""ocm_tpu — TPU-native one-class chemometrics (OCM) framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
TEAM-AIOLY/OCM-VAE-SIMCA (classical SIMCA, cross-validated SIMCA, 1-D
convolutional beta-VAE one-class models and their SIMCA-style decision
layers), built TPU-first:

- all fit / score / decision math is pure, jittable and vmap-able;
- the per-class / per-fold / per-LV / per-config loops of the reference
  become mapped (vmap) or mesh-sharded (shard_map/pjit) axes;
- statistical quantile functions (chi^2 / F ppf) run on device so that
  batched fits never synchronize with the host;
- hot paths (SIMCA scoring, VAE loss) have fused Pallas kernels.

Package map (reference file:line citations are to TEAM-AIOLY/OCM-VAE-SIMCA):
- ``ocm_tpu.ops``      — preprocessing, linalg and special functions, Pallas kernels
- ``ocm_tpu.stats``    — acceptance-limit engines, conformity metrics, q/h/f distances
- ``ocm_tpu.models``   — SIMCA, CV-SIMCA, ConvVAE1D, VAE decision layers
- ``ocm_tpu.parallel`` — mesh construction, sharded scoring/training, collectives
- ``ocm_tpu.utils``    — data ingest, splits, HSI object extraction, reports, sweeps
"""

__version__ = "0.1.0"

from ocm_tpu import config as config

_SUBPACKAGES = ("models", "ops", "stats", "parallel", "utils", "serving")


def __getattr__(name):
    # lazy subpackage access (keeps `import ocm_tpu` light; flax/optax only
    # load when the VAE stack is touched)
    if name in _SUBPACKAGES:
        import importlib

        module = importlib.import_module(f"ocm_tpu.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module 'ocm_tpu' has no attribute {name!r}")


__all__ = ["config", "__version__", *_SUBPACKAGES]
