"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the standard way to exercise SPMD
sharding without a TPU pod) with x64 enabled so statistical parity against
the NumPy/scipy reference formulas can be asserted at tight tolerance.
Environment variables must be set before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The hosted-TPU (axon) site hook force-registers its platform and sets
# jax_platforms itself, so the env var alone is not enough — override the
# config knob after import, before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache, shared across xdist workers AND pytest
# runs: the suite's wall time is dominated by XLA-CPU compiles of
# deterministic programs (vmapped VAE train loops, sharded sweeps), so a
# warm cache turns repeat runs into near-pure execution.  The directory
# is repo-local (gitignored) so it survives sessions; deleting it only
# costs one cold run.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
# 0.05 s threshold: the suite compiles THOUSANDS of 0.1-0.5 s programs
# (small eigh/GEMM/vmapped trainers at test shapes), and with xdist each
# worker recompiles them per run, so cache nearly everything.  Timed
# warm-cache certification run recorded in docs/VERIFICATION.md (round 5).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def spectra(rng):
    """Cheese-like synthetic spectra: smooth curves + noise, (N, L)."""
    n, length = 240, 120
    t = np.linspace(0, 1, length)
    base = np.sin(2 * np.pi * 3 * t) + 0.5 * np.cos(2 * np.pi * 7 * t)
    amp = rng.normal(1.0, 0.1, size=(n, 1))
    shift = rng.normal(0.0, 0.05, size=(n, 1))
    x = amp * base[None, :] + shift + rng.normal(0, 0.02, size=(n, length))
    return x.astype(np.float64)
