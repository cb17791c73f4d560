"""Global configuration helpers.

The reference computes every statistic in NumPy float64.  On TPU the fast
path is float32 (and bfloat16 on the MXU), so this framework keeps two dtype
knobs:

- ``stats_dtype`` — dtype used for acceptance limits, covariances and
  quantile inversion.  float64 gives bit-tolerance parity with the NumPy
  reference (tests run this way on CPU); float32 is the TPU fast path.
- ``compute_dtype`` — dtype of the bulk GEMM/conv work.

``enable_x64()`` flips JAX's global x64 flag; call it before tracing for
parity runs.  Library code never flips it implicitly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def enable_x64(enable: bool = True) -> None:
    """Enable/disable 64-bit mode globally (parity with the NumPy reference)."""
    jax.config.update("jax_enable_x64", enable)


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


def debug_nans(enable: bool = True) -> None:
    """Moral equivalent of a sanitizer mode: trap NaNs at dispatch time."""
    jax.config.update("jax_debug_nans", enable)


def stats_dtype() -> jnp.dtype:
    """Widest float available under the current x64 setting."""
    return jnp.float64 if x64_enabled() else jnp.float32


@dataclasses.dataclass(frozen=True)
class CompatFlags:
    """Registry of the reference-behavior compatibility switches.

    Each flag names a documented quirk of TEAM-AIOLY/OCM-VAE-SIMCA
    (SURVEY.md section 2.4).  Defaults reproduce the reference so decisions
    match to numerical tolerance; the corrected behavior is one argument
    away.  The OPERATIONAL switches live on the functions themselves —
    this object documents the mapping:

    - ``batch_qhf_stats``      -> ``vae_decision.decide_f(calibration=...)``
                                  / ``stats.qhf.qhf_fit``+``qhf_calibrated``
    - ``testset_f_moments``    -> ``vae_decision.decide_full_distance(
                                  moments=...)``
    - ``vaesimca_percentile_limits`` -> reproduced unconditionally inside
                                  ``models.vaesimca`` (quirk Q5; the
                                  classical engines in ``stats.limits`` are
                                  the corrected forms); the related Q11
                                  round-trip quirk is
                                  ``VAESIMCA(compat_double_standardize=...)``
    (see also ``SIMCA(compat_dd_shared_state=...)`` for quirk Q7 and
    docs/PARITY.md for the full quirk table).

    - ``batch_qhf_stats``: ``compute_q_h_f`` derives its moment-matched dofs
      and critical values from the batch being scored (reference
      ``vae_model.py:162-181``), including at test time.  Corrected mode uses
      frozen calibration statistics.
    - ``testset_f_moments``: the full-distance decision of
      ``utils/final_vaesimca.py:511-529`` computes Nh/Nq/fcrit from test-set
      moments.  Corrected mode uses calibration moments.
    - ``vaesimca_percentile_limits``: ``VAESIMCA._compute_T2_limit('Fdist')``
      uses an empirical percentile where ``SIMCA._Tlim('Fdist')`` uses the F
      ppf (reference ``VAE_SIMCA.py:286-288``), and its 'jm' Q-limit uses
      moments of the Q values instead of residual eigenvalues
      (``VAE_SIMCA.py:306-318``).
    """

    batch_qhf_stats: bool = True
    testset_f_moments: bool = True
    vaesimca_percentile_limits: bool = True


DEFAULT_COMPAT = CompatFlags()
