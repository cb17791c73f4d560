"""Profiling utilities + float32 (TPU production dtype) smoke coverage.

The rest of the suite runs x64 for oracle parity; these tests confirm the
decision paths stay finite and discriminative at float32, the dtype the
real TPU runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocm_tpu.utils.profiling import EpochLogger, throughput, timeit


def test_timeit_blocks_and_reports():
    f = jax.jit(lambda x: jnp.sum(x * x))
    x = jnp.ones((256, 256))
    stats = timeit(f, x, warmup=1, repeats=3)
    assert stats["best"] > 0
    assert stats["best"] <= stats["mean"]
    assert len(stats["times"]) == 3
    tput = throughput(f, 256, x, warmup=1, repeats=2)
    assert tput > 0


def test_epoch_logger(capsys):
    log = EpochLogger(print_every=2)
    for e in range(4):
        log.log(e, 1.0 / (e + 1), 2.0 / (e + 1))
    out = capsys.readouterr().out
    assert "Epoch 1" in out and "Epoch 2" in out and "Epoch 4" in out
    assert "Epoch 3" not in out
    hist = log.history()
    assert len(hist["train_losses"]) == 4
    np.testing.assert_allclose(hist["val_losses"][0], 2.0)


def test_simca_f32_decisions_discriminate(rng):
    """Full SIMCA fit/decide at float32 keeps clean class separation."""
    from oracles import make_class_spectra

    from ocm_tpu.models.simca import fit_simca, simca_decide

    x_in = jnp.asarray(make_class_spectra(rng, 200, 96), jnp.float32)
    x_out = jnp.asarray(make_class_spectra(rng, 80, 96, center_shift=2.0),
                        jnp.float32)
    model = fit_simca(x_in, 6)
    assert model.mean.dtype == jnp.float32
    acc_in, dred_in, t2, q = simca_decide(model, x_in)
    acc_out, dred_out, _, _ = simca_decide(model, x_out)
    assert np.isfinite(np.asarray(dred_in)).all()
    assert float(jnp.mean(acc_in)) > 0.85
    assert float(jnp.mean(acc_out)) < 0.2


def test_limits_f32_close_to_f64(rng):
    """Device-side quantile inversion at f32 stays within f32 tolerance of
    the f64 values for realistic dofs."""
    from ocm_tpu.ops.special import chi2_ppf, f_ppf

    for dof in (1.0, 4.0, 17.5, 120.0):
        a64 = float(chi2_ppf(0.95, jnp.asarray(dof, jnp.float64)))
        a32 = float(chi2_ppf(0.95, jnp.asarray(dof, jnp.float32)))
        assert abs(a64 - a32) / a64 < 1e-5
    f64v = float(f_ppf(0.95, jnp.asarray(8.0, jnp.float64),
                       jnp.asarray(90.0, jnp.float64)))
    f32v = float(f_ppf(0.95, jnp.asarray(8.0, jnp.float32),
                       jnp.asarray(90.0, jnp.float32)))
    assert abs(f64v - f32v) / f64v < 1e-5


def test_simca_scores_pallas_flag(rng):
    """The use_pallas routing returns the same scores (interpret-safe check
    via the XLA fallback shapes; compiled parity is covered on TPU)."""
    from oracles import make_class_spectra

    from ocm_tpu.models.simca import fit_simca, simca_scores

    x = jnp.asarray(make_class_spectra(rng, 96, 64), jnp.float32)
    model = fit_simca(x, 5)
    t2_a, q_a = simca_scores(model, x, use_pallas=False)
    assert t2_a.shape == (96,) and q_a.shape == (96,)
