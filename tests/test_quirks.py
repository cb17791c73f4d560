"""Explicit coverage of the reference's behavioral quirks (SURVEY.md §2.4 /
docs/PARITY.md): each compat mode reproduces the quirk, each corrected mode
demonstrably diverges from it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocm_tpu.models.simca import SIMCA, fit_simca
from ocm_tpu.stats.metrics import confusion_matrix_2xc
from ocm_tpu.stats.qhf import full_distance, qhf_batch, qhf_calibrated, qhf_fit

from oracles import make_class_spectra


@pytest.fixture(scope="module")
def three_class():
    rng = np.random.default_rng(8)
    x0 = make_class_spectra(rng, 60, 50)
    x1 = make_class_spectra(rng, 50, 50, center_shift=1.0)
    x2 = make_class_spectra(rng, 40, 50, center_shift=2.0)
    x = np.concatenate([x0, x1, x2])
    y = np.concatenate([np.zeros(60), np.ones(50), np.full(40, 2)])
    return x, y.astype(int)


def test_q1_transform_returns_last_class(three_class):
    """utils/SIMCA.py:101-117: multi-class transform yields ONLY the last
    fitted class's (T2, T2red, Q, Qred)."""
    x, y = three_class
    multi = SIMCA(n_components=4, model_class=[0, 1, 2], verbose=False)
    multi.fit(x, y)
    single = SIMCA(n_components=4, model_class=2, verbose=False)
    single.fit(x, y)
    out_m = multi.transform(x)
    out_s = single.transform(x)
    for a, b in zip(out_m, out_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)


def test_q7_dd_shared_state(three_class):
    """utils/SIMCA.py:77-78,110-111: 'dd' decisions for EVERY class use the
    LAST class's pooled dofs in compat mode; corrected mode uses each
    class's own."""
    x, y = three_class
    compat = SIMCA(n_components=4, model_class=[0, 1, 2], type="dd",
                   verbose=False, compat_dd_shared_state=True)
    compat.fit(x, y)
    fixed = SIMCA(n_components=4, model_class=[0, 1, 2], type="dd",
                  verbose=False, compat_dd_shared_state=False)
    fixed.fit(x, y)
    # compat: class-0 reduced distances use class-2 dofs/scales, but the
    # threshold stays class-0's OWN D_limit (the reference's mixed state,
    # utils/SIMCA.py:141-144)
    m0 = compat._dd_limits(compat._model[0])
    assert float(m0.t2_res.dof) == float(compat._model[2].t2_res.dof)
    assert float(m0.d_limit) == float(compat._model[0].d_limit)
    m0f = fixed._dd_limits(fixed._model[0])
    assert float(m0f.t2_res.dof) == float(fixed._model[0].t2_res.dof)
    # the shared state genuinely differs across classes here
    assert float(compat._model[0].t2_res.dof) != pytest.approx(
        float(compat._model[2].t2_res.dof))


def test_q8_confusion_row_orders(three_class):
    """SIMCA drivers use predicted-row order [1,0], VAE drivers [0,1]."""
    x, y = three_class
    pred = (np.asarray(y) == 0).astype(int)  # pretend accept==class0
    c10 = np.asarray(confusion_matrix_2xc(jnp.asarray(pred),
                                          jnp.asarray(y), 3,
                                          pred_row_order=(1, 0)))
    c01 = np.asarray(confusion_matrix_2xc(jnp.asarray(pred),
                                          jnp.asarray(y), 3,
                                          pred_row_order=(0, 1)))
    np.testing.assert_array_equal(c10, c01[::-1])
    assert c10.sum() == len(y)


def test_q10_score_returns_specificity(three_class):
    x, y = three_class
    m = SIMCA(n_components=4, model_class=0, verbose=False)
    m.fit(x, y)
    s = m.score(x, y)
    assert 0.0 <= s <= 100.0
    assert s == pytest.approx(m.metrics[0]["specificity"], abs=1e-6)


def test_q3_batch_stats_vs_frozen(rng):
    """quirk Q3: qhf_batch scores depend on the composition of the scored
    batch; frozen calibration scoring does not."""
    x = rng.normal(0, 1, (100, 30))
    xr = x + rng.normal(0, 0.1, (100, 30))
    z = rng.normal(0, 1, (100, 6))
    full_batch = qhf_batch(jnp.asarray(x), jnp.asarray(xr), jnp.asarray(z))
    half_batch = qhf_batch(jnp.asarray(x[:50]), jnp.asarray(xr[:50]),
                           jnp.asarray(z[:50]))
    # same samples, different batch -> different f (the quirk)
    assert not np.allclose(np.asarray(full_batch.f)[:50],
                           np.asarray(half_batch.f), rtol=1e-3)
    # frozen calibration: subset scoring == full scoring restricted
    calib = qhf_fit(jnp.asarray(x), jnp.asarray(xr), jnp.asarray(z))
    s_full = qhf_calibrated(jnp.asarray(x), jnp.asarray(xr),
                            jnp.asarray(z), calib)
    s_half = qhf_calibrated(jnp.asarray(x[:50]), jnp.asarray(xr[:50]),
                            jnp.asarray(z[:50]), calib)
    np.testing.assert_allclose(np.asarray(s_full.f)[:50],
                               np.asarray(s_half.f), rtol=1e-9)


def test_q4_testset_vs_frozen_moments(rng):
    """quirk Q4: full_distance with moments=None re-derives dofs from the
    scored set; frozen moments keep the decision rule fixed."""
    mu = rng.normal(0, 1, (80, 6))
    latent_mean = np.zeros(6)
    q = rng.chisquare(4, 80)
    r_test = full_distance(jnp.asarray(mu), jnp.asarray(latent_mean),
                           jnp.asarray(q))
    h = np.sum(mu**2, axis=1)
    moments = (np.mean(h), np.std(h), np.mean(q), np.std(q))
    r_frozen_same = full_distance(jnp.asarray(mu), jnp.asarray(latent_mean),
                                  jnp.asarray(q), moments=tuple(
                                      jnp.asarray(m) for m in moments))
    # on the defining set both agree
    np.testing.assert_allclose(np.asarray(r_test.f),
                               np.asarray(r_frozen_same.f), rtol=1e-6)
    # on a different set they diverge (the leak)
    mu2 = mu + 1.0
    q2 = q * 2.0
    r_leaky = full_distance(jnp.asarray(mu2), jnp.asarray(latent_mean),
                            jnp.asarray(q2))
    r_frozen = full_distance(jnp.asarray(mu2), jnp.asarray(latent_mean),
                             jnp.asarray(q2), moments=tuple(
                                 jnp.asarray(m) for m in moments))
    assert float(r_leaky.f_crit) != pytest.approx(float(r_frozen.f_crit))


def test_q5_vaesimca_fdist_differs_from_simca_fdist(rng):
    """quirk Q5: VAESIMCA 'Fdist' scales an empirical percentile; classical
    SIMCA 'Fdist' uses the F quantile — same flag, different limit."""
    from ocm_tpu.models.vaesimca import _t2_limit
    from ocm_tpu.stats.limits import t2_limit

    t2 = jnp.asarray(rng.chisquare(5, 150))
    vs_lim, _, _ = _t2_limit(t2, 5, "Fdist", 0.95)
    simca_lim = t2_limit(t2, 5, "Fdist", 0.95).limit
    assert float(vs_lim) != pytest.approx(float(simca_lim), rel=1e-3)
    # and VAESIMCA 'chi2' is a plain percentile (VAE_SIMCA.py:289-290)
    chi2_lim, _, _ = _t2_limit(t2, 5, "chi2", 0.95)
    np.testing.assert_allclose(float(chi2_lim),
                               float(jnp.percentile(t2, 95.0)), rtol=1e-9)


def test_q11_double_standardization_changes_q(rng):
    """quirk Q11: the latent round-trip Q differs between the compat
    (double-standardize) and corrected modes whenever spec stats are not
    identity."""
    import jax as _jax

    from ocm_tpu.models.bundle import new_bundle
    from ocm_tpu.models.vae import ConvVAE1D, init_vae
    from ocm_tpu.models.vaesimca import _latent_roundtrip_q

    model = ConvVAE1D(input_length=40, latent_dim=4, conv_blocks=2,
                      n_filters=8, hidden_fc=16)
    params, bs = init_vae(model, _jax.random.key(0))
    mean = jnp.asarray(rng.normal(0, 1, 40), jnp.float32)
    std = jnp.asarray(rng.uniform(0.5, 2.0, 40), jnp.float32)
    bundle = new_bundle(params, bs, mean, std, 4)
    z = jnp.asarray(rng.normal(0, 1, (8, 4)), jnp.float32)
    q_compat = _latent_roundtrip_q(model, bundle, z, True)
    q_fixed = _latent_roundtrip_q(model, bundle, z, False)
    assert not np.allclose(np.asarray(q_compat), np.asarray(q_fixed),
                           rtol=1e-3)


def test_fit_validation_errors(three_class):
    x, y = three_class
    with pytest.raises(ValueError, match="n_components"):
        SIMCA(n_components=999, model_class=0, verbose=False).fit(x, y)
    with pytest.raises(ValueError, match="no samples"):
        SIMCA(n_components=3, model_class=7, verbose=False).fit(x, y)
    with pytest.raises(ValueError, match="length"):
        SIMCA(n_components=[2, 3], model_class=[0, 1, 2],
              verbose=False).fit(x, y)


def test_multiclass_predict_batched_matches_loop(three_class):
    """Uniform-k multi-class predict batches all classes into one dispatch;
    results must equal the per-class loop (incl. the dd quirk path)."""
    x, y = three_class
    for dt in ("alt", "dd"):
        m = SIMCA(n_components=4, model_class=[0, 1, 2], type=dt,
                  verbose=False)
        m.fit(x, y)
        pred_batched = m.predict(x)
        # force the loop path via per-class (equal) component list
        m2 = SIMCA(n_components=[4, 4, 3], model_class=[0, 1, 2], type=dt,
                   verbose=False)
        m2.fit(x, y)
        # compare first two classes against individually-fitted singles
        for i, cls in enumerate([0, 1, 2]):
            single = SIMCA(n_components=4, model_class=cls, type=dt,
                           verbose=False)
            single.fit(x, y)
            sm = single._model[cls]
            if dt == "dd":
                # quirk Q7: multi-class dd uses the LAST class's dofs but
                # each class's own D_limit
                sm = sm._replace(t2_res=m._model[2].t2_res,
                                 q_res=m._model[2].q_res)
            from ocm_tpu.models.simca import simca_decide
            acc, _, _, _ = simca_decide(sm, jnp.asarray(x), dt)
            np.testing.assert_array_equal(pred_batched[:, i],
                                          np.asarray(acc))


def test_vaesimca_classical_limits_mode(three_class, rng):
    """classical_limits=True uses the true F/chi2 engines — limits differ
    from the quirk-Q5 percentile formulas but decisions stay sane."""
    import jax as _jax

    from ocm_tpu.models.bundle import new_bundle
    from ocm_tpu.models.vae import ConvVAE1D, init_vae
    from ocm_tpu.models.vaesimca import fit_vaesimca, predict_vaesimca

    x, y = three_class
    x_cal = x[y == 0].astype(np.float32)
    model = ConvVAE1D(input_length=x.shape[1], latent_dim=4, conv_blocks=2,
                      n_filters=8, hidden_fc=16)
    params, bs = init_vae(model, _jax.random.key(0))
    mean = x_cal.mean(axis=0).astype(np.float32)
    std = (x_cal.std(axis=0) + 1e-12).astype(np.float32)
    bundle = new_bundle(params, bs, jnp.asarray(mean), jnp.asarray(std), 4)

    compat = fit_vaesimca(model, bundle, x_cal)
    fixed = fit_vaesimca(model, bundle, x_cal, classical_limits=True)
    assert float(compat.t2_limit) != pytest.approx(float(fixed.t2_limit),
                                                   rel=1e-3)
    acc, t2, q = predict_vaesimca(model, bundle, fixed, x.astype(np.float32))
    assert np.isfinite(np.asarray(t2)).all()
    assert acc.shape == (x.shape[0],)
