"""Dependency-free TPE sampler + median pruner (ocm_tpu.utils.tpe).

Capability target: the reference's Optuna protocol
(optim_bce_nuts.py:286-292 — TPESampler(seed=42) +
MedianPruner(n_warmup_steps=10) + per-epoch report/prune at :197-199),
reproduced without optuna.  Oracles here are hand-computed medians and
analytic objectives, never the reference code.
"""

import numpy as np
import pytest

from ocm_tpu.utils.sweep import asha_vae_search, random_search
from ocm_tpu.utils.tpe import (MedianPruner, TPESampler, bohb_vae_search,
                               tpe_search, tpe_vae_search)

# ---------------------------------------------------------------------------
# MedianPruner semantics
# ---------------------------------------------------------------------------


def test_median_pruner_warmup_and_median_rule():
    p = MedianPruner(n_warmup_steps=2, maximize=False)
    # two reference trials establish per-step medians
    for step, v in enumerate([1.0, 0.8, 0.6]):
        p.report("a", step, v)
    for step, v in enumerate([1.2, 1.0, 0.9]):
        p.report("b", step, v)

    # below warmup: never prune, even when clearly worst
    p.report("c", 0, 100.0)
    assert not p.should_prune("c")
    p.report("c", 1, 100.0)
    assert not p.should_prune("c")
    # at step 2 median of others is median(0.6, 0.9) = 0.75; best-so-far
    # 100 > 0.75 -> prune
    p.report("c", 2, 100.0)
    assert p.should_prune("c")

    # a trial at the median boundary survives: best-so-far 0.7 < 0.75
    p.report("d", 2, 0.7)
    assert not p.should_prune("d")


def test_median_pruner_uses_best_so_far_not_last():
    p = MedianPruner(n_warmup_steps=0, maximize=False)
    p.report("ref", 3, 0.5)
    # trial improved to 0.3 earlier, then regressed to 0.9 at step 3 —
    # optuna's rule compares the BEST intermediate so far, so no prune
    p.report("t", 1, 0.3)
    p.report("t", 3, 0.9)
    assert not p.should_prune("t")


def test_median_pruner_direction_and_divergence():
    p = MedianPruner(n_warmup_steps=0, maximize=True)
    p.report("ref", 0, 0.9)
    p.report("t", 0, 0.95)
    assert not p.should_prune("t")          # higher is better here
    p.report("u", 0, 0.5)
    assert p.should_prune("u")
    # non-finite trajectory always prunes
    q = MedianPruner(n_warmup_steps=5, maximize=False)
    q.report("nan", 0, float("nan"))
    assert not q.should_prune("nan")        # still in warmup
    q.report("nan", 7, float("nan"))
    assert q.should_prune("nan")


def test_median_pruner_needs_other_trials():
    p = MedianPruner(n_warmup_steps=0, n_min_trials=1, maximize=False)
    p.report("only", 5, 1e9)
    assert not p.should_prune("only")       # nothing to compare against


# ---------------------------------------------------------------------------
# TPESampler
# ---------------------------------------------------------------------------

SPACE = {
    "lr": ("loguniform", 1e-5, 1e-1),
    "dropout": ("uniform", 0.0, 0.5),
    "width": ("int", 4, 64),
    "act": ("categorical", ["relu", "elu", "gelu", "tanh"]),
}


def _objective(cfg):
    # smooth bowl with optimum at lr=1e-3, dropout=0.2, width=32, act=elu
    v = (np.log10(cfg["lr"]) + 3.0) ** 2
    v += 10.0 * (cfg["dropout"] - 0.2) ** 2
    v += ((cfg["width"] - 32) / 16.0) ** 2
    v += 0.0 if cfg["act"] == "elu" else 1.0
    return v


def test_tpe_respects_bounds_and_types():
    s = TPESampler(SPACE, seed=0, n_startup_trials=5, maximize=False)
    for t in range(40):
        cfg = s.suggest()
        assert 1e-5 <= cfg["lr"] <= 1e-1
        assert 0.0 <= cfg["dropout"] <= 0.5
        assert isinstance(cfg["width"], int) and 4 <= cfg["width"] <= 64
        assert cfg["act"] in SPACE["act"][1]
        s.tell(cfg, _objective(cfg))


def test_tpe_concentrates_after_startup():
    s = TPESampler(SPACE, seed=1, n_startup_trials=8, maximize=False)
    sugg = []
    for t in range(60):
        cfg = s.suggest()
        sugg.append(cfg)
        s.tell(cfg, _objective(cfg))
    late = sugg[-20:]
    # post-startup suggestions cluster near the optimum on every axis
    lr_err = np.mean([abs(np.log10(c["lr"]) + 3.0) for c in late])
    assert lr_err < 1.0, lr_err          # random-uniform baseline ~ 1.6
    elu_frac = np.mean([c["act"] == "elu" for c in late])
    assert elu_frac > 0.5                # random baseline 0.25


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tpe_search_beats_random_search(seed):
    n = 35
    _, best_r, _ = random_search(_objective, SPACE, n, seed=seed,
                                 maximize=False)
    best_cfg, best_t, hist = tpe_search(_objective, SPACE, n, seed=seed,
                                        maximize=False, n_startup_trials=8)
    assert len(hist) == n
    assert best_t <= best_r + 0.25       # never meaningfully worse...
    assert _objective(best_cfg) == best_t


def test_tpe_exploits_better_than_random_on_average():
    # the robust discriminator: where does each search SPEND its late
    # budget?  TPE's last evaluations concentrate near the optimum while
    # random stays uniform (best-so-far alone is too noisy at 35 trials)
    seeds = range(6)
    r, t = [], []
    for s in seeds:
        _, _, hr = random_search(_objective, SPACE, 35, seed=s,
                                 maximize=False)
        _, _, ht = tpe_search(_objective, SPACE, 35, seed=s,
                              maximize=False, n_startup_trials=8)
        r.append(np.mean([h["value"] for h in hr[-10:]]))
        t.append(np.mean([h["value"] for h in ht[-10:]]))
    assert np.mean(t) < np.mean(r)


def test_tpe_ignores_divergent_trials():
    s = TPESampler({"x": ("uniform", 0.0, 1.0)}, seed=3,
                   n_startup_trials=2, maximize=False)
    # good region near 0.9; diverged (inf) runs at 0.1 must not attract
    for x, v in [(0.9, 0.1), (0.88, 0.12), (0.1, np.inf), (0.12, np.inf),
                 (0.5, 1.0), (0.4, 1.2)]:
        s.tell({"x": x}, v)
    xs = [s.suggest()["x"] for _ in range(30)]
    assert np.mean(xs) > 0.5


def test_tpe_validates_space_and_gamma():
    with pytest.raises(ValueError, match="kind"):
        TPESampler({"x": ("normal", 0, 1)})
    with pytest.raises(ValueError, match="gamma"):
        TPESampler(SPACE, gamma=1.5)


# ---------------------------------------------------------------------------
# End-to-end reference protocol on a tiny VAE (CPU)
# ---------------------------------------------------------------------------


def test_tpe_vae_search_end_to_end(synthetic_spectra):
    x_cal, x_val = synthetic_spectra
    space = {"lr": ("loguniform", 1e-4, 1e-2),
             "beta": ("loguniform", 1e-3, 1.0)}
    base = {"latent_dim": 4, "conv_blocks": 1, "n_filters": 4,
            "kernel_size": 5, "hidden_fc": 16, "batch_size": 16,
            "loss_type": "euclidean"}
    out = tpe_vae_search(x_cal, x_val, space=space, n_trials=4,
                         max_epochs=4, seed=0, base_config=base,
                         block_epochs=2, n_warmup_steps=1, verbose=False)
    assert out["best_bundle"] is not None
    assert np.isfinite(out["best_value"])
    assert len(out["history"]) == 4
    assert out["total_epochs"] <= 4 * 4
    for h in out["history"]:
        assert h["epochs"] <= 4
        assert set(base) <= set(h["config"])
    # pruned trials must stop early and report fewer epochs
    for h in out["history"]:
        if h["pruned"]:
            assert h["epochs"] < 4


def test_bohb_vae_search_end_to_end(synthetic_spectra):
    x_cal, x_val = synthetic_spectra
    space = {"lr": ("loguniform", 1e-4, 1e-2),
             "beta": ("loguniform", 1e-3, 1.0)}
    base = {"latent_dim": 4, "conv_blocks": 1, "n_filters": 4,
            "kernel_size": 5, "hidden_fc": 16, "batch_size": 16,
            "loss_type": "euclidean"}
    out = bohb_vae_search(x_cal, x_val, space=space, n_brackets=2,
                          trials_per_bracket=4, max_epochs=4, reduction=2,
                          seed=0, base_config=base, verbose=False)
    assert out["best_bundle"] is not None
    assert np.isfinite(out["best_value"])
    assert len(out["history"]) == 2
    # halving within brackets: budget strictly below full fidelity
    assert out["total_epochs"] < 2 * 4 * 4
    for h in out["history"]:
        assert len(h["trials"]) == 4
        for tr in h["trials"]:
            assert set(base) <= set(tr["config"])
            assert 1 <= tr["epochs"] <= 4
    # bracket 1's cohort came from a sampler that observed bracket 0:
    # its best can't be worse than simply re-running random configs is
    # guaranteed nothing — but the incumbent must be the min over brackets
    assert out["best_value"] == min(h["best_value"] for h in out["history"])
    with pytest.raises(ValueError, match="n_brackets"):
        bohb_vae_search(x_cal, x_val, space=space, n_brackets=0)


def test_bohb_samples_second_bracket_adaptively(synthetic_spectra, monkeypatch):
    """The sampler must be TOLD every bracket-0 trial before bracket 1 is
    drawn (the BOHB loop's defining property)."""
    x_cal, x_val = synthetic_spectra
    space = {"lr": ("loguniform", 1e-4, 1e-2)}
    base = {"latent_dim": 4, "conv_blocks": 1, "n_filters": 4,
            "kernel_size": 5, "hidden_fc": 16, "batch_size": 16,
            "loss_type": "euclidean"}
    observed_at_suggest = []
    orig = TPESampler.suggest

    def spy(self):
        observed_at_suggest.append(len(self._values))
        return orig(self)

    monkeypatch.setattr(TPESampler, "suggest", spy)
    bohb_vae_search(x_cal, x_val, space=space, n_brackets=2,
                    trials_per_bracket=3, max_epochs=2, reduction=2,
                    seed=0, base_config=base, verbose=False)
    # bracket 0 suggests saw 0 observations; bracket 1 suggests saw all 3
    assert observed_at_suggest[:3] == [0, 0, 0]
    assert all(n == 3 for n in observed_at_suggest[3:6])


def test_asha_explicit_configs_cohort(synthetic_spectra):
    """asha_vae_search(configs=...) trains exactly the given cohort and
    reports a per-trial summary aligned with it."""
    x_cal, x_val = synthetic_spectra
    base = {"latent_dim": 4, "conv_blocks": 1, "n_filters": 4,
            "kernel_size": 5, "hidden_fc": 16, "batch_size": 16,
            "loss_type": "euclidean"}
    cohort = [{"lr": 1e-3}, {"lr": 3e-3}, {"lr": 1e-2}]
    out = asha_vae_search(x_cal, x_val, None, n_trials=99,  # ignored
                          max_epochs=4, reduction=2, seed=0,
                          base_config=base, configs=cohort, verbose=False)
    assert len(out["trials"]) == 3
    for tr, cfg in zip(out["trials"], cohort):
        assert tr["config"]["lr"] == cfg["lr"]
        assert np.isfinite(tr["best_val"]) or tr["best_val"] == np.inf
    assert out["best_config"]["lr"] in [c["lr"] for c in cohort]
    with pytest.raises(ValueError, match="non-empty"):
        asha_vae_search(x_cal, x_val, None, base_config=base, configs=[])


# ---------------------------------------------------------------------------
# NaN / accounting regressions (deterministic fakes — forcing a real VAE to
# diverge at a chosen epoch is seed-fragile)
# ---------------------------------------------------------------------------


def _fake_blocked(val_losses_by_call):
    """train_vae_blocked stand-in returning scripted trajectories."""
    import jax.numpy as jnp

    from ocm_tpu.models.trainer import TrainResult

    calls = {"n": 0}

    def fake(model, x_cal, x_val, cfg, rng, block_epochs=10, report=None,
             spec_stats=None):
        vls = np.asarray(val_losses_by_call[calls["n"]
                                            % len(val_losses_by_call)],
                         dtype=np.float64)
        calls["n"] += 1
        bundle = ("bundle", calls["n"])
        return TrainResult(bundle, jnp.asarray(vls), jnp.asarray(vls),
                           jnp.asarray(int(np.nanargmin(vls))),
                           None, None, None)

    return fake


def test_tpe_scores_partially_diverged_trial_by_best_finite(monkeypatch):
    """A trajectory whose TAIL is NaN must score by its best finite loss
    (np.min would return NaN, locking the trial out of the incumbent)."""
    import ocm_tpu.models.trainer as trainer_mod

    monkeypatch.setattr(trainer_mod, "train_vae_blocked",
                        _fake_blocked([[0.45, 0.40, np.nan]]))
    out = tpe_vae_search(np.zeros((8, 32), np.float32),
                         np.zeros((4, 32), np.float32),
                         space={"lr": ("loguniform", 1e-4, 1e-2)},
                         n_trials=2, max_epochs=3, seed=0, verbose=False)
    assert out["best_value"] == pytest.approx(0.40)
    assert out["best_bundle"] is not None
    for h in out["history"]:
        assert h["value"] == pytest.approx(0.40)   # never NaN


def test_tpe_epoch_accounting_counts_to_block_boundary(monkeypatch):
    """A mid-block prune stops reporting, but the dispatched block trained
    to its boundary — total_epochs must count the device budget."""
    import ocm_tpu.models.trainer as trainer_mod

    # scripted single reported epoch (as if pruned at epoch 0 of a block)
    monkeypatch.setattr(trainer_mod, "train_vae_blocked",
                        _fake_blocked([[0.5]]))
    out = tpe_vae_search(np.zeros((8, 32), np.float32),
                         np.zeros((4, 32), np.float32),
                         space={"lr": ("loguniform", 1e-4, 1e-2)},
                         n_trials=2, max_epochs=8, block_epochs=4,
                         seed=0, verbose=False)
    for h in out["history"]:
        assert h["epochs"] == 1                 # reported prefix
        assert h["epochs_device"] == 4          # block boundary
        assert h["pruned"]
    assert out["total_epochs"] == 8             # 2 trials x one 4-ep block


def test_blocked_trainer_adopts_finite_best_despite_nan_tail(monkeypatch):
    """Regression: np.argmin over a val prefix containing NaN returned the
    NaN's index, so the finite best epoch's checkpoint was never adopted
    and TrainResult.bundle came back None."""
    import jax
    import jax.numpy as jnp

    import ocm_tpu.models.trainer as trainer_mod
    from ocm_tpu.models.trainer import (TrainConfig, TrainResult,
                                        train_vae_blocked)

    def fake_train_vae(model, x_cal, x_val, cfg, rng, spec_stats=None,
                       init_state=None, epoch_offset=0):
        vls = jnp.asarray([0.4, jnp.nan][:cfg.epochs])
        # the in-scan best tracker skips NaN (NaN < best is False), so the
        # genuine train_vae would report best_epoch 0 here
        return TrainResult(("best@", epoch_offset), vls, vls,
                           jnp.asarray(0), None, None, None)

    monkeypatch.setattr(trainer_mod, "train_vae", fake_train_vae)
    r = train_vae_blocked(object(), np.zeros((8, 32), np.float32),
                          np.zeros((4, 32), np.float32),
                          TrainConfig(epochs=2), jax.random.key(0),
                          block_epochs=2,
                          spec_stats=(np.zeros(32), np.ones(32)))
    assert r.bundle == ("best@", 0)
    assert int(r.best_epoch) == 0


@pytest.fixture(scope="module")
def synthetic_spectra():
    rng = np.random.default_rng(0)
    base = np.sin(np.linspace(0, 6, 32))
    x = base + 0.1 * rng.standard_normal((64, 32))
    return x[:48].astype(np.float32), x[48:].astype(np.float32)
