"""Minimal in-repo fake of the Optuna surface used by
``ocm_tpu.utils.sweep`` (``run_optuna_study`` / ``optuna_objective`` /
``pruning_report``).

Optuna is not installed in this environment, so without this fake the
adapter at ``utils/sweep.py`` (mirroring
/root/reference/optim_bce_nuts.py:286-307) would ship untested.  Tests
inject this module as ``sys.modules["optuna"]`` so the REAL adapter code
executes against a faithful stand-in.

Faithful for exactly the features the adapter touches:

- ``create_study(direction=, sampler=, pruner=)``
- ``samplers.TPESampler(seed=)`` — sampling here is seeded random-uniform;
  TPE sampling *quality* is the job of ``ocm_tpu.utils.tpe``, not this fake
- ``pruners.MedianPruner(n_startup_trials=, n_warmup_steps=)`` — real
  median rule: prune when the trial's latest reported value is worse than
  the median of completed trials' values at the same step
- ``Trial.suggest_int/suggest_float(log=)/suggest_categorical``,
  ``Trial.report(value, step)``, ``Trial.should_prune()``
- ``Study.optimize(objective, n_trials=)``, ``best_value``, ``best_params``,
  ``best_trial``, ``trials``; ``TrialPruned`` marks a trial PRUNED
"""

import math
import random
import statistics


class TrialPruned(Exception):
    """optuna.TrialPruned / optuna.exceptions.TrialPruned."""


class exceptions:  # noqa: N801 — mirrors the optuna.exceptions namespace
    TrialPruned = TrialPruned


class TPESampler:
    def __init__(self, seed=None):
        self.seed = seed
        self.rng = random.Random(seed)


class MedianPruner:
    def __init__(self, n_startup_trials=5, n_warmup_steps=0):
        self.n_startup_trials = n_startup_trials
        self.n_warmup_steps = n_warmup_steps

    def prune(self, study, trial):
        if not trial.intermediate_values:
            return False
        step = max(trial.intermediate_values)
        if step < self.n_warmup_steps:
            return False
        completed = [t for t in study.trials
                     if t is not trial and t.state == "COMPLETE"
                     and step in t.intermediate_values]
        if len(completed) < self.n_startup_trials:
            return False
        med = statistics.median(t.intermediate_values[step]
                                for t in completed)
        v = trial.intermediate_values[step]
        return v > med if study.direction == "minimize" else v < med


class Trial:
    def __init__(self, study, number):
        self.study = study
        self.number = number
        self.params = {}
        self.intermediate_values = {}
        self.state = "RUNNING"
        self.value = None

    def suggest_int(self, name, low, high):
        v = self.study.sampler.rng.randint(low, high)
        self.params[name] = v
        return v

    def suggest_float(self, name, low, high, log=False):
        r = self.study.sampler.rng
        if log:
            v = math.exp(r.uniform(math.log(low), math.log(high)))
        else:
            v = r.uniform(low, high)
        self.params[name] = v
        return v

    def suggest_categorical(self, name, choices):
        v = self.study.sampler.rng.choice(list(choices))
        self.params[name] = v
        return v

    def report(self, value, step):
        self.intermediate_values[int(step)] = float(value)

    def should_prune(self):
        return self.study.pruner.prune(self.study, self)


class Study:
    def __init__(self, direction, sampler, pruner):
        if direction not in ("minimize", "maximize"):
            raise ValueError(direction)
        self.direction = direction
        self.sampler = sampler if sampler is not None else TPESampler()
        self.pruner = pruner if pruner is not None else MedianPruner()
        self.trials = []

    def optimize(self, objective, n_trials):
        for _ in range(n_trials):
            t = Trial(self, len(self.trials))
            self.trials.append(t)
            try:
                t.value = float(objective(t))
                t.state = "COMPLETE"
            except TrialPruned:
                t.state = "PRUNED"

    @property
    def best_trial(self):
        done = [t for t in self.trials if t.state == "COMPLETE"]
        if not done:
            raise ValueError("no completed trials")
        pick = max if self.direction == "maximize" else min
        return pick(done, key=lambda t: t.value)

    @property
    def best_value(self):
        return self.best_trial.value

    @property
    def best_params(self):
        return dict(self.best_trial.params)


def create_study(direction="minimize", sampler=None, pruner=None):
    return Study(direction, sampler, pruner)


class samplers:  # noqa: N801 — mirrors the optuna.samplers namespace
    TPESampler = TPESampler


class pruners:  # noqa: N801 — mirrors the optuna.pruners namespace
    MedianPruner = MedianPruner
