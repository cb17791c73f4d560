"""scikit-learn estimator facade over the TPU-native cores.

The strict-parity wrappers (``models.simca.SIMCA``,
``models.vaesimca.VAESIMCA``) reproduce the REFERENCE API verbatim,
including its quirks: ``predict`` returns an (N, C) 0/1 acceptance matrix,
``score`` returns specificity only (quirk Q10, utils/SIMCA.py:268-278).
That surface is the migration target, not an sklearn citizen.

This module is the idiomatic-sklearn surface: estimators subclassing
``sklearn.base.BaseEstimator`` that compose with ``clone``,
``GridSearchCV``, ``cross_val_score`` and ``Pipeline``.  The reference's
own stack consumes sklearn (its PCA core is ``sklearn.decomposition.PCA``,
utils/SIMCA.py:62-75; its splits are ``sklearn.model_selection``,
utils/data_utils.py), so reference users live in this ecosystem — these
classes let them keep their tooling while the fit/score paths run as the
framework's batched XLA programs.

Conventions follow sklearn's outlier-detection API (OneClassSVM /
IsolationForest): ``predict`` returns +1 (conforming) / -1 (non-
conforming), ``decision_function`` is positive inside the acceptance
region, ``score_samples`` is a monotone anomaly score (negated reduced
distance).  The classifier follows the classifier API: ``predict``
returns labels from ``classes_`` (closed-set assignment to the nearest
class by reduced distance), ``score`` is accuracy via ``ClassifierMixin``;
the one-class accept/reject matrix SIMCA is actually about stays
available as ``accept_matrix``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:
    from sklearn.base import BaseEstimator, ClassifierMixin, OutlierMixin
    _HAVE_SKLEARN = True
except ImportError:  # pragma: no cover - sklearn is baked into this image
    _HAVE_SKLEARN = False

    class BaseEstimator:  # type: ignore[no-redef]
        pass

    class ClassifierMixin:  # type: ignore[no-redef]
        pass

    class OutlierMixin:  # type: ignore[no-redef]
        pass


def _require_sklearn():
    if not _HAVE_SKLEARN:
        raise ImportError(
            "scikit-learn is required for ocm_tpu.sklearn_api; install "
            "scikit-learn or use the native wrappers in ocm_tpu.models")


class SIMCAOneClass(OutlierMixin, BaseEstimator):
    """One-class SIMCA with the sklearn outlier-detector API.

    ``fit(X)`` treats every row of X as the target class (like
    ``OneClassSVM``; pass only target-class spectra).  ``predict`` returns
    +1/-1, ``decision_function`` is ``d_limit - reduced_distance``
    (positive = accepted, same strict ``<`` boundary as the reference),
    ``score_samples`` is ``-reduced_distance``.

    Parameters mirror the reference's SIMCA constructor semantics
    (utils/SIMCA.py:12-35) under sklearn naming discipline: nothing is
    validated or mutated before ``fit``, so ``clone``/``GridSearchCV``
    see the constructor arguments verbatim.
    """

    def __init__(self, n_components: int = 2, decision_type: str = "alt",
                 t2lim: str = "Fdist", t2cl: float = 0.95,
                 qlim: str = "jm", qcl: float = 0.95, dcl: float = 0.95,
                 solver: str = "svd", dtype=None):
        self.n_components = n_components
        self.decision_type = decision_type
        self.t2lim = t2lim
        self.t2cl = t2cl
        self.qlim = qlim
        self.qcl = qcl
        self.dcl = dcl
        self.solver = solver
        self.dtype = dtype

    def fit(self, X, y=None):
        _require_sklearn()
        from ocm_tpu.models.simca import fit_simca

        X = np.asarray(X)
        if X.ndim != 2:
            raise ValueError("X must be 2-D (n_samples, length)")
        self.model_ = fit_simca(
            jnp.asarray(X), self.n_components, self.decision_type,
            self.t2lim, self.qlim, self.t2cl, self.qcl, self.dcl,
            dtype=self.dtype, solver=self.solver)
        self.n_features_in_ = X.shape[1]
        return self

    def _dred(self, X):
        from ocm_tpu.models.simca import simca_decide

        _, dred, t2, q = simca_decide(self.model_, jnp.asarray(X),
                                      self.decision_type)
        return np.asarray(dred), np.asarray(t2), np.asarray(q)

    def decision_function(self, X):
        self._check_fitted()
        dred, _, _ = self._dred(X)
        return float(self.model_.d_limit) - dred

    def score_samples(self, X):
        self._check_fitted()
        return -self._dred(X)[0]

    def predict(self, X):
        # strict '<' boundary == the reference's accept rule
        return np.where(self.decision_function(X) > 0.0, 1, -1)

    def _check_fitted(self):
        if not hasattr(self, "model_"):
            from sklearn.exceptions import NotFittedError

            raise NotFittedError(
                "This SIMCAOneClass instance is not fitted yet.")


class SIMCAClassifier(ClassifierMixin, BaseEstimator):
    """Multi-class SIMCA as an sklearn classifier.

    ``fit(X, y)`` fits one one-class model per label in ``np.unique(y)``
    as ONE batched solve (``models.simca.fit_classes`` — vmapped class
    axis, masked statistics for unequal class sizes).  ``predict``
    assigns each sample to the class with the smallest reduced distance
    (closed-set; SIMCA's native open-set accept/reject matrix is
    ``accept_matrix``).  ``decision_function`` returns the (N, C) margin
    ``d_limit_c - dred_c`` (positive = inside class c's acceptance
    region), which also serves one-vs-rest ROC analyses.
    """

    def __init__(self, n_components: int = 2, decision_type: str = "alt",
                 t2lim: str = "Fdist", t2cl: float = 0.95,
                 qlim: str = "jm", qcl: float = 0.95, dcl: float = 0.95,
                 solver: str = "svd", dtype=None):
        self.n_components = n_components
        self.decision_type = decision_type
        self.t2lim = t2lim
        self.t2cl = t2cl
        self.qlim = qlim
        self.qcl = qcl
        self.dcl = dcl
        self.solver = solver
        self.dtype = dtype

    def fit(self, X, y):
        _require_sklearn()
        from ocm_tpu.models.simca import fit_classes

        X = np.asarray(X)
        y = np.asarray(y)
        if X.ndim != 2:
            raise ValueError("X must be 2-D (n_samples, length)")
        if y.shape[0] != X.shape[0]:
            raise ValueError("X and y have inconsistent lengths")
        self.classes_ = np.unique(y)
        if self.classes_.shape[0] < 2:
            raise ValueError(
                "SIMCAClassifier needs >= 2 classes in y; for a single "
                "target class use SIMCAOneClass")
        kwargs = dict(decision_type=self.decision_type,
                      t2_method=self.t2lim, q_method=self.qlim,
                      t2_cl=self.t2cl, q_cl=self.qcl, d_cl=self.dcl,
                      dtype=self.dtype, solver=self.solver)
        counts = {int(np.sum(y == c)) for c in self.classes_}
        if len(counts) > 1:
            # unequal class sizes route through fit_simca_masked, whose
            # dense solver is the Gram-side eigh ('svd' is the dense-path
            # name for the same decomposition) and which standardizes
            # dtype itself
            if self.dtype is not None:
                import warnings

                warnings.warn(
                    "SIMCAClassifier(dtype=...) is ignored when class "
                    "sizes are unequal: the masked batched fit "
                    "standardizes its own compute dtype", UserWarning,
                    stacklevel=2)
            kwargs.pop("dtype")
            if kwargs["solver"] == "svd":
                kwargs["solver"] = "eigh"
        self.models_ = fit_classes(
            jnp.asarray(X), y, list(self.classes_), self.n_components,
            **kwargs)
        self.n_features_in_ = X.shape[1]
        return self

    def _scores(self, X):
        """(accept, dred) both (C, N) from one fused multiclass pass."""
        from ocm_tpu.models.simca import predict_classes

        accept, dred, _, _ = predict_classes(
            self.models_, jnp.asarray(X), self.decision_type)
        return np.asarray(accept), np.asarray(dred)

    def decision_function(self, X):
        self._check_fitted()
        _, dred = self._scores(X)
        margin = np.asarray(self.models_.d_limit)[:, None] - dred
        return margin.T  # (N, C), sklearn orientation

    def predict(self, X):
        self._check_fitted()
        _, dred = self._scores(X)
        return self.classes_[np.argmin(dred, axis=0)]

    def accept_matrix(self, X):
        """(N, C) boolean acceptance matrix — SIMCA's native open-set
        decision (a sample may be accepted by several classes or none),
        the quantity the reference's ``SIMCA.predict`` returns as 0/1."""
        self._check_fitted()
        accept, _ = self._scores(X)
        return accept.T

    def _check_fitted(self):
        if not hasattr(self, "models_"):
            from sklearn.exceptions import NotFittedError

            raise NotFittedError(
                "This SIMCAClassifier instance is not fitted yet.")


def neg_val_loss(estimator, X=None, y=None):
    """Scoring callable for ``GridSearchCV``/``RandomizedSearchCV`` over
    ``VAESIMCAOneClass``: the NEGATED best validation loss of the
    estimator's own internal cal/val split (sklearn maximizes scores).

    This is exactly the shared-protocol HPO objective
    (``scripts/hpo_shared_protocol.py``, ``utils.tpe.tpe_vae_search``),
    so an sklearn search over the facade optimizes the same quantity as
    the in-repo searchers and their incumbents are directly comparable
    (docs/QUALITY.md "sklearn facade as a search surface").  The test
    fold is ignored — pass a single trivial split such as
    ``cv=[(np.arange(n), np.arange(2))]`` so each candidate trains once
    on all rows, mirroring the one-shot trial of the HPO protocol."""
    return -float(np.min(estimator.val_losses_))


class VAESIMCAOneClass(OutlierMixin, BaseEstimator):
    """Train-and-calibrate VAE-SIMCA (decision variant 5) as one sklearn
    outlier detector.

    ``fit(X)`` standardizes X, trains a ``ConvVAE1D`` on a deterministic
    cal/val split (best-val-epoch checkpoint, exactly
    ``models.trainer.train_vae``), then fits latent-SIMCA thresholds on
    the calibration split (``models.vaesimca.fit_vaesimca``,
    VAE_SIMCA.py:230-279).  ``predict`` is +1/-1 with the reference's
    strict ``<`` boundary; ``decision_function`` is
    ``d_limit - reduced_d``.

    Hyperparameters cover the reference's HPO space
    (optim_bce_nuts.py:286-307) so ``GridSearchCV``/``RandomizedSearchCV``
    can drive the same search through sklearn tooling (scoring:
    ``neg_val_loss``).  ``val_indices`` pins the validation rows
    explicitly (e.g. an object-aware split from ``utils.splits``) so a
    facade search optimizes the IDENTICAL objective as
    ``tpe_vae_search`` on the same cal/val data; when ``None`` the split
    is a seeded permutation by ``val_fraction``.
    """

    def __init__(self, latent_dim: int = 8, conv_blocks: int = 2,
                 n_filters: int = 8, hidden_fc: int = 32,
                 epochs: int = 30, batch_size: int = 64, lr: float = 1e-3,
                 beta: float = 1.0, loss_type: str = "bce",
                 decision_type: str = "alt", t2lim: str = "Fdist",
                 t2cl: float = 0.95, qlim: str = "jm", qcl: float = 0.95,
                 dcl: float = 0.95, classical_limits: bool = False,
                 val_fraction: float = 0.15, val_indices=None,
                 random_state: int = 0):
        self.latent_dim = latent_dim
        self.conv_blocks = conv_blocks
        self.n_filters = n_filters
        self.hidden_fc = hidden_fc
        self.epochs = epochs
        self.batch_size = batch_size
        self.lr = lr
        self.beta = beta
        self.loss_type = loss_type
        self.decision_type = decision_type
        self.t2lim = t2lim
        self.t2cl = t2cl
        self.qlim = qlim
        self.qcl = qcl
        self.dcl = dcl
        self.classical_limits = classical_limits
        self.val_fraction = val_fraction
        self.val_indices = val_indices
        self.random_state = random_state

    def fit(self, X, y=None):
        _require_sklearn()
        from ocm_tpu.models.trainer import TrainConfig, train_vae
        from ocm_tpu.models.vae import ConvVAE1D
        from ocm_tpu.models.vaesimca import fit_vaesimca

        X = np.asarray(X, dtype=np.float32)
        if X.ndim != 2:
            raise ValueError("X must be 2-D (n_samples, length)")
        n = X.shape[0]
        if self.val_indices is not None:
            val_idx = np.asarray(self.val_indices, dtype=np.intp)
            if val_idx.size == 0 or val_idx.min() < 0 or val_idx.max() >= n:
                raise ValueError(
                    f"val_indices must be non-empty row indices into X "
                    f"(n_samples={n})")
            mask = np.zeros(n, dtype=bool)
            mask[val_idx] = True
            if (~mask).sum() < 2:
                raise ValueError(
                    f"val_indices leaves {(~mask).sum()} calibration "
                    f"rows; need >= 2")
            x_val, x_cal = X[mask], X[~mask]
        else:
            n_val = max(1, int(round(self.val_fraction * n)))
            if n - n_val < 2:
                raise ValueError(
                    f"n_samples={n} too small for val_fraction="
                    f"{self.val_fraction}")
            perm = np.random.default_rng(self.random_state).permutation(n)
            x_val, x_cal = X[perm[:n_val]], X[perm[n_val:]]

        # builtin-float cast: search samplers (scipy loguniform) hand
        # np.float64 hyperparameters, which under x64 would promote the
        # jitted train carry to f64 mid-scan
        lr, beta = float(self.lr), float(self.beta)
        self.network_ = ConvVAE1D(input_length=X.shape[1],
                                  latent_dim=self.latent_dim,
                                  conv_blocks=self.conv_blocks,
                                  n_filters=self.n_filters,
                                  hidden_fc=self.hidden_fc, beta=beta)
        cfg = TrainConfig(epochs=self.epochs, batch_size=self.batch_size,
                          lr=lr, beta=beta, loss_type=self.loss_type)
        result = train_vae(self.network_, x_cal, x_val, cfg,
                           jax.random.PRNGKey(self.random_state))
        self.bundle_ = result.bundle
        self.train_losses_ = np.asarray(result.train_losses)
        self.val_losses_ = np.asarray(result.val_losses)
        self.best_epoch_ = int(result.best_epoch)
        self.vs_ = fit_vaesimca(
            self.network_, self.bundle_, jnp.asarray(x_cal),
            self.decision_type, self.t2lim, self.t2cl, self.qlim, self.qcl,
            self.dcl, classical_limits=self.classical_limits)
        self.n_features_in_ = X.shape[1]
        return self

    def decision_function(self, X):
        self._check_fitted()
        from ocm_tpu.models.vaesimca import predict_vaesimca, reduced_d

        _, t2, q = predict_vaesimca(self.network_, self.bundle_, self.vs_,
                                    jnp.asarray(np.asarray(X, np.float32)),
                                    self.decision_type)
        d = reduced_d(self.vs_, t2, q, self.decision_type)
        return float(self.vs_.d_limit) - np.asarray(d)

    def score_samples(self, X):
        return self.decision_function(X)

    def predict(self, X):
        return np.where(self.decision_function(X) > 0.0, 1, -1)

    def _check_fitted(self):
        if not hasattr(self, "vs_"):
            from sklearn.exceptions import NotFittedError

            raise NotFittedError(
                "This VAESIMCAOneClass instance is not fitted yet.")
