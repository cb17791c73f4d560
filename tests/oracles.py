"""NumPy/scipy oracles mirroring the reference formulas.

These re-derive the math of TEAM-AIOLY/OCM-VAE-SIMCA (file:line cited per
function) directly in NumPy + sklearn so the JAX implementations can be
asserted against them at float64.  They are test-only code.
"""

import numpy as np
import scipy.stats as stats
from scipy.special import erfinv
from sklearn.decomposition import PCA


def tlim_oracle(t2, k, method, cl):
    """utils/SIMCA.py:156-182."""
    n = len(t2)
    if method == "perc":
        return np.percentile(t2, cl * 100), None, None
    if method == "Fdistrig":
        f = stats.f.ppf(cl, k, n - k)
        return (k / n) * (n**2 - 1) / (n - k) * f, None, None
    if method == "Fdist":
        f = stats.f.ppf(cl, k, n - k)
        return k * (n - 1) / (n - k) * f, None, None
    if method == "chi2":
        return stats.chi2.ppf(cl, k), None, None
    if method == "chi2pom":
        h0 = float(np.mean(t2))
        var = float(np.var(t2, ddof=1)) if len(t2) > 1 else 0.0
        nh = max(int(np.round(2 * h0**2 / var)) if var > 0 else 1, 1)
        return h0 * stats.chi2.ppf(cl, nh) / nh, nh, h0
    raise ValueError(method)


def qlim_oracle(q, eigs, k, method, cl):
    """utils/SIMCA.py:184-217; eigs = full explained_variance_."""
    if method == "perc":
        return np.percentile(q, cl * 100), None, None
    if method == "jm":
        t1 = eigs[k:].sum()
        t2_ = (eigs[k:] ** 2).sum()
        t3 = (eigs[k:] ** 3).sum()
        if t1 == 0:
            return 0.0, None, None
        h0 = max(1 - (2 * t1 * t3) / (3 * t2_**2), 0.001)
        ca = np.sqrt(2) * erfinv(2 * cl - 1)
        h1 = ca * np.sqrt(2 * t2_ * h0**2) / t1
        h2 = t2_ * h0 * (h0 - 1) / t1**2
        return t1 * (h1 + 1 + h2) ** (1 / h0), None, None
    if method == "chi2box":
        t1 = eigs[k:].sum()
        t2_ = (eigs[k:] ** 2).sum()
        return (t2_ / t1) * stats.chi2.ppf(cl, t1**2 / t2_), None, None
    if method == "chi2pom":
        v0 = np.mean(q)
        nv = max(round(2 * v0**2 / np.var(q, ddof=1)), 1)
        return v0 * stats.chi2.ppf(cl, nv) / nv, nv, v0
    raise ValueError(method)


def dlim_oracle(dtype_, t2lim, qlim, eigs, k, dcl, t2dof=None, qdof=None):
    """utils/SIMCA.py:219-236."""
    if dtype_ == "sim":
        return 1.0
    if dtype_ == "alt":
        return np.sqrt(2)
    if dtype_ == "ci":
        t1 = eigs[k:].sum()
        t2_ = (eigs[k:] ** 2).sum()
        tr1 = k / t2lim + t1 / qlim
        tr2 = k / t2lim**2 + t2_ / qlim**2
        return (tr2 / tr1) * stats.chi2.ppf(dcl, tr1**2 / tr2)
    if dtype_ == "dd":
        return stats.chi2.ppf(dcl, t2dof + qdof)
    raise ValueError(dtype_)


class SimcaOracle:
    """Single-class SIMCA oracle mirroring utils/SIMCA.py:62-145.

    Uses sklearn full-SVD PCA for the decomposition (exactly the reference's
    limit-fitting path) and the full-SVD top-k for scoring (the reference's
    refit model PCA(k) equals this for deterministic solvers; sklearn auto
    may pick randomized SVD for large inputs, a documented tolerance).
    """

    def __init__(self, dtype_="alt", t2lim="Fdist", qlim="jm",
                 t2cl=0.95, qcl=0.95, dcl=0.95):
        if dtype_ == "dd":
            t2lim = "chi2pom"
            qlim = "chi2pom"
        self.type = dtype_
        self.t2lim_m = t2lim
        self.qlim_m = qlim
        self.t2cl, self.qcl, self.dcl = t2cl, qcl, dcl

    def fit(self, x, k):
        self.k = k
        pca = PCA(n_components=None, svd_solver="full")
        t_full = pca.fit_transform(x)
        self.t = t_full[:, :k]
        self.p = pca.components_[:k]
        self.mean = pca.mean_
        self.eigs = pca.explained_variance_
        x_rec = self.t @ self.p + self.mean
        resid = x - x_rec
        self.invcovT = np.linalg.pinv(np.cov(self.t, rowvar=False))
        self.t2 = np.einsum("ij,jk,ik->i", self.t, self.invcovT, self.t)
        self.q = np.sum(resid**2, axis=1)
        self.t2_limit, self.t2dof, self.t2scale = tlim_oracle(
            self.t2, k, self.t2lim_m, self.t2cl)
        self.q_limit, self.qdof, self.qscale = qlim_oracle(
            self.q, self.eigs, k, self.qlim_m, self.qcl)
        self.d_limit = dlim_oracle(self.type, self.t2_limit, self.q_limit,
                                   self.eigs, k, self.dcl, self.t2dof,
                                   self.qdof)
        return self

    def scores(self, x):
        t = (x - self.mean) @ self.p.T
        x_rec = t @ self.p + self.mean
        q = np.sum((x - x_rec) ** 2, axis=1)
        t2 = np.einsum("ij,jk,ik->i", t, self.invcovT, t)
        return t2, q

    def decide(self, x):
        t2, q = self.scores(x)
        if self.type == "sim":
            dred = np.maximum(t2 / self.t2_limit, q / self.q_limit)
        elif self.type == "alt":
            dred = np.sqrt((t2 / self.t2_limit) ** 2 + (q / self.q_limit) ** 2)
        elif self.type == "ci":
            dred = t2 / self.t2_limit + q / self.q_limit
        elif self.type == "dd":
            dred = self.t2dof * t2 / self.t2scale + self.qdof * q / self.qscale
        return dred < self.d_limit, dred, t2, q


def make_class_spectra(rng, n, length, center_shift=0.0, scale=1.0):
    """Synthetic class cluster of smooth spectra."""
    t = np.linspace(0, 1, length)
    base = np.sin(2 * np.pi * (3 + center_shift) * t) + center_shift
    amp = rng.normal(1.0, 0.08, size=(n, 1)) * scale
    return (amp * base[None, :] +
            rng.normal(0, 0.02, size=(n, length))).astype(np.float64)
