"""Fused BatchNorm + activation for the VAE training step.

Built to attack what round-1 measured as a ~44% BatchNorm share of the
small-batch VAE step.  The corrected hardware measurement
(docs/BENCHMARKS.md: warmups must FETCH a value on the hosted TPU, or the
lazy axon dispatch fakes the timing) shows the true step is 0.582 ms at
B=64 with only a 0.100 ms BN share — and this kernel, while numerically
exact (tests/test_bn.py), is SLOWER than XLA's fused reduce+normalize
chain (0.805 ms/step): the single-block structure forgoes pipelining and
the (N,C)<->(C,N) relayouts cost more than the kernels they remove.  It is
kept as the measured evidence that XLA's default is the right one (same
verdict as the T2/Q scoring kernel in ocm_tpu.ops.kernels); select it with
``ConvVAE1D(bn_impl='fused')`` / ``BatchNormAct(impl='fused')``.

This module collapses each BatchNorm+activation into ONE Pallas kernel per
direction:

- forward: one VMEM-resident pass computes the per-channel sums, the
  fast-variance statistics (E[x^2] - E[x]^2, matching flax), the affine
  normalization and the activation — a single kernel instead of XLA's
  reduce + normalize chain.
- backward: an analytic custom VJP in one kernel: act'(y) from the saved
  residuals, then the closed-form BatchNorm gradient
  dx = rstd*gamma*(dy - mean(dy) - xhat*mean(dy*xhat)).

Layout: channels ride the sublane axis — the wrapper reshapes
(B, L, C) -> (N=B*L, C) and transposes to (C, N) so a C=32 layer costs
32xN VMEM instead of the 128-lane-padded 4x blowup of (N, 32).  The
kernel is a single block (whole tensor VMEM-resident), gated on a VMEM
budget; larger tensors and cross-replica training (``axis_name`` psum'd
statistics, flax semantics via lax.pmean) fall back to an equivalent jnp
formulation that XLA fuses well at those sizes.

Semantics match ``flax.linen.BatchNorm(momentum, epsilon,
use_fast_variance=True)`` + activation to float tolerance
(tests/test_bn.py), including float32 statistics under bf16 compute and
the running-average update rule.  Reference architecture being served:
torch ``BatchNorm1d`` in the ConvVAE1D blocks (vae_model.py:42-53).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


ACTS = ("elu", "gelu", "none")


def apply_act(y, act: str, in_kernel: bool = False):
    """``in_kernel=True`` avoids primitives Mosaic can't lower (expm1);
    exp(y)-1 loses ~1e-7 absolute accuracy near y=0, within the activation
    tolerance asserted by tests/test_bn.py."""
    if act == "elu":
        neg = jnp.exp(y) - 1.0 if in_kernel else jnp.expm1(y)
        return jnp.where(y > 0, y, neg)
    if act == "gelu":
        return jax.nn.gelu(y, approximate=False)
    if act == "none":
        return y
    raise ValueError(f"unknown activation {act!r}; expected one of {ACTS}")


def act_grad(y, act: str):
    """d act(y) / dy evaluated at pre-activation y."""
    if act == "elu":
        return jnp.where(y > 0, 1.0, jnp.exp(y))
    if act == "gelu":
        # exact GELU': Phi(y) + y*phi(y)
        phi = jnp.exp(-0.5 * y * y) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
        cdf = 0.5 * (1.0 + jax.lax.erf(y / jnp.sqrt(2.0)))
        return cdf + y * phi
    if act == "none":
        return jnp.ones_like(y)
    raise ValueError(f"unknown activation {act!r}; expected one of {ACTS}")


# ---------------------------------------------------------------------------
# Pallas kernels (single block, (C, N) layout, stats over the N lanes).
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, g_ref, b_ref, o_ref, mean_ref, var_ref,
                *, n: float, eps: float, act: str):
    x = x_ref[...]                                    # (Cp, Np) f32
    mean = jnp.sum(x, axis=1, keepdims=True) * (1.0 / n)
    mean2 = jnp.sum(x * x, axis=1, keepdims=True) * (1.0 / n)
    var = jnp.maximum(mean2 - mean * mean, 0.0)       # flax fast variance
    mul = jax.lax.rsqrt(var + eps) * g_ref[...]
    y = (x - mean) * mul + b_ref[...]
    o_ref[...] = apply_act(y, act, in_kernel=True)
    mean_ref[...] = mean
    var_ref[...] = var


def _bwd_kernel(x_ref, g_ref, b_ref, mean_ref, var_ref, dout_ref,
                dx_ref, dg_ref, db_ref, *, n: float, eps: float, act: str):
    x = x_ref[...]
    gamma = g_ref[...]
    mean = mean_ref[...]
    rstd = jax.lax.rsqrt(var_ref[...] + eps)
    xhat = (x - mean) * rstd
    y = xhat * gamma + b_ref[...]
    dy = dout_ref[...] * act_grad(y, act)
    dbeta = jnp.sum(dy, axis=1, keepdims=True)
    dgamma = jnp.sum(dy * xhat, axis=1, keepdims=True)
    dx_ref[...] = (rstd * gamma) * (
        dy - dbeta * (1.0 / n) - xhat * (dgamma * (1.0 / n)))
    dg_ref[...] = dgamma
    db_ref[...] = dbeta


def _pad_cn(x_cn, cp: int, npad: int):
    c, n = x_cn.shape
    return jnp.zeros((cp, npad), x_cn.dtype).at[:c, :n].set(x_cn)


def _bn_fwd_pallas(x_cn, gamma, beta, eps: float, act: str, interpret: bool):
    c, n = x_cn.shape
    cp, npad = _round_up(c, 8), _round_up(n, 128)
    xp = _pad_cn(x_cn, cp, npad)
    gp = jnp.zeros((cp, 1), x_cn.dtype).at[:c, 0].set(gamma)
    bp = jnp.zeros((cp, 1), x_cn.dtype).at[:c, 0].set(beta)
    out, mean, var = pl.pallas_call(
        functools.partial(_fwd_kernel, n=float(n), eps=eps, act=act),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((cp, npad), x_cn.dtype),
                   jax.ShapeDtypeStruct((cp, 1), x_cn.dtype),
                   jax.ShapeDtypeStruct((cp, 1), x_cn.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=10 * cp * npad, bytes_accessed=2 * cp * npad * 4,
            transcendentals=cp * npad),
        interpret=interpret,
    )(xp, gp, bp)
    return out[:c, :n], mean[:c, 0], var[:c, 0]


def _bn_bwd_pallas(x_cn, gamma, beta, mean, var, dout_cn,
                   eps: float, act: str, interpret: bool):
    c, n = x_cn.shape
    cp, npad = _round_up(c, 8), _round_up(n, 128)
    xp = _pad_cn(x_cn, cp, npad)
    dp = _pad_cn(dout_cn, cp, npad)   # zero-padded => no reduction pollution
    col = lambda v: jnp.zeros((cp, 1), x_cn.dtype).at[:c, 0].set(v)
    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, n=float(n), eps=eps, act=act),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((cp, npad), x_cn.dtype),
                   jax.ShapeDtypeStruct((cp, 1), x_cn.dtype),
                   jax.ShapeDtypeStruct((cp, 1), x_cn.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=16 * cp * npad, bytes_accessed=3 * cp * npad * 4,
            transcendentals=cp * npad),
        interpret=interpret,
    )(xp, col(gamma), col(beta), col(mean), col(var), dp)
    return dx[:c, :n], dg[:c, 0], db[:c, 0]


# ---------------------------------------------------------------------------
# jnp reference/fallback path (identical math; XLA-fused).
# ---------------------------------------------------------------------------

def bn_act_stats(x, axis_name: Optional[str] = None):
    """flax-equivalent batch statistics over all axes but the last, in
    float32 (force_float32_reductions), optionally pmean'd cross-replica."""
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    mean2 = jnp.mean(xf * xf, axis=axes)
    if axis_name is not None:
        mean, mean2 = jax.lax.pmean(jnp.stack([mean, mean2]), axis_name)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    return mean, var


def bn_act_normalize(x, mean, var, gamma, beta, eps: float, act: str,
                     dtype=None):
    """y = (x - mean) * (rsqrt(var+eps)*gamma) + beta, then activation —
    the exact flax _normalize op order."""
    xf = x.astype(mean.dtype)
    mul = jax.lax.rsqrt(var + eps) * gamma.astype(mean.dtype)
    y = (xf - mean) * mul + beta.astype(mean.dtype)
    out = apply_act(y, act)
    return out.astype(dtype or x.dtype)


# ---------------------------------------------------------------------------
# Differentiable fused op (custom VJP over the Pallas pair).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_core(x, gamma, beta, eps: float, act: str, interpret: bool):
    out, mean, var, _ = _fused_fwd_impl(x, gamma, beta, eps, act, interpret)
    return out, mean, var


def _fused_fwd_impl(x, gamma, beta, eps, act, interpret):
    c = x.shape[-1]
    f32 = jnp.promote_types(x.dtype, jnp.float32)
    x_cn = x.reshape(-1, c).astype(f32).T
    o_cn, mean, var = _bn_fwd_pallas(x_cn, gamma.astype(f32),
                                     beta.astype(f32), eps, act, interpret)
    out = o_cn.T.reshape(x.shape).astype(x.dtype)
    return out, mean, var, (x, gamma, beta, mean, var)


def _fused_fwd(x, gamma, beta, eps, act, interpret):
    out, mean, var, residuals = _fused_fwd_impl(x, gamma, beta, eps, act,
                                                interpret)
    return (out, mean, var), residuals


def _fused_bwd(eps, act, interpret, residuals, cotangents):
    x, gamma, beta, mean, var = residuals
    dout, _, _ = cotangents     # stats are non-differentiable by contract
    c = x.shape[-1]
    f32 = mean.dtype
    x_cn = x.reshape(-1, c).astype(f32).T
    d_cn = dout.reshape(-1, c).astype(f32).T
    dx_cn, dg, db = _bn_bwd_pallas(x_cn, gamma.astype(f32),
                                   beta.astype(f32), mean, var, d_cn,
                                   eps, act, interpret)
    dx = dx_cn.T.reshape(x.shape).astype(x.dtype)
    return dx, dg.astype(gamma.dtype), db.astype(beta.dtype)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def fused_bn_act(x, gamma, beta, eps: float = 1e-5, act: str = "elu",
                 interpret: bool = False):
    """Training-mode BatchNorm+activation in ONE kernel each direction.

    ``x`` is (..., C); returns ``(out, mean, var)`` with mean/var the f32
    batch statistics over all leading axes (for the running-average
    update; they carry stop_gradient — gradients flow only through
    ``out``, the flax-BatchNorm convention where running stats are
    mutable state outside autodiff).
    """
    out, mean, var = _fused_core(x, gamma, beta, eps, act, interpret)
    return (out, jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var))
