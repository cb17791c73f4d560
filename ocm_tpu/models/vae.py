"""ConvVAE1D: the single canonical 1-D convolutional beta-VAE.

The reference duplicates this architecture nearly verbatim in five+ files
(``vae_model.py:6-129``, ``VAE_SIMCA.py:72``, ``vae_simca_bce.py:72``,
``VAE_cheese.py:69``, ``utils/final_vaesimca.py:72``, ``utils/new_vae_simca.py:69``),
differing only in registered threshold buffers and the Kaiming-init
nonlinearity ('relu' at VAE_SIMCA.py:159, 'linear' elsewhere).  This framework
has exactly ONE definition; decision state (spectral standardization stats,
latent stats, thresholds) lives in the ``OCMBundle`` pytree
(ocm_tpu.models.bundle) rather than inside the network.

Architecture parity with ``vae_model.py:6-129``:

- encoder: ``conv_blocks`` Conv1d blocks, first stride 1 then ``stride``,
  filters doubling with a 1024 cap, optional BatchNorm + ELU/GELU + Dropout;
  flatten -> Linear(hidden_fc) + act + dropout -> fc_mu / fc_logvar.
- decoder: Linear(hidden_fc) + act + dropout -> Linear(fc_in) + act ->
  mirrored ConvTranspose1d stack (stride on all but the last block,
  output_padding = stride-1) -> 1x1 Conv -> crop / zero-pad to input_length.
- Kaiming-normal init with explicit torch fan conventions (conv fan_in =
  in_ch*k, transposed-conv fan_in = out_ch*k, linear fan_in = in_features),
  zero biases.
- reparameterize: mu + eps * exp(0.5 * logvar).

TPU-first choices: channels-last (N, L, C) layout so XLA tiles convs onto the
MXU without transposes; explicit per-edge padding reproduces torch length
arithmetic exactly; BatchNorm takes ``bn_axis_name`` for psum-synced
cross-replica statistics under shard_map/pjit.
"""

from __future__ import annotations

from typing import Any, Optional

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ocm_tpu.ops.bn import bn_act_normalize, bn_act_stats, fused_bn_act


class BatchNormAct(nn.Module):
    """BatchNorm + activation with a fused single-kernel training path.

    Drop-in for ``nn.BatchNorm(momentum, epsilon) -> act`` with an
    IDENTICAL variable tree (params ``scale``/``bias``, batch_stats
    ``mean``/``var``) so checkpoints and the torch importer
    (ocm_tpu.models.torch_import) are unaffected.  Semantics follow flax
    (fast variance, float32 statistics, running update
    ``m*ra + (1-m)*batch``).

    ``impl`` selects the training-path formulation:

    - 'auto'/'reference' (default): single jnp formulation (flax math);
      XLA fuses it into the surrounding step.  Measured on hardware
      (docs/BENCHMARKS.md): the full B=64 VAE train step is 0.582 ms with
      this path vs 0.805 ms with the Pallas kernel — the hand kernel's
      single-block structure (no pipelining) plus the (N,C)<->(C,N)
      relayouts cost more than XLA's reduce+normalize chain, so XLA stays
      the default, same conclusion as the T2/Q scoring kernel.
    - 'fused': ocm_tpu.ops.bn.fused_bn_act, ONE Pallas kernel per
      direction (interpret mode off-TPU — test hook).  Kept as the
      measured evidence for the choice above.

    Cross-replica training (``axis_name``) always uses the jnp path with
    lax.pmean'd statistics (flax semantics) — psums can't live inside a
    single-device kernel.
    """

    act: str = "elu"
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (feat,),
                                jnp.float32)
        ra_var = self.variable("batch_stats", "var", jnp.ones, (feat,),
                               jnp.float32)

        if not train:
            return bn_act_normalize(x, ra_mean.value, ra_var.value, scale,
                                    bias, self.epsilon, self.act,
                                    dtype=self.dtype)

        c = x.shape[-1]
        n = x.size // c
        fits_vmem = (3 * (((c + 7) // 8 * 8) * ((n + 127) // 128 * 128) * 4)
                     <= 13 * (1 << 20))
        use_fused = (self.impl == "fused" and train
                     and self.axis_name is None and fits_vmem)
        if use_fused:
            out, mean, var = fused_bn_act(
                x, scale, bias, self.epsilon, self.act,
                interpret=jax.default_backend() != "tpu")
            out = out.astype(self.dtype)
        else:
            mean, var = bn_act_stats(x, self.axis_name)
            out = bn_act_normalize(x, mean, var, scale, bias, self.epsilon,
                                   self.act, dtype=self.dtype)

        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return out


def _kaiming_normal(fan_in: int, nonlinearity: str = "linear"):
    """torch ``nn.init.kaiming_normal_`` with an explicit fan (vae_model.py:92-97)."""
    gain = float(np.sqrt(2.0)) if nonlinearity == "relu" else 1.0
    std = gain / float(np.sqrt(fan_in))

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def conv_out_length(length: int, kernel_size: int, stride: int) -> int:
    """torch Conv1d length with padding=k//2 (vae_model.py:52)."""
    padding = kernel_size // 2
    return (length + 2 * padding - (kernel_size - 1) - 1) // stride + 1


def encoder_shapes(input_length: int, conv_blocks: int, n_filters: int,
                   kernel_size: int, stride: int):
    """(channels, length) after the encoder conv stack (vae_model.py:42-54)."""
    out_len = input_length
    in_ch = 1
    filters = n_filters
    for b in range(conv_blocks):
        stride_b = 1 if b == 0 else stride
        out_len = conv_out_length(out_len, kernel_size, stride_b)
        in_ch = filters
        filters = min(filters * 2, 1024)
    return in_ch, out_len


class ConvVAE1D(nn.Module):
    """One-class spectral beta-VAE (canonical; see module docstring).

    Inputs are already-standardized spectra of shape (B, input_length); the
    per-wavelength standardization of ``vae_model.py:124,128`` is applied by
    the caller (ocm_tpu.models.bundle.standardize) so the network itself is a
    pure parametric map.
    """

    input_length: int
    latent_dim: int
    conv_blocks: int = 3
    n_filters: int = 32
    kernel_size: int = 9
    stride: int = 2
    hidden_fc: int = 256
    activation: str = "elu"
    dropout: float = 0.0
    use_batchnorm: bool = True
    beta: float = 1.0
    init_nonlinearity: str = "linear"   # 'relu' reproduces VAE_SIMCA.py:159
    bn_axis_name: Optional[str] = None
    bn_impl: str = "auto"               # 'auto' | 'fused' | 'reference'
    dtype: Any = jnp.float32

    def _act(self, x):
        if self.activation == "elu":
            return nn.elu(x)
        return nn.gelu(x, approximate=False)  # torch nn.GELU default is exact

    def _bn_act(self, x, train: bool, name: str):
        """BatchNorm (if enabled) + activation, fused on TPU (BatchNormAct)."""
        if not self.use_batchnorm:
            return self._act(x)
        return BatchNormAct(
            act=self.activation, momentum=0.9, epsilon=1e-5,
            axis_name=self.bn_axis_name if train else None,
            dtype=self.dtype, impl=self.bn_impl, name=name)(x, train=train)

    def _dropout(self, x, train: bool, name: str):
        if self.dropout <= 0:
            return x
        return nn.Dropout(rate=self.dropout, deterministic=not train,
                          name=name)(x)

    @property
    def enc_shape(self):
        return encoder_shapes(self.input_length, self.conv_blocks,
                              self.n_filters, self.kernel_size, self.stride)

    @nn.compact
    def __call__(self, x, train: bool = False):
        mu, logvar = self.encode(x, train=train)
        z = self.reparameterize(mu, logvar)
        x_rec = self.decode(z, train=train)
        return x_rec, mu, logvar

    def reparameterize(self, mu, logvar):
        """z = mu + eps * exp(0.5*logvar) (vae_model.py:108-109)."""
        eps = jax.random.normal(self.make_rng("reparam"), mu.shape, mu.dtype)
        return mu + eps * jnp.exp(0.5 * logvar)

    @nn.compact
    def encode(self, x, train: bool = False):
        """Standardized spectra (B, L) -> (mu, logvar), (vae_model.py:99-106)."""
        k = self.kernel_size
        pad = k // 2
        h = x[..., None].astype(self.dtype)          # (B, L, 1) channels-last
        filters = self.n_filters
        for b in range(self.conv_blocks):
            stride_b = 1 if b == 0 else self.stride
            h = nn.Conv(
                features=filters, kernel_size=(k,), strides=(stride_b,),
                padding=[(pad, pad)], dtype=self.dtype,
                kernel_init=_kaiming_normal(h.shape[-1] * k,
                                            self.init_nonlinearity),
                bias_init=nn.initializers.zeros, name=f"enc_conv{b}")(h)
            h = self._bn_act(h, train, name=f"enc_bn{b}")
            h = self._dropout(h, train, name=f"enc_drop{b}")
            filters = min(filters * 2, 1024)
        h = h.reshape(h.shape[0], -1)
        fc_in = h.shape[-1]
        h = nn.Dense(self.hidden_fc, dtype=self.dtype,
                     kernel_init=_kaiming_normal(fc_in, self.init_nonlinearity),
                     bias_init=nn.initializers.zeros, name="fc")(h)
        h = self._act(h)
        h = self._dropout(h, train, name="fc_drop")
        mu = nn.Dense(self.latent_dim, dtype=self.dtype,
                      kernel_init=_kaiming_normal(self.hidden_fc,
                                                  self.init_nonlinearity),
                      bias_init=nn.initializers.zeros, name="fc_mu")(h)
        logvar = nn.Dense(self.latent_dim, dtype=self.dtype,
                          kernel_init=_kaiming_normal(self.hidden_fc,
                                                      self.init_nonlinearity),
                          bias_init=nn.initializers.zeros, name="fc_logvar")(h)
        return mu, logvar

    @nn.compact
    def decode(self, z, train: bool = False):
        """Latent (B, k) -> standardized spectra (B, L), (vae_model.py:111-121)."""
        enc_ch, enc_len = self.enc_shape
        fc_in = enc_ch * enc_len
        k = self.kernel_size
        pad = k // 2

        h = nn.Dense(self.hidden_fc, dtype=self.dtype,
                     kernel_init=_kaiming_normal(self.latent_dim,
                                                 self.init_nonlinearity),
                     bias_init=nn.initializers.zeros, name="fc_dec0")(z)
        h = self._act(h)
        h = self._dropout(h, train, name="fc_dec_drop")
        h = nn.Dense(fc_in, dtype=self.dtype,
                     kernel_init=_kaiming_normal(self.hidden_fc,
                                                 self.init_nonlinearity),
                     bias_init=nn.initializers.zeros, name="fc_dec1")(h)
        h = self._act(h)
        h = h.reshape(h.shape[0], enc_len, enc_ch)   # channels-last

        filters = enc_ch
        for b in range(self.conv_blocks):
            next_filters = max(filters // 2, self.n_filters)
            stride_b = self.stride if b < self.conv_blocks - 1 else 1
            out_pad = stride_b - 1
            # torch ConvTranspose1d(stride=s, padding=p, output_padding=s-1)
            # == lax.conv_transpose with explicit padding
            #    (k-1-p, k-1-p+output_padding)  -> out_len = in_len * s
            h = nn.ConvTranspose(
                features=next_filters, kernel_size=(k,), strides=(stride_b,),
                padding=[(k - 1 - pad, k - 1 - pad + out_pad)],
                dtype=self.dtype,
                kernel_init=_kaiming_normal(next_filters * k,
                                            self.init_nonlinearity),
                bias_init=nn.initializers.zeros, name=f"dec_conv{b}")(h)
            h = self._bn_act(h, train, name=f"dec_bn{b}")
            h = self._dropout(h, train, name=f"dec_drop{b}")
            filters = next_filters
        h = nn.Conv(features=1, kernel_size=(1,), dtype=self.dtype,
                    kernel_init=_kaiming_normal(filters,
                                                self.init_nonlinearity),
                    bias_init=nn.initializers.zeros, name="dec_out")(h)
        x_rec = h[..., 0]
        # crop / zero-pad to input_length (vae_model.py:117-121)
        out_len = x_rec.shape[-1]
        if out_len > self.input_length:
            x_rec = x_rec[..., :self.input_length]
        elif out_len < self.input_length:
            x_rec = jnp.pad(x_rec, ((0, 0), (0, self.input_length - out_len)))
        return x_rec


@functools.partial(jax.jit, static_argnames="model")
def _init_vae_jit(model: ConvVAE1D, rng: jax.Array):
    x = jnp.zeros((1, model.input_length), model.dtype)
    variables = model.init({"params": rng, "reparam": rng}, x, train=False)
    return variables["params"], variables.get("batch_stats", {})


def init_vae(model: ConvVAE1D, rng: jax.Array):
    """Initialize parameters + batch stats for one model.

    jitted with the module as a static key: repeated inits of the same
    architecture (sweeps, benchmarks, HPO trials) skip flax's host-side
    retrace — measured ~120 ms of pure Python per call otherwise."""
    return _init_vae_jit(model, rng)


# ---------------------------------------------------------------------------
# beta-VAE losses (vae_model.py:136-158, utils/final_vaesimca.py:198-224)
# ---------------------------------------------------------------------------

LOSS_NAMES = ("cosine", "bce", "euclidean", "bce_prob")


def kl_divergence(mu, logvar):
    """KL(q||N(0,I)) = -0.5 * mean(sum(1 + logvar - mu^2 - e^logvar))."""
    return -0.5 * jnp.mean(
        jnp.sum(1.0 + logvar - mu * mu - jnp.exp(logvar), axis=1))


def cosine_recon_loss(x, x_rec, eps: float = 1e-8):
    """Chord distance mean(sqrt(2(1-cos))) (vae_model.py:136-145).

    Row normalization matches torch F.normalize (denominator clamped at
    1e-12); cos is clamped to [-1+eps, 1-eps].
    """
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rn = x_rec / jnp.maximum(jnp.linalg.norm(x_rec, axis=1, keepdims=True),
                             1e-12)
    cos = jnp.clip(jnp.sum(xn * rn, axis=1), -1.0 + eps, 1.0 - eps)
    return jnp.mean(jnp.sqrt(2.0 * (1.0 - cos)))


def bce_logits_recon_loss(x, x_rec, eps: float = 1e-8):
    """BCE-with-logits against the per-sample min-max-scaled target
    (vae_model.py:148-158): x_rec are logits, targets in [0, 1]."""
    x_min = jnp.min(x, axis=1, keepdims=True)
    x_max = jnp.max(x, axis=1, keepdims=True)
    t = jnp.clip((x - x_min) / (x_max - x_min + eps), 0.0, 1.0)
    # numerically-stable BCE-with-logits: max(l,0) - l*t + log(1+exp(-|l|))
    l = x_rec
    per_elem = jnp.maximum(l, 0.0) - l * t + jnp.log1p(jnp.exp(-jnp.abs(l)))
    return jnp.mean(per_elem)


def euclidean_recon_loss(x, x_rec):
    """MSE (utils/final_vaesimca.py:208-211)."""
    return jnp.mean((x - x_rec) ** 2)


def bce_prob_recon_loss(x, x_rec, eps: float = 1e-8):
    """Probability-space BCE scaling BOTH x and x_rec by x's min/max
    (utils/final_vaesimca.py:213-224).  Probabilities are clipped away from
    {0,1} (torch clamps the logs at -100; the 1e-7 clip is equivalent for
    finite losses)."""
    x_min = jnp.min(x, axis=1, keepdims=True)
    x_max = jnp.max(x, axis=1, keepdims=True)
    t = jnp.clip((x - x_min) / (x_max - x_min + eps), 0.0, 1.0)
    p = jnp.clip((x_rec - x_min) / (x_max - x_min + eps), 1e-7, 1.0 - 1e-7)
    per_elem = -(t * jnp.log(p) + (1.0 - t) * jnp.log1p(-p))
    return jnp.mean(per_elem)


_RECON_LOSSES = {
    "cosine": cosine_recon_loss,
    "bce": bce_logits_recon_loss,
    "euclidean": euclidean_recon_loss,
    "bce_prob": bce_prob_recon_loss,
}


def beta_vae_loss(x, x_rec, mu, logvar, beta: float = 1.0,
                  loss_type: str = "cosine"):
    """total = recon + beta*KL; returns (total, recon, kl) like the
    reference loss functions (vae_model.py:136-158)."""
    if loss_type not in _RECON_LOSSES:
        raise ValueError(
            f"unknown loss_type {loss_type!r}; expected one of {LOSS_NAMES}")
    recon = _RECON_LOSSES[loss_type](x, x_rec)
    kl = kl_divergence(mu, logvar)
    return recon + beta * kl, recon, kl
