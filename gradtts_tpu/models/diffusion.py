"""Score-estimator U-Net and VP-SDE diffusion math.

Behavioral parity targets: /root/reference/model/diffusion.py —
GradLogPEstimator2d (:128-216), ResnetBlock (:61-79), LinearAttention
(:82-100), SinusoidalPosEmb (:113-125), Up/Downsample (:21-36), Rezero
(:39-46), get_noise (:219-224), Diffusion forward/reverse/loss (:227-287).

TPU-first design decisions:
- NHWC layout [B, F(=80), T, C]: channels lane-minor so 3x3 convs tile onto
  the MXU; the mask is [B, 1, T, 1] and broadcasts.
- The parameterized estimator is a flax module; the diffusion *algorithms*
  (forward noising, Euler reverse sampler, loss) are pure functions over an
  ``estimator_fn`` closure so the sampler compiles to a single ``lax.scan``
  with no Python-loop unrolling or host sync.
- Transposed conv implemented explicitly via ``conv_general_dilated`` with
  lhs dilation, bit-matching torch ConvTranspose2d(k=4, s=2, p=1).

Fork quirk reproduced deliberately: for external speaker embeddings
(n_spks == -1) the reference builds ``spk_mlp`` but never feeds its output
to the U-Net (diffusion.py:139-141 vs :180-184 — `n_spks < 2` takes the
2-channel branch), so the zero-speaker U-Net is speaker-unconditioned. We
replicate this (including the unused params) for checkpoint parity.
"""

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gradtts_tpu.models.layers import mish


def get_noise(t, beta_init, beta_term, cumulative=False):
    """Linear beta schedule; cumulative gives the integral of beta
    (parity: diffusion.py:219-224)."""
    if cumulative:
        return beta_init * t + 0.5 * (beta_term - beta_init) * (t ** 2)
    return beta_init + (beta_term - beta_init) * t


class SinusoidalPosEmb(nn.Module):
    dim: int

    def __call__(self, x, scale=1000.0):
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = scale * x[:, None].astype(jnp.float32) * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class Upsample(nn.Module):
    """2x up in both (F, T) via transposed conv, torch
    ConvTranspose2d(dim, dim, 4, 2, 1) semantics (diffusion.py:21-27)."""
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Equivalent direct convolution: dilate input by 2, correlate with
        # the spatially-flipped kernel, pad by k-1-p = 2.
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (4, 4, self.dim, self.dim))
        bias = self.param('bias', nn.initializers.zeros, (self.dim,))
        # No preferred_element_type here: its transpose rule would pair the
        # f32 cotangent with the bf16 kernel and conv_general_dilated
        # rejects mixed dtypes — XLA accumulates bf16 convs in f32 on the
        # MXU regardless; the bias add happens in f32.
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return (y.astype(jnp.float32) + bias).astype(self.dtype)


class Downsample(nn.Module):
    """2x down in both (F, T): Conv2d(dim, dim, 3, 2, 1)
    (diffusion.py:30-36)."""
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name='conv')(x)


class FusedGroupNormMish(nn.Module):
    """GroupNorm(groups, eps=1e-5) + Mish + time mask in one pass.

    Params ('scale', 'bias') and semantics match
    ``nn.GroupNorm(dtype=f32)`` followed by ``mish(.) * mask`` — statistics
    include masked positions, exactly like the reference (diffusion.py:52).
    Lowered via the XLA-fused jnp path (single-pass statistics); the
    Pallas kernel measured slower at these shapes and stays opt-in — see
    ops/pallas/groupnorm_mish.py for the measurements.
    """
    features: int
    groups: int = 8

    @nn.compact
    def __call__(self, h, mask):
        from gradtts_tpu.ops.pallas.groupnorm_mish import groupnorm_mish
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return groupnorm_mish(h, mask, scale, bias, self.groups, 1e-5, None)


class Block(nn.Module):
    """conv3x3 -> GroupNorm(8) -> Mish with masking (diffusion.py:49-58).
    The GroupNorm statistics include masked (zero) positions — exactly as
    the reference computes them. Conv runs in ``dtype`` (bf16 on the MXU
    when enabled); the normalization statistics stay float32 inside the
    fused norm+Mish+mask op."""
    dim_out: int
    groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = nn.Conv(self.dim_out, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name='conv')(x * mask)
        h = FusedGroupNormMish(self.dim_out, self.groups, name='norm')(
            h, mask.astype(jnp.float32))
        return h.astype(self.dtype)


class ResnetBlock(nn.Module):
    """Two Blocks with a time-embedding injection and residual conv
    (diffusion.py:61-79)."""
    dim: int
    dim_out: int
    groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, time_emb):
        h = Block(self.dim_out, self.groups, self.dtype,
                  name='block1')(x, mask)
        temb = nn.Dense(self.dim_out, name='mlp_dense')(mish(time_emb))
        h = h + temb[:, None, None, :].astype(self.dtype)
        h = Block(self.dim_out, self.groups, self.dtype,
                  name='block2')(h, mask)
        if self.dim != self.dim_out:
            res = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype,
                          name='res_conv')(x * mask)
        else:
            res = x * mask
        return h + res


class _ParamHolder(nn.Module):
    """Declares a conv-shaped kernel param under this module's scope
    (keeps the checkpoint tree identical to an nn.Conv while the matmul
    itself is expressed directly)."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param('kernel', nn.initializers.lecun_normal(),
                          self.shape)


class _ConvParamHolder(nn.Module):
    """kernel + bias params with nn.Conv's tree/initializers, computed by
    the caller (shared between the jnp and Pallas attention paths)."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return (self.param('kernel', nn.initializers.lecun_normal(),
                           self.shape),
                self.param('bias', nn.initializers.zeros, (self.shape[-1],)))


class LinearAttention(nn.Module):
    """Softmax-kernel linear attention over all (F, T) positions
    (diffusion.py:82-100). QKV/output projections run in ``dtype``; the
    position softmax and both contractions accumulate in float32.

    ``rezero_g`` (the caller's ReZero gain) folds the ``* g + x`` residual
    into this op. ``fused=True`` additionally dispatches to the Pallas
    flash-style kernel (ops/pallas/linear_attention.py): one streaming
    stats pass + one apply pass instead of materializing q/k/exp(k) in HBM.
    The fused path is reverse-mode-only (custom_vjp) — callers that need
    ``jax.jvp`` (the likelihood engine) must keep ``fused=False``."""
    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rezero_g=None, fused: bool = False):
        b, f, t, _ = x.shape
        hidden = self.heads * self.dim_head
        # Channel order is (qkv, heads, dim_head) — matches the reference's
        # rearrange 'b (qkv heads c) h w -> qkv b heads c (h w)'. One
        # parameter tensor (converter-compatible with the reference's
        # single to_qkv conv), but applied as three separate 1x1
        # convs/matmuls: the k-softmax reductions below then read only the
        # 1/3-size k tensor instead of slicing the fused qkv output
        # (measured ~1 ms/fwd saved at the top U-Net level on v5e).
        w_qkv = _ParamHolder((1, 1, x.shape[-1], hidden * 3),
                             name='to_qkv')()
        # to_out params declared directly (same tree as an nn.Conv) so both
        # the jnp and the fused kernel path share them
        w_out, b_out = _ConvParamHolder((1, 1, hidden, self.dim),
                                        name='to_out')()
        if fused and rezero_g is not None:
            from gradtts_tpu.ops.pallas.linear_attention import (
                fused_linear_attention_rezero)
            wf = w_qkv[0, 0]
            return fused_linear_attention_rezero(
                x, wf[:, :hidden], wf[:, hidden:2 * hidden],
                wf[:, 2 * hidden:], w_out[0, 0], b_out, rezero_g,
                self.dim_head)
        w = w_qkv[0, 0].astype(self.dtype)
        q = jnp.einsum('bftc,cd->bftd', x, w[:, :hidden])
        k = jnp.einsum('bftc,cd->bftd', x, w[:, hidden:2 * hidden])
        v = jnp.einsum('bftc,cd->bftd', x, w[:, 2 * hidden:])
        # softmax over all (f, t) positions, normalized AFTER the
        # contraction: context = (Σ e^(k-m) v) / (Σ e^(k-m)). The division
        # lands on the tiny [B, HD, HD] context instead of the full
        # [B, F, T, HD] tensor, so only one exp tensor is ever materialized
        # (in compute dtype). The heads are never split out: the context is
        # computed over all HD channels at once and masked to its per-head
        # block diagonal — mathematically identical to per-head attention,
        # ~4x the (negligible) context FLOPs, and every tensor stays in the
        # [B, F, T, C] channel-minor layout. Head-splitting reshapes here
        # cost ~5 ms/fwd in relayout copies at the top U-Net level on v5e.
        k = k.astype(jnp.float32)
        m = jax.lax.stop_gradient(jnp.max(k, axis=(1, 2), keepdims=True))
        ek = jnp.exp(k - m).astype(self.dtype)           # [B, F, T, HD]
        denom = jnp.sum(ek.astype(jnp.float32), axis=(1, 2))  # [B, HD]
        context = jnp.einsum('bftd,bfte->bde', ek, v,
                             preferred_element_type=jnp.float32)
        head = jnp.arange(hidden) // self.dim_head
        block_diag = (head[:, None] == head[None, :]).astype(jnp.float32)
        context = context * block_diag / denom[:, :, None]
        out = jnp.einsum('bde,bftd->bfte', context.astype(self.dtype), q,
                         preferred_element_type=jnp.float32)
        out = out.astype(self.dtype)
        y = jnp.einsum('bfte,ec->bftc', out, w_out[0, 0].astype(self.dtype))
        y = y + b_out.astype(self.dtype)
        if rezero_g is not None:
            return y * rezero_g.astype(x.dtype) + x
        return y


class Rezero(nn.Module):
    """Residual linear-attention block scaled by a zero-init'd scalar
    (Residual(Rezero(LinearAttention)) in the reference). The gain and the
    residual are folded into the attention op (jnp or fused kernel)."""
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fused: bool = False):
        g = self.param('g', nn.initializers.zeros, (1,))
        return LinearAttention(self.dim, dtype=self.dtype,
                               name='fn')(x, rezero_g=g, fused=fused)


class GradLogPEstimator2d(nn.Module):
    """U-Net over (F=80, T) with [mu, x_t(, spk)] as input channels
    (parity: diffusion.py:128-216).

    Interface is time-major: x, mu are [B, T, F]; mask is [B, T]; t is [B];
    spk is [B, spk_emb_dim] (already embedded) or None.
    """
    dim: int
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    groups: int = 8
    n_spks: int = 1
    spk_emb_dim: int = 64
    n_feats: int = 80
    pe_scale: float = 1000.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, mu, t, spk=None,
                 fused_attention: bool = False):
        use_spk_channel = self.n_spks > 1
        has_spk_mlp = self.n_spks > 1 or self.n_spks == -1

        if has_spk_mlp and spk is not None:
            s = nn.Dense(self.spk_emb_dim * 4, name='spk_mlp_0')(spk)
            s = nn.Dense(self.n_feats, name='spk_mlp_2')(mish(s))
        t_emb = SinusoidalPosEmb(self.dim, name='time_pos_emb')(
            t, scale=self.pe_scale)
        t_emb = nn.Dense(self.dim * 4, name='mlp_0')(t_emb)
        t_emb = nn.Dense(self.dim, name='mlp_2')(mish(t_emb))

        # [B, T, F] -> NHWC [B, F, T, C]
        chans = [mu.transpose(0, 2, 1), x.transpose(0, 2, 1)]
        if use_spk_channel:
            chans.append(jnp.broadcast_to(s[:, :, None],
                                          (x.shape[0], self.n_feats, x.shape[1])))
        h = jnp.stack(chans, axis=-1).astype(self.dtype)
        m = mask[:, None, :, None].astype(h.dtype)  # [B, 1, T, 1]

        dims = [2 + (1 if use_spk_channel else 0)] + \
               [self.dim * m_ for m_ in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        hiddens = []
        masks = [m]
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            mask_down = masks[-1]
            h = ResnetBlock(dim_in, dim_out, self.groups, self.dtype,
                            name=f'downs_{ind}_res1')(h, mask_down, t_emb)
            h = ResnetBlock(dim_out, dim_out, self.groups, self.dtype,
                            name=f'downs_{ind}_res2')(h, mask_down, t_emb)
            h = Rezero(dim_out, self.dtype,
                       name=f'downs_{ind}_attn')(h, fused=fused_attention)
            hiddens.append(h)
            if not is_last:
                h = Downsample(dim_out, self.dtype,
                               name=f'downs_{ind}_down')(h * mask_down)
            else:
                h = h * mask_down
            masks.append(mask_down[:, :, ::2, :])

        masks = masks[:-1]
        mask_mid = masks[-1]
        mid_dim = dims[-1]
        h = ResnetBlock(mid_dim, mid_dim, self.groups, self.dtype,
                        name='mid_block1')(h, mask_mid, t_emb)
        h = Rezero(mid_dim, self.dtype,
                   name='mid_attn')(h, fused=fused_attention)
        h = ResnetBlock(mid_dim, mid_dim, self.groups, self.dtype,
                        name='mid_block2')(h, mask_mid, t_emb)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            mask_up = masks.pop()
            h = jnp.concatenate([h, hiddens.pop()], axis=-1)
            h = ResnetBlock(dim_out * 2, dim_in, self.groups, self.dtype,
                            name=f'ups_{ind}_res1')(h, mask_up, t_emb)
            h = ResnetBlock(dim_in, dim_in, self.groups, self.dtype,
                            name=f'ups_{ind}_res2')(h, mask_up, t_emb)
            h = Rezero(dim_in, self.dtype,
                       name=f'ups_{ind}_attn')(h, fused=fused_attention)
            h = Upsample(dim_in, self.dtype, name=f'ups_{ind}_up')(h * mask_up)

        h = Block(self.dim, self.groups, self.dtype,
                  name='final_block')(h, m)
        out = nn.Conv(1, (1, 1), dtype=self.dtype, name='final_conv')(h * m)
        out = (out * m).astype(jnp.float32)
        return out[..., 0].transpose(0, 2, 1)  # NHWC -> [B, T, F]


# --------------------------------------------------------------------------
# Pure-function diffusion algorithms (VP-SDE with text-conditional mean mu).
# estimator_fn(x_t, mask, mu, t, spk) -> score estimate, all [B, T, F].
# --------------------------------------------------------------------------


def forward_diffusion(key, x0, mask, mu, t, beta_min, beta_max):
    """Closed-form q(x_t | x_0) sample (parity: diffusion.py:244-252).
    mask: [B, T, 1] broadcastable over F."""
    time = t[:, None, None]
    cum_noise = get_noise(time, beta_min, beta_max, cumulative=True)
    decay = jnp.exp(-0.5 * cum_noise)
    mean = x0 * decay + mu * (1.0 - decay)
    variance = 1.0 - jnp.exp(-cum_noise)
    z = jax.random.normal(key, x0.shape, dtype=x0.dtype)
    xt = mean + z * jnp.sqrt(variance)
    return xt * mask, z * mask


def reverse_diffusion(estimator_fn, z, mask, mu, n_timesteps,
                      beta_min, beta_max, stoc=False, spk=None, key=None):
    """Euler sampler for the reverse ODE as a single ``lax.scan``
    (parity: diffusion.py:254-268 — the fork's sampler is always the
    probability-flow ODE; the ``stoc`` flag is accepted but ignored there,
    here ``stoc=True`` enables the Euler-Maruyama SDE branch explicitly).

    mask: [B, T, 1]; z, mu: [B, T, F].
    """
    h = 1.0 / n_timesteps
    xt = z * mask

    def step(carry, i):
        xt, key = carry
        t = (1.0 - (i + 0.5) * h) * jnp.ones((z.shape[0],), dtype=z.dtype)
        noise_t = get_noise(t[:, None, None], beta_min, beta_max,
                            cumulative=False)
        score = estimator_fn(xt, mask[..., 0], mu, t, spk)
        if stoc:
            key, sub = jax.random.split(key)
            dxt_det = (0.5 * (mu - xt) - score) * noise_t * h
            dxt_stoc = jax.random.normal(sub, z.shape, dtype=z.dtype) \
                * jnp.sqrt(noise_t * h)
            dxt = dxt_det + dxt_stoc
        else:
            dxt = 0.5 * (mu - xt - score) * noise_t * h
        xt = (xt - dxt) * mask
        return (xt, key), None

    if key is None:
        key = jax.random.PRNGKey(0)
    (xt, _), _ = jax.lax.scan(step, (xt, key),
                              jnp.arange(n_timesteps, dtype=z.dtype))
    return xt


def reverse_diffusion_dpm(estimator_fn, z, mask, mu, n_timesteps,
                          beta_min, beta_max, spk=None):
    """Multistep exponential-integrator sampler (DPM-Solver-2M style) for
    the Grad-TTS probability-flow ODE — a fast-sampling capability beyond
    the reference's Euler-only sampler (diffusion.py:254-268).

    The reverse ODE dx/dt = 0.5 beta(t) (mu - x) - 0.5 beta(t) s(x, t) is
    semi-linear: with y = x - mu and the half-cumulative noise
    zeta(t) = 0.5 * int_0^t beta, variation of constants gives the EXACT
    relation over a step t -> r (r < t, integrating toward 0):

        y(r) = e^h y(t) + (e^h - 1) s(x(t), t)
               + ((s_t - s_prev) / h_prev) (e^h - 1 - h)   [2nd order]

    where h = zeta(t) - zeta(r) and the last term linearly extrapolates
    the score in zeta-time from the previous evaluation (dropped on the
    first step). Only the score term is approximated — the stiff linear
    drift integrates exactly, which is what lets ~4 steps match ~10+ Euler
    steps (see tests/test_dpm_sampler.py for the measured solver error).

    Cost per step is identical to Euler (one estimator call); the sampler
    compiles to a single ``lax.scan``.
    """
    ts = 1.0 - jnp.arange(n_timesteps + 1, dtype=z.dtype) / n_timesteps
    zetas = 0.5 * get_noise(ts, beta_min, beta_max, cumulative=True)
    xt = z * mask

    def step(carry, i):
        xt, s_prev, h_prev = carry
        t = ts[i] * jnp.ones((z.shape[0],), dtype=z.dtype)
        s_t = estimator_fn(xt, mask[..., 0], mu, t, spk)
        h = zetas[i] - zetas[i + 1]           # > 0 (zeta decreases to 0)
        eh = jnp.exp(h)
        first = (i == 0)
        # 2nd-order correction, zeroed on the first step (no history)
        safe_hp = jnp.where(first, 1.0, h_prev)
        corr = jnp.where(first, 0.0, (eh - 1.0 - h) / safe_hp) \
            * (s_t - s_prev)
        xt_new = mu + eh * (xt - mu) + (eh - 1.0) * s_t + corr
        return ((xt_new * mask).astype(xt.dtype), s_t, h), None

    s0 = jnp.zeros_like(xt)
    (xt, _, _), _ = jax.lax.scan(
        step, (xt, s0, jnp.asarray(1.0, z.dtype)),
        jnp.arange(n_timesteps))
    return xt


def diffusion_loss(estimator_fn, key, x0, mask, mu, beta_min, beta_max,
                   spk=None, offset=1e-5):
    """Score-matching loss at uniformly sampled t
    (parity: diffusion.py:274-287). mask: [B, T, 1]."""
    key_t, key_z = jax.random.split(key)
    t = jax.random.uniform(key_t, (x0.shape[0],), dtype=x0.dtype)
    t = jnp.clip(t, offset, 1.0 - offset)
    xt, z = forward_diffusion(key_z, x0, mask, mu, t, beta_min, beta_max)
    cum_noise = get_noise(t[:, None, None], beta_min, beta_max,
                          cumulative=True)
    est = estimator_fn(xt, mask[..., 0], mu, t, spk)
    est = est * jnp.sqrt(1.0 - jnp.exp(-cum_noise))
    n_feats = x0.shape[-1]
    loss = jnp.sum((est + z) ** 2) / (jnp.sum(mask) * n_feats)
    return loss, xt, t
