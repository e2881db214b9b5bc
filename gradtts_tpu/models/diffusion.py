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
import numpy as np
from flax import linen as nn

from gradtts_tpu.models.layers import mish


# --------------------------------------------------------------------------
# Frequency folding (F-only space-to-depth).
#
# The model's dec_dim=64 half-fills the v5e MXU's 128 lanes, capping the
# top U-Net level (80 x T x 64, ~97% of 10-step synthesis) at ~20% MXU.
# Folding pairs of adjacent F rows into channels — [B, 80, T, 64] ->
# [B, 40, T, 128] with channel order (f_phase, c) — makes a 3x3 conv an
# EXACT [2, 3] conv with a phase-rearranged kernel: only 4/3 the MACs
# (one folded dim, vs 16/9 for 2D space-to-depth) at full 128-lane fill.
# Measured on v5e (B8 T768 bf16): 1.10 -> 0.25 ms per 64->64 conv (~97% of
# MXU peak). The time mask [B, 1, T, 1] broadcasts over the folded layout
# unchanged, linear attention is position-permutation-invariant (a free
# reshape re-labels the folded phase as extra T positions), and GroupNorm
# statistics pool the phase dim (ops/pallas/groupnorm_mish.py, phases=2) —
# so every op is allclose-identical to the unfolded path and checkpoints
# are untouched (kernels are rearranged at trace time from the stored
# [3, 3, Ci, Co] parameters).
# --------------------------------------------------------------------------


def freq_fold(x):
    """[B, F, T, C] -> [B, F/2, T, 2C], channels ordered (f_phase, c)."""
    b, f, t, c = x.shape
    return x.reshape(b, f // 2, 2, t, c).transpose(0, 1, 3, 2, 4).reshape(
        b, f // 2, t, 2 * c)


def freq_unfold(x, c):
    """Inverse of ``freq_fold``."""
    b, f2, t, _ = x.shape
    return x.reshape(b, f2, t, 2, c).transpose(0, 1, 3, 2, 4).reshape(
        b, f2 * 2, t, c)


_FFOLD_IDX = np.full((2, 2, 2), 3, np.int32)  # [di, ba, pi] -> df (3=zero)
for _d in range(2):
    for _a in range(2):
        for _p in range(2):
            _v = _d + 2 * _a + _p - 1
            if 0 <= _v <= 2:
                _FFOLD_IDX[_d, _a, _p] = _v


def ffold_kernel(w):
    """Rearrange a stored [3, kt, Ci, Co] conv kernel into the exact
    [2, kt, 2Ci, 2Co] kernel over F-folded blocks. Output channel order is
    (f_phase, co); entry [ba, kt, (pi, ci), (di, co)] equals
    w[di + 2*ba + pi - 1, kt, ci, co] where the F-tap index is in range,
    else 0 (9/12 of the folded taps are live)."""
    kt, ci, co = w.shape[1], w.shape[2], w.shape[3]
    wpad = jnp.pad(w, ((0, 1), (0, 0), (0, 0), (0, 0)))  # row 3 == zeros
    wk = wpad[jnp.asarray(_FFOLD_IDX)]    # [di, ba, pi, kt, ci, co]
    wk = wk.transpose(1, 3, 2, 4, 0, 5)   # [ba, kt, pi, ci, di, co]
    return wk.reshape(2, kt, 2 * ci, 2 * co)


def half_major_perm(ci: int) -> np.ndarray:
    """Input-channel row permutation mapping the HALF-MAJOR folded order
    (half, phase, c) onto the standard folded order (phase, ci) with
    ci = half * ci/2 + c. Used at the folded ups level: the skip concat
    arrives as [fold(h) | fold(skip)] (half-major) and the kernel rows
    are permuted at trace time instead of interleaving 63 MB of data —
    the freq_fold-of-concat transposes cost ~0.7 ms/fwd on v5e
    (round-4 profile)."""
    half_sz = ci // 2
    idx = np.zeros(2 * ci, np.int32)
    for half in range(2):
        for p in range(2):
            for c in range(half_sz):
                idx[half * ci + p * half_sz + c] = \
                    p * ci + half * half_sz + c
    return idx


def ffold_conv(xs, wk, stride_t: int = 1, pad_t: int = 1):
    """'SAME' 3x3 conv in F-folded space: pad one block in F, slide the
    2-block kernel, and take each output phase's shifted window. xs is
    [B, F2, T, 2Ci]; wk is the ``ffold_kernel`` output; returns
    [B, F2, T/stride_t, 2Co] in (f_phase, co) channel order."""
    f2 = xs.shape[1]
    xp = jnp.pad(xs, ((0, 0), (1, 1), (pad_t, pad_t), (0, 0)))
    z = jax.lax.conv_general_dilated(
        xp, wk, (1, stride_t), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))   # [B, F2+1, T', 2Co]
    co = z.shape[-1] // 2
    return jnp.concatenate(
        [z[:, 0:f2, :, :co], z[:, 1:f2 + 1, :, co:]], axis=-1)


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
    ConvTranspose2d(dim, dim, 4, 2, 1) semantics (diffusion.py:21-27).

    ``fold_out=True`` emits the result directly in the frequency-folded
    layout [B, F, 2T, 2*dim] and — more importantly — replaces the
    lhs-dilated convolution with a dense 2x2-block conv whose kernel packs
    the four output phases into channels (every tap live): measured 4.2x
    faster on v5e (0.60 -> 0.14 ms at (40, 384, 64) -> (80, 768, 64))
    because no zero-inserted rows ever hit the MXU."""
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fold_out: bool = False):
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (4, 4, self.dim, self.dim))
        bias = self.param('bias', nn.initializers.zeros, (self.dim,))
        if fold_out:
            b, f, t, c = x.shape
            o = self.dim
            # stored-kernel relation: y[2i+di, 2j+dj] sums taps
            # K[2a+di, 2b+dj] over input blocks (i-1+a, j-1+b); reorder the
            # stored [kr, ks, c, o] kernel into [a, b, c, (dj, di, o)] —
            # dj-major so the T phase merges into positions by reshape.
            wk = kernel.reshape(2, 2, 2, 2, c, o)     # [a, di, b, dj, c, o]
            wk = wk.transpose(0, 2, 4, 3, 1, 5).reshape(2, 2, c, 4 * o)
            xp = jnp.pad(x.astype(self.dtype),
                         ((0, 0), (1, 1), (1, 1), (0, 0)))
            z = jax.lax.conv_general_dilated(
                xp, wk.astype(self.dtype), (1, 1), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            # bias folds into the conv epilogue; the phase assembly below is
            # then pure bf16 data movement (an f32 bias add after the
            # stack+reshape measured +0.6 ms/fwd in relayout copies on v5e)
            z = z + jnp.tile(bias, 4).astype(z.dtype)
            parts = []
            for dj in range(2):
                cols = [z[:, di:di + f, dj:dj + t,
                          (dj * 2 + di) * o:(dj * 2 + di + 1) * o]
                        for di in range(2)]
                parts.append(jnp.concatenate(cols, axis=-1))
            return jnp.stack(parts, axis=3).reshape(b, f, 2 * t, 2 * o)
        # Equivalent direct convolution: dilate input by 2, correlate with
        # the spatially-flipped kernel, pad by k-1-p = 2.
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
    (diffusion.py:30-36).

    ``fold_in=True`` takes frequency-folded input [B, F/2, T, 2*dim]: the
    F-stride-2 conv keeps only even output rows, i.e. the di=0 half of the
    folded kernel, and the result is already at block resolution — the
    output [B, F/2, T/2, dim] leaves folded space naturally."""
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fold_in: bool = False):
        if fold_in:
            ci = x.shape[-1] // 2
            w, b = _ConvParamHolder((3, 3, ci, self.dim), name='conv')()
            wk = ffold_kernel(w)[:, :, :, :self.dim]     # di=0 phase only
            xp = jnp.pad(x.astype(self.dtype),
                         ((0, 0), (1, 0), (1, 1), (0, 0)))
            y = jax.lax.conv_general_dilated(
                xp, wk.astype(self.dtype), (1, 2), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            return y + b.astype(self.dtype)
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
    def __call__(self, h, mask, phases: int = 1):
        from gradtts_tpu.ops.pallas.groupnorm_mish import groupnorm_mish
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return groupnorm_mish(h, mask, scale, bias, self.groups, 1e-5, None,
                              phases=phases)


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
    def __call__(self, x, mask, fold: bool = False,
                 half_major: bool = False):
        if fold:
            ci = x.shape[-1] // 2
            w, b = _ConvParamHolder((3, 3, ci, self.dim_out), name='conv')()
            wk = ffold_kernel(w)
            if half_major:
                wk = wk[:, :, jnp.asarray(half_major_perm(ci)), :]
            h = ffold_conv((x * mask).astype(self.dtype),
                           wk.astype(self.dtype))
            h = h + jnp.tile(b, 2).astype(self.dtype)
            h = FusedGroupNormMish(self.dim_out, self.groups, name='norm')(
                h, mask.astype(jnp.float32), phases=2)
            return h.astype(self.dtype)
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
    def __call__(self, x, mask, time_emb, fold: bool = False,
                 half_major: bool = False):
        h = Block(self.dim_out, self.groups, self.dtype,
                  name='block1')(x, mask, fold=fold, half_major=half_major)
        temb = nn.Dense(self.dim_out, name='mlp_dense')(mish(time_emb))
        if fold:
            temb = jnp.tile(temb, 2)  # (f_phase, c) channel order
        h = h + temb[:, None, None, :].astype(self.dtype)
        h = Block(self.dim_out, self.groups, self.dtype,
                  name='block2')(h, mask, fold=fold)
        if self.dim != self.dim_out:
            if fold:
                w, b = _ConvParamHolder((1, 1, self.dim, self.dim_out),
                                        name='res_conv')()
                xm = (x * mask).astype(self.dtype)
                # block-diagonal [2Ci, 2Co] matmul instead of a 5-D
                # phase-reshape einsum: the reshape halves the minor dim
                # below the 128 lanes and cost a relayout copy per call
                # (round-4 profile); 2x the (cheap 1x1) MACs, zero copies
                w2 = jnp.kron(jnp.eye(2, dtype=w.dtype), w[0, 0])
                if half_major:
                    w2 = w2[jnp.asarray(half_major_perm(self.dim))]
                res = jnp.einsum('bftc,co->bfto', xm,
                                 w2.astype(self.dtype),
                                 preferred_element_type=jnp.float32)
                res = res.astype(self.dtype) \
                    + jnp.tile(b, 2).astype(self.dtype)
            else:
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
    stats pass + one apply pass instead of materializing q/k/exp(k) in HBM
    (reverse-mode differentiable, custom_vjp). ``fused='jvp'`` dispatches
    to its forward-mode custom_jvp twin — what the likelihood engine's
    Hutchinson ``jax.jvp`` needs (a function carries only one custom AD
    rule, so the two modes are separate entry points)."""
    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rezero_g=None, fused: bool = False,
                 phases: int = 1):
        b, f, t, _ = x.shape
        cin = x.shape[-1] // phases
        hidden = self.heads * self.dim_head
        # Channel order is (qkv, heads, dim_head) — matches the reference's
        # rearrange 'b (qkv heads c) h w -> qkv b heads c (h w)'. One
        # parameter tensor (converter-compatible with the reference's
        # single to_qkv conv), but applied as three separate 1x1
        # convs/matmuls: the k-softmax reductions below then read only the
        # 1/3-size k tensor instead of slicing the fused qkv output
        # (measured ~1 ms/fwd saved at the top U-Net level on v5e).
        w_qkv = _ParamHolder((1, 1, cin, hidden * 3), name='to_qkv')()
        # to_out params declared directly (same tree as an nn.Conv) so both
        # the jnp and the fused kernel path share them
        w_out, b_out = _ConvParamHolder((1, 1, hidden, self.dim),
                                        name='to_out')()
        if fused and rezero_g is not None:
            # fused=True -> custom_vjp kernel (training / synthesis);
            # fused='jvp' -> the custom_jvp twin for forward-mode callers
            # (the Hutchinson likelihood engine). Same primal math.
            from gradtts_tpu.ops.pallas.linear_attention import (
                fused_linear_attention_rezero,
                fused_linear_attention_rezero_jvp)
            fn = (fused_linear_attention_rezero_jvp if fused == 'jvp'
                  else fused_linear_attention_rezero)
            wf = w_qkv[0, 0]
            return fn(
                x, wf[:, :hidden], wf[:, hidden:2 * hidden],
                wf[:, 2 * hidden:], w_out[0, 0], b_out, rezero_g,
                self.dim_head, phases)
        if phases == 2:
            # frequency-folded jnp path: keep the phase dim explicit so
            # every tensor stays 128-lane-minor (the reshape-relabel
            # alternative halves the lane dim and costs relayout copies —
            # this path serves training's backward and the likelihood
            # engine's jvp, where the Pallas kernel can't)
            return self._jnp_phased(x, w_qkv, w_out, b_out, rezero_g)
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

    def _jnp_phased(self, x, w_qkv, w_out, b_out, rezero_g):
        """Folded-layout jnp attention: same math as the unfolded path with
        positions re-labelled (f, t, phase); the phase dim is a free
        minor-split of the channel dim, so no relayout ever happens and
        every elementwise/contraction op keeps the 128-lane minor dim."""
        hidden = self.heads * self.dim_head
        b, f2, t, c2 = x.shape
        cin = c2 // 2
        xr = x.reshape(b, f2, t, 2, cin)
        w = w_qkv[0, 0].astype(self.dtype)
        q = jnp.einsum('bftpc,cd->bftpd', xr, w[:, :hidden])
        k = jnp.einsum('bftpc,cd->bftpd', xr, w[:, hidden:2 * hidden])
        v = jnp.einsum('bftpc,cd->bftpd', xr, w[:, 2 * hidden:])
        k = k.astype(jnp.float32)
        m = jax.lax.stop_gradient(jnp.max(k, axis=(1, 2, 3), keepdims=True))
        ek = jnp.exp(k - m).astype(self.dtype)
        den = jnp.sum(ek.astype(jnp.float32), axis=(1, 2, 3))   # [B, HD]
        context = jnp.einsum('bftpd,bftpe->bde', ek, v,
                             preferred_element_type=jnp.float32)
        head = jnp.arange(hidden) // self.dim_head
        block_diag = (head[:, None] == head[None, :]).astype(jnp.float32)
        context = context * block_diag / den[:, :, None]
        out = jnp.einsum('bde,bftpd->bftpe', context.astype(self.dtype), q,
                         preferred_element_type=jnp.float32)
        y = jnp.einsum('bftpe,ec->bftpc', out.astype(self.dtype),
                       w_out[0, 0].astype(self.dtype))
        y = (y + b_out.astype(self.dtype)).reshape(b, f2, t, c2)
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
    def __call__(self, x, fused: bool = False, fold: bool = False):
        g = self.param('g', nn.initializers.zeros, (1,))
        if fold:
            # Linear attention sums softmax(k) v over ALL (F, T) positions
            # — position-permutation-invariant — so the folded layout is
            # just a position re-labelling. Both backends handle it
            # natively (the Pallas kernel via block-diagonal projections,
            # the jnp path via an explicit phase dim) with no lane-halving
            # reshape at the HLO level.
            return LinearAttention(self.dim, dtype=self.dtype,
                                   name='fn')(x, rezero_g=g, fused=fused,
                                              phases=2)
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
                 fused_attention: bool = False, fold_freq: bool = True):
        use_spk_channel = self.n_spks > 1
        has_spk_mlp = self.n_spks > 1 or self.n_spks == -1

        if has_spk_mlp and spk is not None:
            s = nn.Dense(self.spk_emb_dim * 4, name='spk_mlp_0')(spk)
            s = nn.Dense(self.n_feats, name='spk_mlp_2')(mish(s))
        t_emb = SinusoidalPosEmb(self.dim, name='time_pos_emb')(
            t, scale=self.pe_scale)
        t_emb = nn.Dense(self.dim * 4, name='mlp_0')(t_emb)
        t_emb = nn.Dense(self.dim, name='mlp_2')(mish(t_emb))

        # Run the full-resolution level frequency-folded (see the module
        # docstring at freq_fold): exact arithmetic, ~4x conv throughput.
        fold = (fold_freq and self.n_feats % 2 == 0
                and len(self.dim_mults) >= 2)

        # [B, T, F] -> NHWC [B, F, T, C]
        chans = [mu.transpose(0, 2, 1), x.transpose(0, 2, 1)]
        if use_spk_channel:
            chans.append(jnp.broadcast_to(s[:, :, None],
                                          (x.shape[0], self.n_feats, x.shape[1])))
        h = jnp.stack(chans, axis=-1).astype(self.dtype)
        if fold:
            h = freq_fold(h)
        m = mask[:, None, :, None].astype(h.dtype)  # [B, 1, T, 1]

        dims = [2 + (1 if use_spk_channel else 0)] + \
               [self.dim * m_ for m_ in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        hiddens = []
        masks = [m]
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            lvl_fold = fold and ind == 0
            mask_down = masks[-1]
            h = ResnetBlock(dim_in, dim_out, self.groups, self.dtype,
                            name=f'downs_{ind}_res1')(h, mask_down, t_emb,
                                                      fold=lvl_fold)
            h = ResnetBlock(dim_out, dim_out, self.groups, self.dtype,
                            name=f'downs_{ind}_res2')(h, mask_down, t_emb,
                                                      fold=lvl_fold)
            h = Rezero(dim_out, self.dtype,
                       name=f'downs_{ind}_attn')(h, fused=fused_attention,
                                                 fold=lvl_fold)
            hiddens.append(h)
            if not is_last:
                h = Downsample(dim_out, self.dtype,
                               name=f'downs_{ind}_down')(h * mask_down,
                                                         fold_in=lvl_fold)
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

        def ups_lvl_fold(ind):
            # the second-to-top level also runs half-lane (dim_in == dim
            # at F/2): fold it too when its F extent is still even
            return fold and ind == num_res - 2 \
                and (self.n_feats // 2) % 2 == 0

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            mask_up = masks.pop()
            top = ind == num_res - 2
            lvl_fold = ups_lvl_fold(ind)
            if lvl_fold:
                # h arrives FOLDED from the previous Upsample(fold_out);
                # fold only the skip and concat half-major — block1 /
                # res_conv kernel rows are permuted at trace time
                # (half_major_perm) instead of interleaving the data,
                # which cost ~0.7 ms/fwd in transpose copies (round 4)
                if ind == 0:  # num_res == 2: h comes from mid, unfolded
                    h = freq_fold(h)
                h = jnp.concatenate([h, freq_fold(hiddens.pop())], axis=-1)
            else:
                h = jnp.concatenate([h, hiddens.pop()], axis=-1)
            h = ResnetBlock(dim_out * 2, dim_in, self.groups, self.dtype,
                            name=f'ups_{ind}_res1')(h, mask_up, t_emb,
                                                    fold=lvl_fold,
                                                    half_major=lvl_fold)
            h = ResnetBlock(dim_in, dim_in, self.groups, self.dtype,
                            name=f'ups_{ind}_res2')(h, mask_up, t_emb,
                                                    fold=lvl_fold)
            h = Rezero(dim_in, self.dtype,
                       name=f'ups_{ind}_attn')(h, fused=fused_attention,
                                               fold=lvl_fold)
            h = h * mask_up
            if lvl_fold:
                h = freq_unfold(h, dim_in)
            # emit folded directly when the NEXT ups level runs folded
            # (it consumes the (phase, c) layout natively) or at the top
            # (final_block is folded)
            h = Upsample(dim_in, self.dtype,
                         name=f'ups_{ind}_up')(
                h, fold_out=(fold and top) or ups_lvl_fold(ind + 1))

        h = Block(self.dim, self.groups, self.dtype,
                  name='final_block')(h, m, fold=fold)
        if fold:
            w, b = _ConvParamHolder((1, 1, self.dim, 1),
                                    name='final_conv')()
            hm = (h * m).astype(self.dtype)
            bb, f2, tt, _ = hm.shape
            # block-diagonal [2C, 2] matmul keeps the folded layout (the
            # 5-D phase reshape cost a relayout copy; round-4 profile) —
            # output channel p IS the phase
            w2 = jnp.kron(jnp.eye(2, dtype=w.dtype), w[0, 0])  # [2C, 2]
            out = jnp.einsum('bftc,co->bfto', hm, w2.astype(self.dtype),
                             preferred_element_type=jnp.float32)
            out = out.astype(self.dtype) + b.astype(self.dtype)
            out = (out * m).astype(jnp.float32)       # [B, F2, T, 2]
            # unfold phases back into F and emit [B, T, F]
            return out.transpose(0, 2, 1, 3).reshape(bb, tt, 2 * f2)
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
                          beta_min, beta_max, spk=None, t_min=0.02):
    """Multistep exponential-integrator sampler (DPM-Solver-2M,
    eps-prediction, uniform log-SNR grid) for the Grad-TTS
    probability-flow ODE — a fast-sampling capability beyond the
    reference's Euler-only sampler (diffusion.py:254-268).

    The forward marginal is x_t = mu + alpha_t (x0 - mu) + sigma_t eps
    with alpha_t = e^{-zeta(t)}, zeta = 0.5 int beta, sigma_t^2 =
    1 - alpha_t^2. In the log-SNR variable lambda = log(alpha/sigma) the
    reverse ODE is semi-linear in the NOISE prediction
    eps_hat = -sigma s  (s = score estimate):

        y(r) = (alpha_r / alpha_t) y(t) - sigma_r (e^h - 1) E~,
        h = lambda_r - lambda_t > 0,  y = x - mu,

    where E~ linearly extrapolates eps_hat from the previous evaluation
    ((1 + 1/2r) E_t - (1/2r) E_prev, r = h_prev/h; plain E_t on the first
    step). Only the bounded noise prediction (|eps_hat| ~ 1) is
    approximated — the stiff linear drift integrates exactly.

    Round-4 design notes, selected empirically on weights TRAINED to
    convergence (test_dpm_fidelity_on_trained_weights — the random-init
    score field hides all of this):
    - eps-prediction, NOT the x0-prediction (DPM-Solver++) form: x0-pred
      divides the score error by alpha(1) ~ 7e-3 on the first step, which
      measurably diverges (NaN at 4 steps) for any realistically accurate
      net; the eps form keeps the extrapolated quantity O(1).
    - uniform log-SNR spacing, NOT uniform t: equalizes per-step
      integrated error; uniform-t at 4 steps loses to Euler on trained
      weights, uniform-lambda wins.
    - stop at ``t_min`` = 0.02 (sigma ~ 0.07, ~0.6 dB residual in
      log-mel): the true score grows as 1/sigma^2 there while the trained
      net is least accurate, so integrating deeper ADDS error at every
      step count measured (4..50).

    Cost per step is identical to Euler (one estimator call); the sampler
    compiles to a single ``lax.scan``.
    """
    dtype = z.dtype
    # invert lambda(t) on a dense table to get the uniform-log-SNR grid
    tt = jnp.linspace(jnp.asarray(t_min, dtype), 1.0, 2049)
    zt = 0.5 * get_noise(tt, beta_min, beta_max, cumulative=True)
    lam_tab = -zt - 0.5 * jnp.log(-jnp.expm1(-2.0 * zt))
    lam_edges = jnp.linspace(lam_tab[-1], lam_tab[0], n_timesteps + 1)
    ts = jnp.interp(lam_edges, lam_tab[::-1], tt[::-1])
    zetas = 0.5 * get_noise(ts, beta_min, beta_max, cumulative=True)
    alphas = jnp.exp(-zetas)
    sigmas = jnp.sqrt(-jnp.expm1(-2.0 * zetas))
    hs = lam_edges[1:] - lam_edges[:-1]   # > 0, uniform
    xt = z * mask

    def step(carry, i):
        xt, e_prev, h_prev = carry
        t = ts[i] * jnp.ones((z.shape[0],), dtype=dtype)
        s_t = estimator_fn(xt, mask[..., 0], mu, t, spk)
        eps_t = -sigmas[i] * s_t              # bounded noise prediction
        y = xt - mu
        h = hs[i]
        first = (i == 0)
        r = h_prev / h
        e_ext = jnp.where(
            first, eps_t,
            (1.0 + 0.5 / r) * eps_t - (0.5 / r) * e_prev)
        y_new = (alphas[i + 1] / alphas[i]) * y \
            - sigmas[i + 1] * jnp.expm1(h) * e_ext
        xt_new = mu + y_new
        return ((xt_new * mask).astype(xt.dtype), eps_t, h), None

    (xt, _, _), _ = jax.lax.scan(
        step, (xt, jnp.zeros_like(xt), jnp.asarray(1.0, dtype)),
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
