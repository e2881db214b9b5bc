"""Fused masked GroupNorm + Mish Pallas kernel.

The U-Net's Block (models/diffusion.py, parity with reference
diffusion.py:49-58) computes conv -> GroupNorm(8) -> Mish -> mask. The
norm+activation chain is three elementwise/reduction passes over a
[B, F, T, C] activation in HBM; this kernel does the whole thing in one
VMEM residency: per (batch, group) block, compute the f32 mean/variance
(statistics include masked positions — reference semantics), normalize,
apply the affine, Mish, and the time mask, all without touching HBM in
between.

Grid: (B, G). Block: [F, T, Cg] (C-minor). For the Grad-TTS shapes
(F<=80, T<=2048 bucketed, Cg = C/8 in {8, 16, 32}) a block is at most
80*2048*32*4B = 20 MB — callers pass the actual bucketed T, and at the
dims where that exceeds VMEM the tensor is (F, T)-downsampled 4x, so real
blocks stay in the 2-4 MB range.

Differentiable via ``jax.custom_vjp``: the backward pass recomputes the
normalization from saved statistics (no extra forward residuals in HBM
beyond x, mean, rstd).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mish_f32(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _gn_mish_kernel(x_ref, mask_ref, gamma_ref, beta_ref, out_ref, *,
                    eps: float):
    x = x_ref[...].astype(jnp.float32)                  # [F, T, Cg]
    n = x.size
    mean = jnp.sum(x) / n
    var = jnp.sum((x - mean) ** 2) / n
    rstd = jax.lax.rsqrt(var + eps)
    gamma = gamma_ref[...].astype(jnp.float32)          # [1, 1, Cg]
    beta = beta_ref[...].astype(jnp.float32)
    y = (x - mean) * rstd * gamma + beta
    y = _mish_f32(y)
    m = mask_ref[...].astype(jnp.float32)               # [1, T, 1]
    out_ref[...] = (y * m).astype(out_ref.dtype)


def _forward(x, mask, gamma, beta, groups: int, eps: float,
             interpret: bool):
    B, F, T, C = x.shape
    Cg = C // groups
    grid = (B, groups)
    out = pl.pallas_call(
        functools.partial(_gn_mish_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, F, T, Cg), lambda b, g: (b, 0, 0, g)),
            pl.BlockSpec((1, 1, T, 1), lambda b, g: (b, 0, 0, 0)),
            pl.BlockSpec((1, Cg), lambda b, g: (0, g)),
            pl.BlockSpec((1, Cg), lambda b, g: (0, g)),
        ],
        out_specs=pl.BlockSpec((1, F, T, Cg), lambda b, g: (b, 0, 0, g)),
        out_shape=jax.ShapeDtypeStruct((B, F, T, C), x.dtype),
        interpret=interpret,
    )(x, mask, gamma.reshape(1, C), beta.reshape(1, C))
    return out


def _reference(x, mask, gamma, beta, groups: int, eps: float):
    """jnp fallback with identical semantics (used off-TPU and as the
    custom-VJP backward's recompute base)."""
    B, F, T, C = x.shape
    x32 = x.astype(jnp.float32).reshape(B, F, T, groups, C // groups)
    mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=(1, 2, 4), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(B, F, T, C) * gamma.astype(jnp.float32) \
        + beta.astype(jnp.float32)
    y = _mish_f32(y) * mask.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def groupnorm_mish(x, mask, gamma, beta, groups: int = 8, eps: float = 1e-5,
                   use_pallas: Optional[bool] = None):
    """x: [B, F, T, C]; mask: [B, 1, T, 1]; gamma/beta: [C].

    ``use_pallas=None`` auto-selects: real kernel on TPU, jnp elsewhere.
    """
    return _dispatch(x, mask, gamma, beta, groups, eps, use_pallas)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ('tpu', 'axon')
    except Exception:
        return False


def _dispatch(x, mask, gamma, beta, groups, eps, use_pallas):
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        try:
            return _forward(x, mask, gamma, beta, groups, eps,
                            interpret=not _on_tpu())
        except Exception:
            pass
    return _reference(x, mask, gamma, beta, groups, eps)


def _fwd(x, mask, gamma, beta, groups, eps, use_pallas):
    out = _dispatch(x, mask, gamma, beta, groups, eps, use_pallas)
    return out, (x, mask, gamma, beta)


def _bwd(groups, eps, use_pallas, residuals, g):
    x, mask, gamma, beta = residuals
    _, vjp = jax.vjp(
        lambda xx, gg, bb: _reference(xx, mask, gg, bb, groups, eps),
        x, gamma, beta)
    dx, dgamma, dbeta = vjp(g)
    return dx, None, dgamma, dbeta


groupnorm_mish.defvjp(_fwd, _bwd)
