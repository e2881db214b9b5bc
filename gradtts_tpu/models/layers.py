"""Shared neural-net building blocks (flax.linen).

Layout convention (TPU-first): 1-D sequence activations are [B, T, C]
(time-major, channels lane-minor), 2-D spectrogram activations are NHWC
[B, F, T, C]. The reference uses channel-first torch layouts; the converter
in gradtts_tpu/utils/convert.py handles the transposes.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


def mish(x):
    """Mish activation (parity: /root/reference/model/diffusion.py:16-18)."""
    return x * jnp.tanh(nn.softplus(x))


def conv1d(features, kernel_size=1, name=None, use_bias=True, dtype=None,
           kernel_init=nn.initializers.lecun_normal()):
    """1-D conv on [B, T, C] with torch ``padding=k//2`` semantics (SAME for
    the odd kernels this model uses)."""
    return nn.Conv(features=features, kernel_size=(kernel_size,),
                   padding=[(kernel_size // 2, kernel_size // 2)],
                   use_bias=use_bias, dtype=dtype, name=name,
                   kernel_init=kernel_init)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis with biased variance and the
    reference's eps (parity: /root/reference/model/text_encoder.py:11-29,
    which normalizes dim 1 of [B, C, T]; here C is the last axis)."""
    channels: int
    eps: float = 1e-4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        gamma = self.param('gamma', nn.initializers.ones, (self.channels,))
        beta = self.param('beta', nn.initializers.zeros, (self.channels,))
        out_dtype = self.dtype or x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
        y = (x32 - mean) / jnp.sqrt(var + self.eps)
        y = y * gamma + beta
        return y.astype(out_dtype)
