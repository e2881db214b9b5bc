"""Sequence utilities: masks, duration->alignment paths, duration loss.

Behavioral parity targets: /root/reference/model/utils.py:6-44. All functions
are pure jnp, jit-safe (static shapes), and operate on batched arrays.

Layout note: unlike the reference (channel-first [B, C, T]), this framework
uses time-major [B, T] masks and [B, T, C] activations so the channel axis is
lane-minor on TPU.
"""

import jax.numpy as jnp

from gradtts_tpu.config import fix_len_compatibility  # noqa: F401 (re-export)


def sequence_mask(lengths, max_length):
    """[B] lengths -> [B, max_length] bool mask (True inside the sequence).

    ``max_length`` must be static under jit.
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def generate_path(duration, mask):
    """Expand per-token durations into a binary alignment map.

    Args:
      duration: [B, Tx] float/int durations per text token.
      mask: [B, Tx, Ty] attention mask.
    Returns:
      [B, Tx, Ty] binary path where row x covers frames
      [cumsum[x-1], cumsum[x]). Same cumsum-difference trick as the reference
      (/root/reference/model/utils.py:26-39) — a cheap, fully-vectorized op.
    """
    t_y = mask.shape[-1]
    cum = jnp.cumsum(duration, axis=1)  # [B, Tx]
    pos = jnp.arange(t_y, dtype=cum.dtype)
    path = (pos[None, None, :] < cum[:, :, None]).astype(mask.dtype)
    path = path - jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return path * mask


def duration_loss(logw, logw_hat, lengths):
    """MSE between log-durations, normalized by total token count
    (parity: /root/reference/model/utils.py:42-44)."""
    return jnp.sum((logw - logw_hat) ** 2) / jnp.sum(lengths)
