"""Text encoder: phoneme embedding -> conv prenet -> relative-position
transformer -> mel prior (mu_x) + stop-gradient duration predictor.

Behavioral parity targets: /root/reference/model/text_encoder.py
(TextEncoder :285-335, Encoder :244-282, MultiHeadAttention with windowed
relative attention :96-217, FFN :220-241, ConvReluNorm :32-64,
DurationPredictor :67-93). Re-designed for TPU: [B, T, C] layout so every
conv/matmul contracts over the lane-minor channel axis; attention is a pair
of einsums on the MXU; the relative->absolute index shuffles are the same
pad/reshape tricks (pure data movement, XLA fuses them).
"""

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gradtts_tpu.models.layers import ChannelLayerNorm, conv1d
from gradtts_tpu.ops.seq import sequence_mask


class ConvReluNorm(nn.Module):
    """Conv prenet with residual projection (zero-init'd proj, so the prenet
    is an identity at init — parity: text_encoder.py:54-55)."""
    hidden_channels: int
    out_channels: int
    kernel_size: int = 5
    n_layers: int = 3
    p_dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        # x: [B, T, C]; x_mask: [B, T, 1]
        x_org = x
        for i in range(self.n_layers):
            x = conv1d(self.hidden_channels, self.kernel_size,
                       name=f'conv_layers_{i}', dtype=self.dtype)(x * x_mask)
            x = ChannelLayerNorm(self.hidden_channels,
                                 name=f'norm_layers_{i}')(x)
            x = nn.relu(x)
            x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = x_org + conv1d(self.out_channels, 1, name='proj',
                           kernel_init=nn.initializers.zeros,
                           dtype=self.dtype)(x)
        return x * x_mask


class DurationPredictor(nn.Module):
    """2x (conv -> relu -> LN -> dropout) -> 1x1 conv, on detached encoder
    output (parity: text_encoder.py:67-93)."""
    filter_channels: int
    kernel_size: int
    p_dropout: float

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        x = conv1d(self.filter_channels, self.kernel_size, name='conv_1')(x * x_mask)
        x = nn.relu(x)
        x = ChannelLayerNorm(self.filter_channels, name='norm_1')(x)
        x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = conv1d(self.filter_channels, self.kernel_size, name='conv_2')(x * x_mask)
        x = nn.relu(x)
        x = ChannelLayerNorm(self.filter_channels, name='norm_2')(x)
        x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = conv1d(1, 1, name='proj')(x * x_mask)
        return x * x_mask


def _relative_to_absolute(x):
    """[B, H, L, 2L-1] relative-keyed logits -> [B, H, L, L] absolute
    (parity: text_encoder.py:198-204)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, l * 2 * l)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, l - 1)))
    return x_flat.reshape(b, h, l + 1, 2 * l - 1)[:, :, :l, l - 1:]


def _absolute_to_relative(x):
    """[B, H, L, L] attention weights -> [B, H, L, 2L-1] relative
    (parity: text_encoder.py:206-212)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x_flat = x.reshape(b, h, l * l + l * (l - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (l, 0)))
    return x_flat.reshape(b, h, l, 2 * l)[:, :, :, 1:]


def _get_relative_embeddings(emb, length, window_size):
    """Slice/pad the [n_heads_rel, 2w+1, d] window embedding table to
    [n_heads_rel, 2*length-1, d] (parity: text_encoder.py:184-196)."""
    pad_length = max(length - (window_size + 1), 0)
    slice_start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return emb[:, slice_start:slice_start + 2 * length - 1]


class MultiHeadAttention(nn.Module):
    """Self-attention with windowed relative position embeddings
    (parity: text_encoder.py:96-217; heads_share=True, window_size=4)."""
    channels: int
    out_channels: int
    n_heads: int
    window_size: Optional[int] = None
    p_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, train: bool = False):
        # x: [B, T, C]
        b, t, _ = x.shape
        h = self.n_heads
        d = self.channels // h
        xavier = nn.initializers.xavier_uniform()
        q = nn.Dense(self.channels, name='conv_q', kernel_init=xavier,
                     dtype=self.dtype)(x)
        k = nn.Dense(self.channels, name='conv_k', kernel_init=xavier,
                     dtype=self.dtype)(x)
        v = nn.Dense(self.channels, name='conv_v', kernel_init=xavier,
                     dtype=self.dtype)(x)

        q = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)  # [B, H, T, D]
        k = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)

        scores = jnp.einsum('bhtd,bhsd->bhts', q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(d)

        if self.window_size is not None:
            rel_stddev = d ** -0.5
            emb_rel_k = self.param(
                'emb_rel_k',
                nn.initializers.normal(rel_stddev),
                (1, 2 * self.window_size + 1, d))
            emb_rel_v = self.param(
                'emb_rel_v',
                nn.initializers.normal(rel_stddev),
                (1, 2 * self.window_size + 1, d))
            key_rel = _get_relative_embeddings(emb_rel_k, t, self.window_size)
            rel_logits = jnp.einsum('bhtd,nmd->bhtm', q,
                                    key_rel.astype(q.dtype),
                                    preferred_element_type=jnp.float32)
            scores = scores + _relative_to_absolute(rel_logits) / math.sqrt(d)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        p_attn = nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout, deterministic=not train)(p_attn)
        # Keep the f32 softmax probabilities (and rel-pos weights/values)
        # in f32 through the value contractions: the encoder runs once per
        # synthesis vs 10+ U-Net calls, so the f32 matmul cost is
        # negligible while the numerics stay close to the f32 torch
        # reference even when the compute dtype is bf16.
        output = jnp.einsum('bhts,bhsd->bhtd', p_attn, v,
                            preferred_element_type=jnp.float32)
        if self.window_size is not None:
            rel_weights = _absolute_to_relative(p_attn)
            value_rel = _get_relative_embeddings(emb_rel_v, t, self.window_size)
            output = output + jnp.einsum('bhtm,nmd->bhtd',
                                         rel_weights, value_rel,
                                         preferred_element_type=jnp.float32)
        output = output.astype(v.dtype)
        output = output.transpose(0, 2, 1, 3).reshape(b, t, self.channels)
        return nn.Dense(self.out_channels, name='conv_o',
                        dtype=self.dtype)(output)


class FFN(nn.Module):
    """Conv feed-forward block (parity: text_encoder.py:220-241)."""
    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        x = conv1d(self.filter_channels, self.kernel_size, name='conv_1',
                   dtype=self.dtype)(x * x_mask)
        x = nn.relu(x)
        x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = conv1d(self.out_channels, self.kernel_size, name='conv_2',
                   dtype=self.dtype)(x * x_mask)
        return x * x_mask


class Encoder(nn.Module):
    """Stack of (rel-pos MHA + LN, FFN + LN) blocks
    (parity: text_encoder.py:244-282)."""
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        # x: [B, T, C]; x_mask: [B, T, 1]
        attn_mask = (x_mask[:, None, :, 0:1] * x_mask[:, None, None, :, 0])
        for i in range(self.n_layers):
            x = x * x_mask
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                window_size=self.window_size, p_dropout=self.p_dropout,
                dtype=self.dtype,
                name=f'attn_layers_{i}')(x, attn_mask, train=train)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = ChannelLayerNorm(self.hidden_channels,
                                 name=f'norm_layers_1_{i}')(x + y)
            y = FFN(self.hidden_channels, self.filter_channels,
                    self.kernel_size, p_dropout=self.p_dropout,
                    dtype=self.dtype,
                    name=f'ffn_layers_{i}')(x, x_mask, train=train)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = ChannelLayerNorm(self.hidden_channels,
                                 name=f'norm_layers_2_{i}')(x + y)
        return x * x_mask


class TextEncoder(nn.Module):
    """Full text encoder (parity: text_encoder.py:285-335).

    Fork quirk reproduced deliberately: GradTTS constructs this without
    n_spks/spk_emb_dim (tts.py:49-51), so the encoder-side speaker concat
    branch (text_encoder.py:327-328) is dead — speaker conditioning enters
    only through the decoder U-Net. ``n_spks``/``spk_emb_dim`` are kept for
    checkpoints that do use encoder-side concat.
    """
    n_vocab: int
    n_feats: int
    n_channels: int
    filter_channels: int
    filter_channels_dp: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    window_size: Optional[int] = None
    spk_emb_dim: int = 64
    n_spks: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_lengths, spk=None, train: bool = False):
        """x: [B, Tx] int ids; x_lengths: [B].
        Returns (mu_x [B, Tx, n_feats], logw [B, Tx, 1], x_mask [B, Tx, 1])."""
        emb = nn.Embed(
            self.n_vocab, self.n_channels, name='emb',
            embedding_init=nn.initializers.normal(self.n_channels ** -0.5))
        h = emb(x) * math.sqrt(self.n_channels)  # [B, T, C]
        h = h.astype(self.dtype)
        x_mask = sequence_mask(x_lengths, x.shape[1])[..., None].astype(h.dtype)

        h = ConvReluNorm(self.n_channels, self.n_channels,
                         kernel_size=5, n_layers=3, p_dropout=0.5,
                         dtype=self.dtype,
                         name='prenet')(h, x_mask, train=train)
        if self.n_spks > 1 and spk is not None:
            spk_tiled = jnp.broadcast_to(
                spk[:, None, :], (h.shape[0], h.shape[1], spk.shape[-1]))
            h = jnp.concatenate([h, spk_tiled], axis=-1)
        enc_channels = self.n_channels + (self.spk_emb_dim if self.n_spks > 1 else 0)
        h = Encoder(enc_channels, self.filter_channels, self.n_heads,
                    self.n_layers, self.kernel_size, self.p_dropout,
                    window_size=self.window_size, dtype=self.dtype,
                    name='encoder')(h, x_mask, train=train)
        # output heads in f32: mu_x feeds the Gaussian prior / MAS grid and
        # logw feeds exp() durations — keep their small projections full
        # precision regardless of the trunk compute dtype
        h = h.astype(jnp.float32)
        x_mask = x_mask.astype(jnp.float32)
        mu = conv1d(self.n_feats, 1, name='proj_m')(h) * x_mask

        h_dp = jax.lax.stop_gradient(h)
        logw = DurationPredictor(self.filter_channels_dp, self.kernel_size,
                                 self.p_dropout,
                                 name='proj_w')(h_dp, x_mask, train=train)
        return mu, logw, x_mask
