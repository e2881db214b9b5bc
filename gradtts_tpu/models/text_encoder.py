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


# --- consolidated encoder stack (round 5) ----------------------------------
#
# The module-per-layer loop (kept above as the parity twin:
# MultiHeadAttention + FFN) emits ~70 small HLO ops per layer at
# [B, Tx<=192, 192]. The Encoder below computes the SAME math (same param
# tree, same names/initializers — checkpoints and the converter are
# unaffected) restructured for XLA:
#
# - per-layer params are declared by tiny param-holder modules, stacked at
#   trace time, and the 6-layer loop becomes ONE lax.scan body (6x fewer
#   ops for XLA to schedule, one compilation of the layer);
# - the q/k/v projections run as one [C, 3C] matmul;
# - the windowed rel-pos logits ride the score matmul (keys concat'd with
#   the broadcast window embeddings) and the rel-pos value contraction
#   rides the value matmul — 4 MXU ops per layer instead of 7.
#
# Measured outcome (v5e, B16 full train step, interleaved same-process
# A/B over 4 reps): legacy module loop 16.97-17.68 ms, consolidated
# unrolled 17.07-17.44, consolidated scan 17.09-17.50 — all three
# IDENTICAL within the tunnel's run-to-run spread. This closes the
# round-4 "encoder small-op dispatch tail (~1.5-2 ms)" headroom item
# NEGATIVELY: the tail is not dispatch-bound (6x fewer, 3x larger ops
# moved nothing), it is intrinsic small-shape latency at TX<=192. The
# scan form is kept for its ~6x smaller HLO program (faster compiles),
# not for step time. See PERFORMANCE.md "Round-5 encoder consolidation".


class _DenseParams(nn.Module):
    """kernel + bias with nn.Dense's param tree, returned as tensors."""
    features: int
    in_features: int
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        return (self.param('kernel', self.kernel_init,
                           (self.in_features, self.features)),
                self.param('bias', nn.initializers.zeros, (self.features,)))


class _ConvParams(nn.Module):
    """kernel + bias with nn.Conv's param tree ([W, I, O] kernel)."""
    features: int
    in_features: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        return (self.param('kernel', nn.initializers.lecun_normal(),
                           (self.kernel_size, self.in_features,
                            self.features)),
                self.param('bias', nn.initializers.zeros, (self.features,)))


class _LNParams(nn.Module):
    """gamma + beta with ChannelLayerNorm's param tree."""
    channels: int

    @nn.compact
    def __call__(self):
        return (self.param('gamma', nn.initializers.ones, (self.channels,)),
                self.param('beta', nn.initializers.zeros, (self.channels,)))


class _MHAParams(nn.Module):
    """One attention layer's params, tree-identical to MultiHeadAttention."""
    channels: int
    out_channels: int
    n_heads: int
    window_size: Optional[int] = None

    @nn.compact
    def __call__(self):
        xavier = nn.initializers.xavier_uniform()
        d = self.channels // self.n_heads
        wq, bq = _DenseParams(self.channels, self.channels, xavier,
                              name='conv_q')()
        wk, bk = _DenseParams(self.channels, self.channels, xavier,
                              name='conv_k')()
        wv, bv = _DenseParams(self.channels, self.channels, xavier,
                              name='conv_v')()
        wo, bo = _DenseParams(self.out_channels, self.channels,
                              name='conv_o')()
        p = {'wq': wq, 'bq': bq, 'wk': wk, 'bk': bk, 'wv': wv, 'bv': bv,
             'wo': wo, 'bo': bo}
        if self.window_size is not None:
            rel_stddev = d ** -0.5
            p['rk'] = self.param('emb_rel_k',
                                 nn.initializers.normal(rel_stddev),
                                 (1, 2 * self.window_size + 1, d))
            p['rv'] = self.param('emb_rel_v',
                                 nn.initializers.normal(rel_stddev),
                                 (1, 2 * self.window_size + 1, d))
        return p


class _FFNParams(nn.Module):
    """One FFN layer's params, tree-identical to FFN."""
    channels: int
    filter_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        w1, b1 = _ConvParams(self.filter_channels, self.channels,
                             self.kernel_size, name='conv_1')()
        w2, b2 = _ConvParams(self.channels, self.filter_channels,
                             self.kernel_size, name='conv_2')()
        return {'w1': w1, 'b1': b1, 'w2': w2, 'b2': b2}


def _dropout(x, rate: float, key):
    """flax nn.Dropout semantics: scale-by-1/keep, broadcast over nothing."""
    if key is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def _ln_apply(x, gamma, beta, eps: float = 1e-4):
    """ChannelLayerNorm as a pure function (biased variance, f32 stats)."""
    out_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    y = (x32 - mean) / jnp.sqrt(var + eps)
    return (y * gamma + beta).astype(out_dtype)


def _mha_apply(p, x, attn_mask, n_heads: int, window_size: Optional[int],
               dtype, drop_p: float, key):
    """MultiHeadAttention math with the projections fused: one qkv matmul,
    rel-pos logits fused into the score matmul (keys axis extended by the
    2T-1 window embeddings), rel-pos values fused into the value matmul."""
    b, t, c = x.shape
    h, d = n_heads, c // n_heads
    wqkv = jnp.concatenate([p['wq'], p['wk'], p['wv']], axis=1).astype(dtype)
    bqkv = jnp.concatenate([p['bq'], p['bk'], p['bv']]).astype(dtype)
    qkv = x.astype(dtype) @ wqkv + bqkv                    # [B, T, 3C]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)        # [B, H, T, D]
    k = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)

    if window_size is not None:
        key_rel = _get_relative_embeddings(p['rk'], t, window_size)
        kr = jnp.broadcast_to(key_rel[None].astype(q.dtype),
                              (b, h, 2 * t - 1, d))
        k2 = jnp.concatenate([k, kr], axis=2)              # [B, H, 3T-1, D]
    else:
        k2 = k
    scores_all = jnp.einsum('bhtd,bhsd->bhts', q, k2,
                            preferred_element_type=jnp.float32)
    scores_all = scores_all / math.sqrt(d)
    scores = scores_all[..., :t]
    if window_size is not None:
        scores = scores + _relative_to_absolute(scores_all[..., t:])

    if attn_mask is not None:
        scores = jnp.where(attn_mask == 0, -1e4, scores)
    p_attn = jax.nn.softmax(scores, axis=-1)               # f32
    p_attn = _dropout(p_attn, drop_p, key)
    # f32 probabilities kept through the value contractions (encoder runs
    # once per synthesis vs 10+ U-Net calls; numerics track the f32 torch
    # reference even under bf16 compute)
    if window_size is not None:
        rel_weights = _absolute_to_relative(p_attn)        # [B, H, T, 2T-1]
        value_rel = _get_relative_embeddings(p['rv'], t, window_size)
        vr = jnp.broadcast_to(value_rel[None], (b, h, 2 * t - 1, d))
        v2 = jnp.concatenate([v.astype(jnp.float32), vr], axis=2)
        pall = jnp.concatenate([p_attn, rel_weights], axis=-1)
        output = jnp.einsum('bhts,bhsd->bhtd', pall, v2,
                            preferred_element_type=jnp.float32)
    else:
        output = jnp.einsum('bhts,bhsd->bhtd', p_attn, v,
                            preferred_element_type=jnp.float32)
    output = output.astype(v.dtype)
    output = output.transpose(0, 2, 1, 3).reshape(b, t, c)
    return output @ p['wo'].astype(dtype) + p['bo'].astype(dtype)


def _ffn_apply(p, x, x_mask, kernel_size: int, dtype, drop_p: float, key):
    """FFN math as a pure function (conv -> relu -> dropout -> conv)."""
    pad = kernel_size // 2
    dn = ('NWC', 'WIO', 'NWC')
    y = (x * x_mask).astype(dtype)
    y = jax.lax.conv_general_dilated(
        y, p['w1'].astype(dtype), (1,), [(pad, pad)],
        dimension_numbers=dn) + p['b1'].astype(dtype)
    y = nn.relu(y)
    y = _dropout(y, drop_p, key)
    y = (y * x_mask).astype(dtype)
    y = jax.lax.conv_general_dilated(
        y, p['w2'].astype(dtype), (1,), [(pad, pad)],
        dimension_numbers=dn) + p['b2'].astype(dtype)
    return y * x_mask


class Encoder(nn.Module):
    """Stack of (rel-pos MHA + LN, FFN + LN) blocks
    (parity: text_encoder.py:244-282), consolidated into one lax.scan over
    trace-time-stacked per-layer params (see section comment above). The
    param tree is identical to the module-per-layer twin, and eval-mode
    outputs agree to f32 tolerance (tests/test_model_parity.py)."""
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
        layers = []
        for i in range(self.n_layers):
            layers.append({
                'attn': _MHAParams(self.hidden_channels,
                                   self.hidden_channels, self.n_heads,
                                   self.window_size,
                                   name=f'attn_layers_{i}')(),
                'ln1': _LNParams(self.hidden_channels,
                                 name=f'norm_layers_1_{i}')(),
                'ffn': _FFNParams(self.hidden_channels,
                                  self.filter_channels, self.kernel_size,
                                  name=f'ffn_layers_{i}')(),
                'ln2': _LNParams(self.hidden_channels,
                                 name=f'norm_layers_2_{i}')(),
            })
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)

        drop = self.p_dropout if train else 0.0

        def layer(x, p, keys):
            x = x * x_mask
            y = _mha_apply(p['attn'], x, attn_mask, self.n_heads,
                           self.window_size, self.dtype, drop, keys[0])
            y = _dropout(y, drop, keys[1])
            x = _ln_apply(x + y, *p['ln1'])
            y = _ffn_apply(p['ffn'], x, x_mask, self.kernel_size,
                           self.dtype, drop, keys[2])
            y = _dropout(y, drop, keys[3])
            return _ln_apply(x + y, *p['ln2'])

        if drop > 0.0:
            keys = jax.random.split(self.make_rng('dropout'),
                                    self.n_layers * 4)
            keys = keys.reshape((self.n_layers, 4) + keys.shape[1:])

            def body(x, s):
                p, kk = s
                return layer(x, p, [kk[0], kk[1], kk[2], kk[3]]), None

            x, _ = jax.lax.scan(body, x, (stacked, keys))
        else:
            def body(x, p):
                return layer(x, p, [None] * 4), None

            x, _ = jax.lax.scan(body, x, stacked)
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
