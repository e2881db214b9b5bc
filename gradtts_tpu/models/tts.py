"""GradTTS: the end-to-end text-to-mel model and its algorithms.

Behavioral parity targets: /root/reference/model/tts.py — forward/synthesis
(:54-108), compute_loss (:110-194), get_score_model (:197-254).

Structure: ``GradTTS`` (flax module) owns the parameterized pieces (text
encoder, score-estimator U-Net, optional speaker-id embedding table); the
algorithms — synthesis with the scanned Euler sampler, the 3-loss training
objective with on-device MAS and a vectorized random crop, and the score-fn
factory for likelihood work — are pure jit-friendly functions over
``(model, params)``.

Layouts are time-major: text ids [B, Tx], mels [B, Ty, F].
"""

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gradtts_tpu.config import GradTTSConfig, fix_len_compatibility
from gradtts_tpu.models.diffusion import (
    GradLogPEstimator2d, diffusion_loss, reverse_diffusion,
    reverse_diffusion_dpm,
)
from gradtts_tpu.models.text_encoder import TextEncoder
from gradtts_tpu.ops.mas import maximum_path
from gradtts_tpu.ops.seq import duration_loss, generate_path, sequence_mask


class GradTTS(nn.Module):
    """Parameter container. Methods:
      - encode(x, x_lengths, spk): text encoder + speaker embedding lookup
      - estimate(x_t, mask, mu, t, spk): score estimator
      - __call__: init path touching every parameter once
    """
    n_vocab: int
    n_spks: int = 1
    spk_emb_dim: int = 64
    n_enc_channels: int = 192
    filter_channels: int = 768
    filter_channels_dp: int = 256
    n_heads: int = 2
    n_enc_layers: int = 6
    enc_kernel: int = 3
    enc_dropout: float = 0.1
    window_size: int = 4
    n_feats: int = 80
    dec_dim: int = 64
    beta_min: float = 0.05
    beta_max: float = 20.0
    pe_scale: float = 1000.0
    # Speaker-conditioning wiring (SURVEY.md §3 quirk). The fork builds the
    # encoder WITHOUT speaker args (tts.py:49-51) so conditioning enters
    # only via the decoder U-Net; the UPSTREAM Grad-TTS (and its Libri-TTS
    # checkpoint) concat the speaker embedding into the encoder after the
    # prenet. encoder_speaker=True instantiates the upstream wiring.
    encoder_speaker: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: GradTTSConfig, **kw):
        base = dict(
            n_vocab=cfg.n_vocab, n_spks=cfg.n_spks,
            spk_emb_dim=cfg.spk_emb_dim,
            encoder_speaker=getattr(cfg, 'encoder_speaker', False),
            n_enc_channels=cfg.encoder.n_enc_channels,
            filter_channels=cfg.encoder.filter_channels,
            filter_channels_dp=cfg.encoder.filter_channels_dp,
            n_heads=cfg.encoder.n_heads,
            n_enc_layers=cfg.encoder.n_enc_layers,
            enc_kernel=cfg.encoder.enc_kernel,
            enc_dropout=cfg.encoder.enc_dropout,
            window_size=cfg.encoder.window_size,
            n_feats=cfg.data.n_feats, dec_dim=cfg.decoder.dec_dim,
            beta_min=cfg.decoder.beta_min, beta_max=cfg.decoder.beta_max,
            pe_scale=cfg.decoder.pe_scale)
        base.update(kw)
        return cls(**base)

    def setup(self):
        if self.n_spks > 1:
            self.spk_emb = nn.Embed(self.n_spks, self.spk_emb_dim)
        # Fork quirk (tts.py:49-51): by default the encoder is built
        # WITHOUT speaker args, so its speaker-concat branch is disabled
        # regardless of n_spks and conditioning enters via the decoder
        # only. encoder_speaker=True restores the upstream wiring
        # (text_encoder.py:314-328) for upstream multi-speaker checkpoints.
        self.encoder = TextEncoder(
            n_vocab=self.n_vocab, n_feats=self.n_feats,
            n_channels=self.n_enc_channels,
            filter_channels=self.filter_channels,
            filter_channels_dp=self.filter_channels_dp,
            n_heads=self.n_heads, n_layers=self.n_enc_layers,
            kernel_size=self.enc_kernel, p_dropout=self.enc_dropout,
            window_size=self.window_size,
            n_spks=self.n_spks if self.encoder_speaker else 1,
            spk_emb_dim=self.spk_emb_dim, dtype=self.dtype)
        self.estimator = GradLogPEstimator2d(
            dim=self.dec_dim, n_spks=self.n_spks,
            spk_emb_dim=self.spk_emb_dim, n_feats=self.n_feats,
            pe_scale=self.pe_scale, dtype=self.dtype)

    def embed_speaker(self, spk):
        """spk-id [B] -> embedding [B, D] (n_spks > 1); external vectors
        pass through (n_spks == -1); None otherwise."""
        if self.n_spks > 1:
            return self.spk_emb(spk)
        if self.n_spks == -1:
            return spk
        return None

    def encode(self, x, x_lengths, spk=None, train: bool = False):
        spk_vec = self.embed_speaker(spk)
        mu_x, logw, x_mask = self.encoder(x, x_lengths, spk_vec, train=train)
        return mu_x, logw, x_mask, spk_vec

    def estimate(self, x_t, mask, mu, t, spk=None, spk_is_embedded=False,
                 fused_attention: bool = False, fold_freq: bool = True):
        spk_vec = spk if spk_is_embedded else self.embed_speaker(spk)
        return self.estimator(x_t, mask, mu, t, spk_vec,
                              fused_attention=fused_attention,
                              fold_freq=fold_freq)

    def __call__(self, x, x_lengths, y, y_lengths, spk=None):
        """Init-only path: touches encoder + estimator params."""
        mu_x, logw, x_mask, spk_vec = self.encode(x, x_lengths, spk)
        t = jnp.zeros((x.shape[0],), dtype=y.dtype)
        y_mask = sequence_mask(y_lengths, y.shape[1]).astype(y.dtype)
        mu_y = jnp.zeros_like(y)
        est = self.estimator(y, y_mask, mu_y, t, spk_vec)
        return mu_x, logw, est


class SynthesisResult(NamedTuple):
    encoder_outputs: jnp.ndarray  # mu_y [B, Ty, F]
    decoder_outputs: jnp.ndarray  # sampled mel [B, Ty, F]
    attn: jnp.ndarray             # [B, Tx, Ty]
    y_lengths: jnp.ndarray        # [B] true frame counts
    y_mask: jnp.ndarray           # [B, Ty, 1]


def synthesize(model: GradTTS, params, x, x_lengths, n_timesteps,
               y_max_length: int, key, temperature=1.0, stoc=False,
               spk=None, length_scale=1.0, sampler: str = 'euler',
               fused_attention: Optional[bool] = None,
               noise=None) -> SynthesisResult:
    """Text -> mel synthesis (parity: tts.py:54-108).

    ``y_max_length`` is a static padded frame budget (a bucket boundary,
    multiple of 4); frames past the duration-predicted length are masked.
    Fork quirk reproduced: ``length_scale`` multiplies the CEIL'd durations
    (tts.py:87), unlike upstream which scales before the ceil.

    ``sampler``: 'euler' (reference parity; 'stoc' selects its SDE branch)
    or 'dpm' — the multistep exponential integrator
    (reverse_diffusion_dpm): on trained weights, ~6-8 DPM steps match
    10 Euler steps and DPM-10 has ~3-5x less ODE error than Euler-10
    (tests/test_dpm_sampler.py).

    ``fused_attention``: use the Pallas flash-style attention kernel inside
    the U-Net (ops/pallas/linear_attention.py). Default (None) enables it
    on TPU backends; synthesis is inference-only so the kernel's
    reverse-mode-only custom_vjp is irrelevant here.

    ``noise``: optionally a pre-drawn standard-normal tensor
    [B, y_max_length, n_feats] used instead of drawing from ``key`` — lets
    a data-parallel caller draw one global noise tensor and shard it, so
    the same seed yields the same output at ANY mesh size (used by the
    shard_map path in cli/generate.py).
    """
    if fused_attention is None:
        from gradtts_tpu.ops.pallas.linear_attention import _on_tpu
        fused_attention = _on_tpu()
    mu_x, logw, x_mask, spk_vec = model.apply(
        params, x, x_lengths, spk, method=GradTTS.encode)

    w = jnp.exp(logw[..., 0]) * x_mask[..., 0]          # [B, Tx]
    w_ceil = jnp.ceil(w) * length_scale
    y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=1), 1.0)
    y_lengths = jnp.minimum(y_lengths, y_max_length).astype(jnp.int32)

    y_mask = sequence_mask(y_lengths, y_max_length)[..., None].astype(mu_x.dtype)
    attn_mask = x_mask[:, :, None, 0] * y_mask[:, None, :, 0]  # [B, Tx, Ty]
    attn = generate_path(w_ceil, attn_mask)                    # [B, Tx, Ty]

    mu_y = jnp.einsum('bxy,bxf->byf', attn, mu_x,
                      preferred_element_type=jnp.float32).astype(mu_x.dtype)

    key, z_key, s_key = jax.random.split(key, 3)
    if noise is None:
        noise = jax.random.normal(z_key, mu_y.shape, mu_y.dtype)
    z = mu_y + noise.astype(mu_y.dtype) / temperature

    def estimator_fn(x_t, mask2d, mu, t, s):
        return model.apply(params, x_t, mask2d, mu, t, s,
                           spk_is_embedded=True,
                           fused_attention=fused_attention,
                           method=GradTTS.estimate)

    if sampler == 'dpm':
        dec = reverse_diffusion_dpm(estimator_fn, z, y_mask, mu_y,
                                    n_timesteps, model.beta_min,
                                    model.beta_max, spk=spk_vec)
    else:
        dec = reverse_diffusion(estimator_fn, z, y_mask, mu_y, n_timesteps,
                                model.beta_min, model.beta_max, stoc=stoc,
                                spk=spk_vec, key=s_key)
    return SynthesisResult(mu_y * y_mask, dec * y_mask, attn, y_lengths, y_mask)


def _log_prior_grid(y, mu_x):
    """log N(y_frame; mu_token, I) for every (token, frame) pair as one
    matmul on the MXU (parity: tts.py:143-149). y: [B, Ty, F],
    mu_x: [B, Tx, F] -> [B, Tx, Ty]."""
    n_feats = y.shape[-1]
    const = -0.5 * math.log(2 * math.pi) * n_feats
    cross = jnp.einsum('bxf,byf->bxy', mu_x, y,
                       preferred_element_type=jnp.float32)
    y_sq = -0.5 * jnp.sum(y ** 2, axis=-1)        # [B, Ty]
    mu_sq = -0.5 * jnp.sum(mu_x ** 2, axis=-1)    # [B, Tx]
    return cross + y_sq[:, None, :] + mu_sq[:, :, None] + const


class LossResult(NamedTuple):
    dur_loss: jnp.ndarray
    prior_loss: jnp.ndarray
    diff_loss: jnp.ndarray
    attn: jnp.ndarray


def compute_loss(model: GradTTS, params, key, x, x_lengths, y, y_lengths,
                 spk=None, out_size: Optional[int] = None,
                 train: Optional[bool] = None, dropout_key=None,
                 remat: bool = False,
                 fused_attention: bool = False) -> LossResult:
    """Duration + prior + diffusion losses (parity: tts.py:110-194).

    The reference's per-item Python crop loop (tts.py:159-181) is replaced
    by a vmapped ``dynamic_slice`` so the whole step stays on device.
    ``train`` defaults to whether a dropout key was supplied.
    ``remat=True`` rematerializes the U-Net forward during the backward
    pass (``jax.checkpoint``): ~1/3 more estimator FLOPs for a large cut
    in activation HBM — lets batch or crop length grow past what stored
    activations would allow.
    """
    if train is None:
        train = dropout_key is not None
    rngs = {'dropout': dropout_key} if dropout_key is not None else {}
    mu_x, logw, x_mask, spk_vec = model.apply(
        params, x, x_lengths, spk, train=train, rngs=rngs,
        method=GradTTS.encode)
    y_max_length = y.shape[1]
    y_mask = sequence_mask(y_lengths, y_max_length)[..., None].astype(x_mask.dtype)
    attn_mask = x_mask[:, :, None, 0] * y_mask[:, None, :, 0]  # [B, Tx, Ty]

    log_prior = _log_prior_grid(y, mu_x)
    attn = jax.lax.stop_gradient(maximum_path(log_prior, attn_mask))

    logw_hat = jnp.log(1e-8 + jnp.sum(attn, axis=-1))[..., None] * x_mask
    dur = duration_loss(logw, logw_hat, x_lengths)

    if out_size is not None and out_size < y_max_length:
        key, off_key = jax.random.split(key)
        max_offset = jnp.maximum(y_lengths - out_size, 0)
        rand = jax.random.randint(off_key, (y.shape[0],), 0, 1 << 30)
        out_offset = jnp.where(max_offset > 0, rand % jnp.maximum(max_offset, 1), 0)

        def crop(y_i, attn_i, off):
            y_c = jax.lax.dynamic_slice_in_dim(y_i, off, out_size, axis=0)
            a_c = jax.lax.dynamic_slice_in_dim(attn_i, off, out_size, axis=1)
            return y_c, a_c

        y, attn = jax.vmap(crop)(y, attn, out_offset)
        y_cut_lengths = jnp.minimum(out_size, y_lengths)
        y_mask = sequence_mask(y_cut_lengths, out_size)[..., None].astype(y_mask.dtype)
        y = y * y_mask
        attn = attn * y_mask[:, None, :, 0]

    mu_y = jnp.einsum('bxy,bxf->byf', attn, mu_x,
                      preferred_element_type=jnp.float32).astype(mu_x.dtype)

    def estimator_fn(x_t, mask2d, mu, t, s):
        return model.apply(params, x_t, mask2d, mu, t, s,
                           spk_is_embedded=True,
                           fused_attention=fused_attention,
                           method=GradTTS.estimate)

    if remat:
        estimator_fn = jax.checkpoint(estimator_fn)

    key, diff_key = jax.random.split(key)
    diff, _, _ = diffusion_loss(estimator_fn, diff_key, y, y_mask, mu_y,
                                model.beta_min, model.beta_max, spk=spk_vec)

    prior = jnp.sum(0.5 * ((y - mu_y) ** 2 + math.log(2 * math.pi)) * y_mask)
    prior = prior / (jnp.sum(y_mask) * model.n_feats)

    return LossResult(dur, prior, diff, attn)


def get_score_fn(model: GradTTS, params, x, x_lengths, y, y_lengths, spk=None,
                 fused_attention=None):
    """Build a score closure for a (text hypothesis, real mel) pair
    (parity: tts.py:197-254). Returns (score_fn, mu_y, spk_vec, y_mask)
    where score_fn(x_t, t) evaluates the trained estimator conditioned on
    the MAS-aligned text prior.

    ``fused_attention`` defaults to ``'jvp'`` on TPU backends — the
    streaming Pallas attention with a ``custom_jvp`` rule, which the
    Hutchinson likelihood engine differentiates with ``jax.jvp``
    (the custom_vjp kernel can't serve forward mode; the jnp path pays
    ~8 full-size HBM tensors per drift eval). Pass ``False`` to force the
    jnp attention."""
    if fused_attention is None:
        from gradtts_tpu.ops.pallas.linear_attention import _on_tpu
        fused_attention = 'jvp' if _on_tpu() else False
    mu_x, logw, x_mask, spk_vec = model.apply(
        params, x, x_lengths, spk, method=GradTTS.encode)
    y_max_length = y.shape[1]
    y_mask = sequence_mask(y_lengths, y_max_length)[..., None].astype(x_mask.dtype)
    attn_mask = x_mask[:, :, None, 0] * y_mask[:, None, :, 0]
    log_prior = _log_prior_grid(y, mu_x)
    attn = jax.lax.stop_gradient(maximum_path(log_prior, attn_mask))
    mu_y = jnp.einsum('bxy,bxf->byf', attn, mu_x,
                      preferred_element_type=jnp.float32).astype(mu_x.dtype)

    def score_fn(x_t, t):
        return model.apply(params, x_t, y_mask[..., 0], mu_y, t, spk_vec,
                           spk_is_embedded=True,
                           fused_attention=fused_attention,
                           method=GradTTS.estimate)

    return score_fn, mu_y, spk_vec, y_mask
