"""Fused linear-attention (+ ReZero residual) Pallas TPU kernel.

The U-Net's attention (models/diffusion.py LinearAttention, parity with
reference diffusion.py:82-100) is softmax-kernel linear attention over all
(F, T) positions. The jnp path materializes q, k, and the exp'd k tensor in
HBM (each [B, F, T, heads*dim_head] — 1.5-2x wider than the activation),
making the op HBM-bound: ~4 full-size tensor round trips.

This kernel reduces that to: read x twice, write the output once.

  pass 1 (stats):  per batch, stream x tiles, project k = x Wk / v = x Wv
                   in VMEM, and accumulate the [H, H] context
                   sum_pos exp(k - m) v^T and the [H] denominator with a
                   flash-attention-style ONLINE max (running m, rescale by
                   exp(m_old - m_new) when it grows). Everything f32.
  (host jnp)       fold the per-head block-diagonal mask, the denominator,
                   the output projection Wout, and the ReZero gain g into
                   one tiny [H, C] matrix + [C] bias.
  pass 2 (apply):  stream x tiles again, q = x Wq, out = (q ctx') + bias
                   + x  (the ReZero residual add is free here).

Mathematically identical to the jnp path (same normalized-after-contraction
formulation); the kernel computes exp/denominators in f32 where the bf16
jnp path rounds the exp tensor, so agreement is within bf16 tolerance.

Differentiable via ``jax.custom_vjp`` (backward recomputes through the jnp
reference), which supports REVERSE mode only — the likelihood engine's
Hutchinson ``jax.jvp`` must use the jnp path. The estimator therefore only
enables this kernel when asked (synthesize() does; training/likelihood
don't) — see models/diffusion.py.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# x-tile VMEM budget. The dominant VMEM cost is NOT the x tile but the f32
# k/v/exp temporaries at width H=128: a C=64 bf16 tile of R rows costs
# 128R bytes while its temporaries cost 3*512R bytes + double-buffered IO;
# 512 KiB tiles (R=4096) keep the scoped total well under the 16 MB limit.
_TILE_LIMIT_BYTES = 512 * 1024

_NEG = -1e30

_warned_fallback = False


def _stats_kernel(x_ref, wk_ref, wv_ref, ctx_ref, den_ref,
                  m_ref, acc_ref, d_ref, *, n_total: int, n_tile: int,
                  phases: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        d_ref[...] = jnp.zeros_like(d_ref)

    x = x_ref[0]                                  # [Nt, phases*C]
    # phases == 2: wk/wv are host-built block-diagonal [2C, 2H], so k/v
    # columns are phase-blocked — each x row holds TWO real positions
    # (frequency-folded layout) and both project at full 128-lane fill.
    k = jnp.dot(x, wk_ref[...], preferred_element_type=jnp.float32)
    v = jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
    H = k.shape[-1] // phases

    pos = jax.lax.broadcasted_iota(jnp.int32, (k.shape[0], H), 0) \
        + t * n_tile
    valid = pos < n_total                         # [Nt, H]

    m_old = m_ref[0]                                         # [H]
    # per-phase halves (static 128-aligned lane slices); one shared online
    # max per real attention feature across all phases
    ks = [k[:, p * H:(p + 1) * H] for p in range(phases)]
    vs = [v[:, p * H:(p + 1) * H] for p in range(phases)]
    tile_max = jnp.max(jnp.where(valid, ks[0], _NEG), axis=0)
    for kp in ks[1:]:
        tile_max = jnp.maximum(
            tile_max, jnp.max(jnp.where(valid, kp, _NEG), axis=0))
    m_new = jnp.maximum(m_old, tile_max)
    alpha = jnp.exp(m_old - m_new)                           # [H]
    m_ref[0] = m_new

    d_new = d_ref[0] * alpha
    acc_new = acc_ref[...] * alpha[:, None]
    for kp, vp in zip(ks, vs):
        ek = jnp.where(valid, jnp.exp(kp - m_new[None, :]), 0.0)
        vp = jnp.where(valid, vp, 0.0)  # padded tail rows may be NaN
        d_new = d_new + jnp.sum(ek, axis=0)
        acc_new = acc_new + jax.lax.dot_general(
            ek, vp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [H, H]
    d_ref[0] = d_new
    acc_ref[...] = acc_new

    @pl.when(t == pl.num_programs(1) - 1)
    def _emit():
        ctx_ref[0] = acc_ref[...]
        den_ref[0] = d_ref[...]


def _apply_kernel(x_ref, wq_ref, ctx2_ref, bias_ref, out_ref):
    # phase handling is free here: wq and ctx2 arrive block-diagonal, so
    # o columns come out phase-blocked to match the folded x layout.
    x = x_ref[0]                                             # [Nt, C]
    q = jnp.dot(x, wq_ref[...], preferred_element_type=jnp.float32)
    o = jnp.dot(q.astype(x.dtype), ctx2_ref[0],
                preferred_element_type=jnp.float32)          # [Nt, C]
    o = o + bias_ref[...] + x.astype(jnp.float32)
    out_ref[0] = o.astype(out_ref.dtype)


def _pick_n_tile(N: int, C: int, dtype) -> int:
    bytes_per_row = C * np.dtype(dtype).itemsize
    max_n = max(1, _TILE_LIMIT_BYTES // bytes_per_row)
    align = 16 if np.dtype(dtype).itemsize == 2 else 8
    return max(align, (min(N, max_n) // align) * align)


@functools.lru_cache(maxsize=8)
def _head_blockdiag(hidden: int, dim_head: int):
    h = np.arange(hidden) // dim_head
    return (h[:, None] == h[None, :]).astype(np.float32)


def _blockdiag2(w):
    """[A, B] -> [[w, 0], [0, w]] of shape [2A, 2B]."""
    a, b = w.shape
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [jnp.concatenate([w, z], axis=1),
         jnp.concatenate([z, w], axis=1)], axis=0)


def _forward(x, w_q, w_k, w_v, w_out, b_out, g,
             dim_head: int, phases: int, interpret: bool):
    # phases == 2: x is frequency-folded [B, F/2, T, 2C] (channel order
    # (phase, c)); the projections are applied block-diagonally so each
    # row's two real positions project independently at full lane fill,
    # and the stats kernel folds the two phase blocks into one [H, H]
    # context. Mathematically identical to running unfolded — without the
    # lane-halving relayout an HLO-level reshape would cost.
    B, F, T, C = x.shape                       # C = phases * C_real
    H = w_q.shape[1]                           # per-phase hidden
    N = F * T
    xr = x.reshape(B, N, C)
    n_tile = _pick_n_tile(N, C, x.dtype)
    grid = (B, pl.cdiv(N, n_tile))

    if phases == 2:
        w_k_in, w_v_in = _blockdiag2(w_k), _blockdiag2(w_v)
    else:
        w_k_in, w_v_in = w_k, w_v

    ctx, den = pl.pallas_call(
        functools.partial(_stats_kernel, n_total=N, n_tile=n_tile,
                          phases=phases),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((C, phases * H), lambda b, t: (0, 0)),
            pl.BlockSpec((C, phases * H), lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, H, H), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, H), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, H), jnp.float32),    # running max
            pltpu.VMEM((H, H), jnp.float32),    # context accumulator
            pltpu.VMEM((1, H), jnp.float32),    # denominator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(xr, w_k_in.astype(x.dtype), w_v_in.astype(x.dtype))

    # tiny per-batch fold: blockdiag head mask, denominator, Wout, rezero g
    bd = jnp.asarray(_head_blockdiag(H, dim_head))
    ctx2 = (ctx * bd[None]) / den.reshape(B, 1, H).transpose(0, 2, 1)
    ctx2 = jnp.einsum('bde,ec->bdc', ctx2,
                      w_out.astype(jnp.float32)) * g        # [B, H, C_real]
    bias = (b_out.astype(jnp.float32) * g).reshape(1, -1)

    if phases == 2:
        w_q_in = _blockdiag2(w_q)
        ctx2 = jax.vmap(_blockdiag2)(ctx2)                  # [B, 2H, 2C_r]
        bias = jnp.tile(bias, (1, 2))
    else:
        w_q_in = w_q

    out = pl.pallas_call(
        _apply_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((C, phases * H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, phases * H, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(xr, w_q_in.astype(x.dtype), ctx2.astype(x.dtype), bias)
    return out.reshape(B, F, T, C)


def _reference(x, w_q, w_k, w_v, w_out, b_out, g, dim_head: int):
    """jnp twin (the custom-VJP backward's recompute base); mirrors the
    LinearAttention module math with the out-projection and rezero folded."""
    B, F, T, C = x.shape
    H = w_q.shape[1]
    dt = x.dtype
    q = jnp.einsum('bftc,cd->bftd', x, w_q.astype(dt))
    k = jnp.einsum('bftc,cd->bftd', x, w_k.astype(dt)).astype(jnp.float32)
    v = jnp.einsum('bftc,cd->bftd', x, w_v.astype(dt))
    m = jax.lax.stop_gradient(jnp.max(k, axis=(1, 2), keepdims=True))
    ek = jnp.exp(k - m)
    den = jnp.sum(ek, axis=(1, 2))
    ctx = jnp.einsum('bftd,bfte->bde', ek.astype(dt), v,
                     preferred_element_type=jnp.float32)
    bd = jnp.asarray(_head_blockdiag(H, dim_head))
    ctx = ctx * bd[None] / den[:, :, None]
    out = jnp.einsum('bde,bftd->bfte', ctx.astype(dt), q,
                     preferred_element_type=jnp.float32)
    y = jnp.einsum('bfte,ec->bftc', out.astype(dt), w_out.astype(dt),
                   preferred_element_type=jnp.float32)
    y = (y + b_out.astype(jnp.float32)) * g + x.astype(jnp.float32)
    return y.astype(dt)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ('tpu', 'axon')
    except Exception:
        return False


def _reference_phased(x, w_q, w_k, w_v, w_out, b_out, g, dim_head, phases):
    if phases == 1:
        return _reference(x, w_q, w_k, w_v, w_out, b_out, g, dim_head)
    # folded input: a contiguous reshape re-labels the phase dim as extra
    # positions (linear attention is position-permutation-invariant)
    b, f, t, c = x.shape
    xr = x.reshape(b, f, phases * t, c // phases)
    y = _reference(xr, w_q, w_k, w_v, w_out, b_out, g, dim_head)
    return y.reshape(b, f, t, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_linear_attention_rezero(x, w_q, w_k, w_v, w_out, b_out, g,
                                  dim_head: int = 32, phases: int = 1):
    """x: [B, F, T, C]; w_q/w_k/w_v: [C/phases, H]; w_out: [H, C/phases];
    b_out: [C/phases]; g: ReZero gain scalar (shape [1] or scalar). Returns
    ``linear_attention(x) @ w_out + b_out) * g + x``.

    ``phases=2``: x is frequency-folded (channel order (phase, c)) and the
    kernel runs phase-natively — no lane-halving reshape at the HLO level.

    Reverse-mode differentiable only (custom_vjp recomputes through the jnp
    reference); callers needing jax.jvp must use the module's jnp path.
    """
    g = jnp.asarray(g, jnp.float32).reshape(())
    try:
        return _forward(x, w_q, w_k, w_v, w_out, b_out, g, dim_head,
                        phases, interpret=not _on_tpu())
    except (NotImplementedError, ValueError) as e:
        # Only unsupported-backend trace-time failures fall back (Pallas
        # raises NotImplementedError/ValueError when the platform or a
        # BlockSpec isn't lowerable). Genuine kernel bugs — including
        # compile-time Mosaic failures, which surface later and never hit
        # this handler — propagate. The fallback warns once so silent
        # performance regressions are visible.
        global _warned_fallback
        if not _warned_fallback:
            _warned_fallback = True
            import warnings
            warnings.warn(
                'fused_linear_attention_rezero: Pallas path unavailable '
                f'({type(e).__name__}: {e}); using the jnp reference path',
                RuntimeWarning)
        return _reference_phased(x, w_q, w_k, w_v, w_out, b_out, g,
                                 dim_head, phases)


def _fwd(x, w_q, w_k, w_v, w_out, b_out, g, dim_head, phases):
    out = fused_linear_attention_rezero(x, w_q, w_k, w_v, w_out, b_out, g,
                                        dim_head, phases)
    return out, (x, w_q, w_k, w_v, w_out, b_out, g)


def _bwd(dim_head, phases, residuals, dy):
    x, w_q, w_k, w_v, w_out, b_out, g = residuals
    _, vjp = jax.vjp(
        lambda *a: _reference_phased(*a, dim_head=dim_head, phases=phases),
        x, w_q, w_k, w_v, w_out, b_out,
        jnp.asarray(g, jnp.float32).reshape(()))
    grads = vjp(dy)
    return grads[:6] + (grads[6].reshape(jnp.shape(g)),)


fused_linear_attention_rezero.defvjp(_fwd, _bwd)
