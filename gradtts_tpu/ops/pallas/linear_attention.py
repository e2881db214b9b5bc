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

Differentiable via ``jax.custom_vjp`` with a REAL streaming backward
(round 4): two more sweeps over (x, dy) plus O(H^2) host algebra — see
the backward section below — so training benefits too (measured 17.6 ->
17.0 ms full train step at B16 on v5e; round 3's recompute-the-jnp-
forward backward was net-negative). This entry point is reverse-mode
only; forward-mode callers (the likelihood engine's Hutchinson
``jax.jvp``) use the round-5 ``custom_jvp`` twin
:func:`fused_linear_attention_rezero_jvp` below (a function can carry
only one custom AD rule). synthesize()/make_train_step enable the vjp
kernel on TPU; get_score_fn enables the jvp twin.
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


def _stats_kernel(x_ref, wk_ref, wv_ref, ctx_ref, den_ref, mout_ref,
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
        mout_ref[0] = m_ref[...]


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

    ctx, den, m = pl.pallas_call(
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
            pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, H), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
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
    return out.reshape(B, F, T, C), ctx, den, m


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
                        phases, interpret=not _on_tpu())[0]
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


# --- streaming Pallas backward ---------------------------------------------
#
# With y = q A + g b_out + x (q = x Wq, A = ctx2n Wout g per batch) and the
# saved forward statistics (ctx, den, m), the whole VJP needs only two more
# streaming sweeps over (x, dy) plus O(H^2) host algebra — no q/k/v/exp(k)
# tensor is ever materialized in HBM (the old backward recomputed the jnp
# forward, costing ~10 full-tensor round trips):
#
#   sweep 1: dA_b     = sum_p q_p^T dy_p          (per batch)
#            dWq     += x^T (g dy A_pre^T)        (global)
#            db, dg  += column sums of dy, dy*(q A_pre + b_out)
#   host:    dWout, dctx, dden from dA_b, ctx, den (tiny matrices)
#   sweep 2: ek = exp(x Wk - m);  dek = v dctx^T + dden;  dk = ek*dek
#            dv = ek dctx;  dx = dy + dq Wq^T + dk Wk^T + dv Wv^T
#            dWk += x^T dk;  dWv += x^T dv
#
# m is stop-gradient (parity with the module, models/diffusion.py:386).
# phases == 2 works exactly like the forward: block-diagonal weight/context
# matrices keep both folded positions per row at full lane fill; the
# logical grads are the sums of the per-phase diagonal blocks.

_BWD_TILE_LIMIT_BYTES = 512 * 1024


def _bwd_sweep1_kernel(x_ref, dy_ref, wq_ref, afullt_ref, apre_ref,
                       bout_ref, da_ref, dwq_ref, db_ref, dgv_ref,
                       da_acc, dwq_acc, db_acc, dgv_acc,
                       *, n_total: int, n_tile: int):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init_batch():
        da_acc[...] = jnp.zeros_like(da_acc)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _init_global():
        dwq_acc[...] = jnp.zeros_like(dwq_acc)
        db_acc[...] = jnp.zeros_like(db_acc)
        dgv_acc[...] = jnp.zeros_like(dgv_acc)

    rows = jax.lax.broadcasted_iota(
        jnp.int32, (n_tile, 1), 0) + t * n_tile
    valid = rows < n_total
    x = jnp.where(valid, x_ref[0], 0)                       # [Nt, C]
    dy = jnp.where(valid, dy_ref[0], 0).astype(jnp.float32)

    q = jnp.dot(x, wq_ref[...],
                preferred_element_type=jnp.float32)         # [Nt, PH]
    da_acc[...] += jax.lax.dot_general(
        q, dy, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [PH, C]
    o_pre = jnp.dot(q.astype(x.dtype), apre_ref[0],
                    preferred_element_type=jnp.float32)     # [Nt, C]
    dgv_acc[...] += jnp.sum(dy * (o_pre + bout_ref[...]),
                            axis=0, keepdims=True)
    db_acc[...] += jnp.sum(dy, axis=0, keepdims=True)
    dq = jnp.dot(dy.astype(x.dtype), afullt_ref[0],
                 preferred_element_type=jnp.float32)        # [Nt, PH]
    dwq_acc[...] += jax.lax.dot_general(
        x, dq.astype(x.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [C, PH]

    @pl.when(t == pl.num_programs(1) - 1)
    def _emit_batch():
        da_ref[0] = da_acc[...]

    @pl.when(jnp.logical_and(b == pl.num_programs(0) - 1,
                             t == pl.num_programs(1) - 1))
    def _emit_global():
        dwq_ref[...] = dwq_acc[...]
        db_ref[...] = db_acc[...]
        dgv_ref[...] = dgv_acc[...]


def _bwd_sweep2_kernel(x_ref, dy_ref, wk_ref, wv_ref, afullt_ref, wqt_ref,
                       wkt_ref, wvt_ref, m_ref, dctxt_ref, dctx_ref,
                       dden_ref, dx_ref, dwk_ref, dwv_ref,
                       dwk_acc, dwv_acc, *, n_total: int, n_tile: int):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _init_global():
        dwk_acc[...] = jnp.zeros_like(dwk_acc)
        dwv_acc[...] = jnp.zeros_like(dwv_acc)

    rows = jax.lax.broadcasted_iota(
        jnp.int32, (n_tile, 1), 0) + t * n_tile
    valid = rows < n_total
    x = jnp.where(valid, x_ref[0], 0)                       # [Nt, C]
    dy = jnp.where(valid, dy_ref[0], 0)

    k = jnp.dot(x, wk_ref[...],
                preferred_element_type=jnp.float32)         # [Nt, PH]
    ek = jnp.where(valid, jnp.exp(k - m_ref[0]), 0.0)
    v = jnp.dot(x, wv_ref[...],
                preferred_element_type=jnp.float32)
    dek = jnp.dot(v.astype(x.dtype), dctxt_ref[0],
                  preferred_element_type=jnp.float32) + dden_ref[0]
    dk = (ek * dek).astype(x.dtype)                          # [Nt, PH]
    dv = jnp.dot(ek.astype(x.dtype), dctx_ref[0],
                 preferred_element_type=jnp.float32).astype(x.dtype)
    dq = jnp.dot(dy, afullt_ref[0],
                 preferred_element_type=jnp.float32).astype(x.dtype)

    dx = dy.astype(jnp.float32)
    dx = dx + jnp.dot(dq, wqt_ref[...],
                      preferred_element_type=jnp.float32)
    dx = dx + jnp.dot(dk, wkt_ref[...],
                      preferred_element_type=jnp.float32)
    dx = dx + jnp.dot(dv, wvt_ref[...],
                      preferred_element_type=jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    dwk_acc[...] += jax.lax.dot_general(
        x, dk, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [C, PH]
    dwv_acc[...] += jax.lax.dot_general(
        x, dv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(b == pl.num_programs(0) - 1,
                             t == pl.num_programs(1) - 1))
    def _emit_global():
        dwk_ref[...] = dwk_acc[...]
        dwv_ref[...] = dwv_acc[...]


def _sum_phase_blocks(mat, phases, rows, cols):
    """[phases*rows, phases*cols] -> [rows, cols] summing diagonal blocks
    (grad of a block-diagonal weight replication)."""
    if phases == 1:
        return mat
    return sum(mat[p * rows:(p + 1) * rows, p * cols:(p + 1) * cols]
               for p in range(phases))


def _backward_pallas(x, w_q, w_k, w_v, w_out, b_out, g, ctx, den, m, dy,
                     dim_head: int, phases: int, interpret: bool):
    B, F, T, C = x.shape
    H = w_q.shape[1]
    PH = phases * H
    C_real = C // phases
    N = F * T
    xr = x.reshape(B, N, C)
    dyr = dy.reshape(B, N, C)
    bytes_per_row = 2 * C * np.dtype(x.dtype).itemsize
    n_tile = max(16, min(N, _BWD_TILE_LIMIT_BYTES // bytes_per_row)
                 // 16 * 16)
    grid = (B, pl.cdiv(N, n_tile))
    dt = x.dtype

    bd = jnp.asarray(_head_blockdiag(H, dim_head))
    denb = den.reshape(B, H)                                  # per d
    ctx2n = ctx * bd[None] / denb[:, :, None]                 # [B, H, H]
    w_out32 = w_out.astype(jnp.float32)
    a_pre = jnp.einsum('bde,ec->bdc', ctx2n, w_out32)         # [B, H, Cr]
    a_full = a_pre * g

    if phases == 2:
        a_pre_in = jax.vmap(_blockdiag2)(a_pre)               # [B, PH, C]
        a_full_t = jax.vmap(_blockdiag2)(a_full).transpose(0, 2, 1)
        bout_in = jnp.tile(b_out.astype(jnp.float32).reshape(1, -1),
                           (1, 2))
        m_in = jnp.tile(m, (1, 1, 2))                         # [B, 1, PH]
        wq_in, wk_in, wv_in = (_blockdiag2(w) for w in (w_q, w_k, w_v))
    else:
        a_pre_in = a_pre
        a_full_t = a_full.transpose(0, 2, 1)
        bout_in = b_out.astype(jnp.float32).reshape(1, -1)
        m_in = m
        wq_in, wk_in, wv_in = w_q, w_k, w_v

    da, dwq_blk, db_blk, dgv = pl.pallas_call(
        functools.partial(_bwd_sweep1_kernel, n_total=N, n_tile=n_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((C, PH), lambda b, t: (0, 0)),
            pl.BlockSpec((1, C, PH), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, PH, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, PH, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((C, PH), lambda b, t: (0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, PH, C), jnp.float32),
            jax.ShapeDtypeStruct((C, PH), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((PH, C), jnp.float32),
            pltpu.VMEM((C, PH), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(xr, dyr, wq_in.astype(dt), a_full_t.astype(dt),
      a_pre_in.astype(dt), bout_in)

    # --- tiny host algebra: dWout / dctx / dden from dA ---
    # logical dA (grad wrt A_full = a_pre*g): sum the per-phase blocks
    if phases == 2:
        da_l = (da[:, :H, :C_real] + da[:, H:, C_real:])      # [B, H, Cr]
    else:
        da_l = da
    dwout = jnp.einsum('bde,bdc->ec', ctx2n, da_l) * g        # [H, Cr]
    dctx2n = jnp.einsum('bdc,ec->bde', da_l, w_out32) * g     # [B, H, H]
    dctx_l = dctx2n * bd[None] / denb[:, :, None]
    dden_l = -jnp.sum(dctx2n * ctx * bd[None], axis=2) \
        / (denb * denb)                                       # [B, H]
    dg = jnp.sum(dgv)
    db_out = (jnp.sum(db_blk.reshape(phases, C_real), axis=0) * g
              ).astype(jnp.float32)

    if phases == 2:
        dctx_in = jax.vmap(_blockdiag2)(dctx_l)               # [B, PH, PH]
        dctxt_in = jax.vmap(_blockdiag2)(
            dctx_l.transpose(0, 2, 1))
        dden_in = jnp.tile(dden_l.reshape(B, 1, H), (1, 1, 2))
    else:
        dctx_in = dctx_l
        dctxt_in = dctx_l.transpose(0, 2, 1)
        dden_in = dden_l.reshape(B, 1, H)

    dxr, dwk_blk, dwv_blk = pl.pallas_call(
        functools.partial(_bwd_sweep2_kernel, n_total=N, n_tile=n_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((C, PH), lambda b, t: (0, 0)),
            pl.BlockSpec((C, PH), lambda b, t: (0, 0)),
            pl.BlockSpec((1, C, PH), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((PH, C), lambda b, t: (0, 0)),
            pl.BlockSpec((PH, C), lambda b, t: (0, 0)),
            pl.BlockSpec((PH, C), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 1, PH), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, PH, PH), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, PH, PH), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, PH), lambda b, t: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((C, PH), lambda b, t: (0, 0)),
            pl.BlockSpec((C, PH), lambda b, t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), dt),
            jax.ShapeDtypeStruct((C, PH), jnp.float32),
            jax.ShapeDtypeStruct((C, PH), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, PH), jnp.float32),
            pltpu.VMEM((C, PH), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(xr, dyr, wk_in.astype(dt), wv_in.astype(dt),
      a_full_t.astype(dt), wq_in.T.astype(dt), wk_in.T.astype(dt),
      wv_in.T.astype(dt), m_in, dctxt_in.astype(dt),
      dctx_in.astype(dt), dden_in)

    dwq = _sum_phase_blocks(dwq_blk, phases, C_real, H)
    dwk = _sum_phase_blocks(dwk_blk, phases, C_real, H)
    dwv = _sum_phase_blocks(dwv_blk, phases, C_real, H)
    dx = dxr.reshape(B, F, T, C)
    return (dx, dwq.astype(w_q.dtype), dwk.astype(w_k.dtype),
            dwv.astype(w_v.dtype), dwout.astype(w_out.dtype),
            db_out.astype(b_out.dtype), dg)


def _fwd(x, w_q, w_k, w_v, w_out, b_out, g, dim_head, phases):
    gg = jnp.asarray(g, jnp.float32).reshape(())
    try:
        out, ctx, den, m = _forward(x, w_q, w_k, w_v, w_out, b_out, gg,
                                    dim_head, phases,
                                    interpret=not _on_tpu())
        return out, (x, w_q, w_k, w_v, w_out, b_out, g, ctx, den, m)
    except (NotImplementedError, ValueError):
        out = _reference_phased(x, w_q, w_k, w_v, w_out, b_out, gg,
                                dim_head, phases)
        return out, (x, w_q, w_k, w_v, w_out, b_out, g, None, None, None)


def _bwd(dim_head, phases, residuals, dy):
    x, w_q, w_k, w_v, w_out, b_out, g, ctx, den, m = residuals
    if ctx is not None:
        try:
            grads = _backward_pallas(
                x, w_q, w_k, w_v, w_out, b_out,
                jnp.asarray(g, jnp.float32).reshape(()), ctx, den, m, dy,
                dim_head, phases, interpret=not _on_tpu())
            return grads[:6] + (grads[6].reshape(jnp.shape(g)),)
        except (NotImplementedError, ValueError):
            pass
    _, vjp = jax.vjp(
        lambda *a: _reference_phased(*a, dim_head=dim_head, phases=phases),
        x, w_q, w_k, w_v, w_out, b_out,
        jnp.asarray(g, jnp.float32).reshape(()))
    grads = vjp(dy)
    return grads[:6] + (grads[6].reshape(jnp.shape(g)),)


fused_linear_attention_rezero.defvjp(_fwd, _bwd)


# --- streaming custom_jvp entry point (round 5) ----------------------------
#
# The Hutchinson likelihood engine (likelihood/ode.py:59) differentiates the
# drift with ``jax.jvp``; a function carries only ONE custom rule, so the
# custom_vjp entry above can't serve it and the engine used to fall back to
# the jnp attention — paying its q/k/exp(k) HBM tensors on the fork's novel
# workload (config 5, the worst roofline row in PERFORMANCE.md). This entry
# point computes (y, dy) with the SAME streaming structure as the forward:
#
#   sweep 1 (stats):   stream (x, dx) tiles; k/v and their tangents
#                      dk = dx Wk + x dWk (three small matmuls — cheaper
#                      than one stacked double-width one) feed ONE shared
#                      online max; accumulate ctx/den AND their tangents
#                      dctx = sum dek v^T + ek dv^T, dden = sum dek
#                      (dek = ek * dk since m is stop-gradient).
#   (host jnp)         fold primal A = (ctx o BD / den) Wout g and its
#                      tangent dA (quotient rule on den, product rule on
#                      Wout/g) into per-batch [H, C] matrices + biases.
#   sweep 2 (apply):   stream (x, dx) again; y = q A + bias + x and
#                      dy = q dA + dq A + dbias + dx with dq = dx Wq + x dWq.
#
# HBM traffic: two reads of (x, dx) + one write of (y, dy) — the jnp path's
# jvp materializes q/k/v/exp(k) AND their tangents (~8 full-size tensors).
# Weight tangents are supported exactly (the Hutchinson probe sends zeros,
# but custom_jvp instantiates them — the extra matmuls are depth-C/H and
# negligible).


def _jvp_stats_kernel(x_ref, dx_ref, wk_ref, dwk_ref, wv_ref, dwv_ref,
                      ctx_ref, den_ref, mout_ref, dctx_ref, dden_ref,
                      m_scr, acc_scr, d_scr, dacc_scr, dd_scr,
                      *, n_total: int, n_tile: int, phases: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        d_scr[...] = jnp.zeros_like(d_scr)
        dacc_scr[...] = jnp.zeros_like(dacc_scr)
        dd_scr[...] = jnp.zeros_like(dd_scr)

    x = x_ref[0]                                   # [Nt, phases*C]
    dx = dx_ref[0]
    k = jnp.dot(x, wk_ref[...], preferred_element_type=jnp.float32)
    dk = (jnp.dot(x, dwk_ref[...], preferred_element_type=jnp.float32)
          + jnp.dot(dx, wk_ref[...], preferred_element_type=jnp.float32))
    v = jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
    dv = (jnp.dot(x, dwv_ref[...], preferred_element_type=jnp.float32)
          + jnp.dot(dx, wv_ref[...], preferred_element_type=jnp.float32))
    H = k.shape[-1] // phases

    pos = jax.lax.broadcasted_iota(jnp.int32, (k.shape[0], H), 0) \
        + t * n_tile
    valid = pos < n_total                          # [Nt, H]

    m_old = m_scr[0]
    ks = [k[:, p * H:(p + 1) * H] for p in range(phases)]
    tile_max = jnp.max(jnp.where(valid, ks[0], _NEG), axis=0)
    for kp in ks[1:]:
        tile_max = jnp.maximum(
            tile_max, jnp.max(jnp.where(valid, kp, _NEG), axis=0))
    m_new = jnp.maximum(m_old, tile_max)
    alpha = jnp.exp(m_old - m_new)                 # [H]
    m_scr[0] = m_new

    d_new = d_scr[0] * alpha
    acc_new = acc_scr[...] * alpha[:, None]
    dd_new = dd_scr[0] * alpha
    dacc_new = dacc_scr[...] * alpha[:, None]
    for p in range(phases):
        sl = slice(p * H, (p + 1) * H)
        ek = jnp.where(valid, jnp.exp(ks[p] - m_new[None, :]), 0.0)
        dek = jnp.where(valid, ek * dk[:, sl], 0.0)  # m stop-grad
        vp = jnp.where(valid, v[:, sl], 0.0)       # padded rows may be NaN
        dvp = jnp.where(valid, dv[:, sl], 0.0)
        d_new = d_new + jnp.sum(ek, axis=0)
        dd_new = dd_new + jnp.sum(dek, axis=0)
        acc_new = acc_new + jax.lax.dot_general(
            ek, vp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [H, H]
        dacc_new = dacc_new + jax.lax.dot_general(
            dek, vp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dacc_new = dacc_new + jax.lax.dot_general(
            ek, dvp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    d_scr[0] = d_new
    acc_scr[...] = acc_new
    dd_scr[0] = dd_new
    dacc_scr[...] = dacc_new

    @pl.when(t == pl.num_programs(1) - 1)
    def _emit():
        ctx_ref[0] = acc_scr[...]
        den_ref[0] = d_scr[...]
        mout_ref[0] = m_scr[...]
        dctx_ref[0] = dacc_scr[...]
        dden_ref[0] = dd_scr[...]


def _jvp_apply_kernel(x_ref, dx_ref, wq_ref, dwq_ref, a_ref, da_ref,
                      bias_ref, dbias_ref, y_ref, dy_ref):
    x = x_ref[0]                                   # [Nt, C]
    dx = dx_ref[0]
    q = jnp.dot(x, wq_ref[...], preferred_element_type=jnp.float32)
    dq = (jnp.dot(x, dwq_ref[...], preferred_element_type=jnp.float32)
          + jnp.dot(dx, wq_ref[...], preferred_element_type=jnp.float32))
    qc = q.astype(x.dtype)
    dqc = dq.astype(x.dtype)
    y = jnp.dot(qc, a_ref[0], preferred_element_type=jnp.float32)
    y = y + bias_ref[...] + x.astype(jnp.float32)
    dy = (jnp.dot(qc, da_ref[0], preferred_element_type=jnp.float32)
          + jnp.dot(dqc, a_ref[0], preferred_element_type=jnp.float32))
    dy = dy + dbias_ref[...] + dx.astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)
    dy_ref[0] = dy.astype(dy_ref.dtype)


def _jvp_pallas(x, dx, w_q, dwq, w_k, dwk, w_v, dwv, w_out, dwout,
                b_out, dbout, g, dg, dim_head: int, phases: int,
                interpret: bool):
    B, F, T, C = x.shape                           # C = phases * C_real
    H = w_q.shape[1]
    PH = phases * H
    C_real = C // phases
    N = F * T
    xr = x.reshape(B, N, C)
    dxr = dx.reshape(B, N, C)
    # sweeps read (x, dx): halve the per-row budget vs the forward
    n_tile = _pick_n_tile(N, 2 * C, x.dtype)
    grid = (B, pl.cdiv(N, n_tile))
    dt = x.dtype

    if phases == 2:
        wk_in, dwk_in = _blockdiag2(w_k), _blockdiag2(dwk)
        wv_in, dwv_in = _blockdiag2(w_v), _blockdiag2(dwv)
    else:
        wk_in, dwk_in, wv_in, dwv_in = w_k, dwk, w_v, dwv

    wspec = pl.BlockSpec((C, PH), lambda b, t: (0, 0))
    ctx, den, m, dctx, dden = pl.pallas_call(
        functools.partial(_jvp_stats_kernel, n_total=N, n_tile=n_tile,
                          phases=phases),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
            wspec, wspec, wspec, wspec,
        ],
        out_specs=[
            pl.BlockSpec((1, H, H), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, H, H), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, H), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H, H), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, H), jnp.float32),       # running max
            pltpu.VMEM((H, H), jnp.float32),       # ctx accumulator
            pltpu.VMEM((1, H), jnp.float32),       # denominator
            pltpu.VMEM((H, H), jnp.float32),       # tangent ctx
            pltpu.VMEM((1, H), jnp.float32),       # tangent denominator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(xr, dxr, wk_in.astype(dt), dwk_in.astype(dt), wv_in.astype(dt),
      dwv_in.astype(dt))

    # host fold: primal A exactly as the forward; tangent by quotient/
    # product rules (m is stop-gradient so it contributes nothing)
    bd = jnp.asarray(_head_blockdiag(H, dim_head))
    denb = den.reshape(B, H)
    ddenb = dden.reshape(B, H)
    ctx2n = (ctx * bd[None]) / denb[:, :, None]                  # [B, H, H]
    dctx2n = ((dctx * bd[None]) / denb[:, :, None]
              - ctx2n * (ddenb / denb)[:, :, None])
    w_out32 = w_out.astype(jnp.float32)
    dwout32 = dwout.astype(jnp.float32)
    a_pre = jnp.einsum('bde,ec->bdc', ctx2n, w_out32)            # [B, H, Cr]
    da_pre = (jnp.einsum('bde,ec->bdc', dctx2n, w_out32)
              + jnp.einsum('bde,ec->bdc', ctx2n, dwout32))
    a_full = a_pre * g
    da_full = da_pre * g + a_pre * dg
    bias = (b_out.astype(jnp.float32) * g).reshape(1, -1)
    dbias = (dbout.astype(jnp.float32) * g
             + b_out.astype(jnp.float32) * dg).reshape(1, -1)

    if phases == 2:
        wq_in, dwq_in = _blockdiag2(w_q), _blockdiag2(dwq)
        a_in = jax.vmap(_blockdiag2)(a_full)                     # [B, PH, C]
        da_in = jax.vmap(_blockdiag2)(da_full)
        bias = jnp.tile(bias, (1, 2))
        dbias = jnp.tile(dbias, (1, 2))
    else:
        wq_in, dwq_in, a_in, da_in = w_q, dwq, a_full, da_full

    y, dy = pl.pallas_call(
        _jvp_apply_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
            wspec, wspec,
            pl.BlockSpec((1, PH, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, PH, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, n_tile, C), lambda b, t: (b, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), dt),
            jax.ShapeDtypeStruct((B, N, C), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(xr, dxr, wq_in.astype(dt), dwq_in.astype(dt), a_in.astype(dt),
      da_in.astype(dt), bias, dbias)
    return y.reshape(B, F, T, C), dy.reshape(B, F, T, C)


@functools.partial(jax.custom_jvp, nondiff_argnums=(7, 8))
def fused_linear_attention_rezero_jvp(x, w_q, w_k, w_v, w_out, b_out, g,
                                      dim_head: int = 32, phases: int = 1):
    """Forward-mode twin of :func:`fused_linear_attention_rezero`.

    Same primal (identical streaming forward), but carries a
    ``jax.custom_jvp`` rule instead of the custom_vjp — for callers that
    need forward-mode AD through the attention, i.e. the Hutchinson
    likelihood engine (likelihood/ode.py:59). The tangent is computed by
    two streaming sweeps over (x, dx) — see the section comment above.
    NOT reverse-mode differentiable; training uses the custom_vjp entry.
    """
    g = jnp.asarray(g, jnp.float32).reshape(())
    try:
        return _forward(x, w_q, w_k, w_v, w_out, b_out, g, dim_head,
                        phases, interpret=not _on_tpu())[0]
    except (NotImplementedError, ValueError) as e:
        global _warned_fallback
        if not _warned_fallback:
            _warned_fallback = True
            import warnings
            warnings.warn(
                'fused_linear_attention_rezero_jvp: Pallas path unavailable '
                f'({type(e).__name__}: {e}); using the jnp reference path',
                RuntimeWarning)
        return _reference_phased(x, w_q, w_k, w_v, w_out, b_out, g,
                                 dim_head, phases)


@fused_linear_attention_rezero_jvp.defjvp
def _fla_jvp(dim_head, phases, primals, tangents):
    x, w_q, w_k, w_v, w_out, b_out, g = primals
    dx, dwq, dwk, dwv, dwout, dbout, dg = tangents
    g32 = jnp.asarray(g, jnp.float32).reshape(())
    dg32 = jnp.asarray(dg, jnp.float32).reshape(())
    try:
        return _jvp_pallas(x, dx, w_q, dwq, w_k, dwk, w_v, dwv,
                           w_out, dwout, b_out, dbout, g32, dg32,
                           dim_head, phases, interpret=not _on_tpu())
    except (NotImplementedError, ValueError):
        return jax.jvp(
            lambda *a: _reference_phased(*a, dim_head=dim_head,
                                         phases=phases),
            (x, w_q, w_k, w_v, w_out, b_out, g32),
            (dx, dwq.astype(w_q.dtype), dwk.astype(w_k.dtype),
             dwv.astype(w_v.dtype), dwout.astype(w_out.dtype),
             dbout.astype(b_out.dtype), dg32))
