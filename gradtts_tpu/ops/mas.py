"""Monotonic Alignment Search as an on-device ``lax.scan`` dynamic program.

The reference implements MAS as a Cython/OpenMP extension and round-trips
every batch GPU->CPU->numpy->GPU per training step
(/root/reference/model/monotonic_align/__init__.py:8-23, core.pyx:9-45).
Here the Viterbi-style DP runs entirely on the TPU inside jit: the forward
pass is a scan over mel frames with the whole text axis vectorized on the
VPU, the backtrace is a reverse scan emitting one text index per frame, and
the batch is handled by ``vmap``. No host sync, no dynamic shapes.

A bit-identical native C++/OpenMP implementation lives in
``gradtts_tpu/ops/native`` as the CPU reference / parity oracle (mirroring
the role of the reference's native component).

Recurrence (equivalent to core.pyx:17-30):
    value[x, y] += max(value[x, y-1] if x < y else -inf,
                       value[x-1, y-1] if x > 0 else (0 if y == 0 else -inf))
restricted to the feasible band  max(0, t_x + y - t_y) <= x < min(t_x, y+1);
then backtrace from (t_x-1, t_y-1) picking x-1 whenever
    x == y  or  value[x, y-1] < value[x-1, y-1]      (core.pyx:32-35)
"""

import functools

import jax
import jax.numpy as jnp

MAX_NEG = -1e9


def _forward_dp(value, t_x, t_y):
    """Run the in-band DP; returns the accumulated value matrix [Tx, Ty]."""
    tx_max, ty_max = value.shape
    xs_idx = jnp.arange(tx_max)

    def step(prev_col, inputs):
        y, raw_col = inputs
        # v_cur: stay on the same text token (invalid on the diagonal x == y)
        v_cur = jnp.where(xs_idx == y, MAX_NEG, prev_col)
        # v_prev: advance from token x-1; at x == 0 only valid when y == 0
        head = jnp.where(y == 0, 0.0, MAX_NEG)
        v_prev = jnp.concatenate([jnp.array([head], dtype=value.dtype),
                                  prev_col[:-1]])
        lo = jnp.maximum(0, t_x + y - t_y)
        hi = jnp.minimum(t_x, y + 1)
        band = (xs_idx >= lo) & (xs_idx < hi)
        new_col = jnp.where(band, jnp.maximum(v_cur, v_prev) + raw_col, raw_col)
        return new_col, new_col

    init = jnp.full((tx_max,), MAX_NEG, dtype=value.dtype)
    # unroll: each iteration is tiny vector work over [Tx]; on TPU the
    # sequential loop overhead dominates, so fewer, fatter iterations win
    _, cols = jax.lax.scan(step, init, (jnp.arange(ty_max), value.T),
                           unroll=8)
    return cols.T  # [Tx, Ty]


def _backtrace(v_acc, t_x, t_y):
    """Reverse scan emitting the chosen text index per mel frame.

    The move decision ``x == y or V[x, y-1] < V[x-1, y-1]`` depends only on
    (x, y), so the whole decision matrix is precomputed vectorized and the
    sequential part is just one boolean gather per frame."""
    tx_max, ty_max = v_acc.shape
    xs = jnp.arange(tx_max)[:, None]
    ys_full = jnp.arange(ty_max)[None, :]
    v_here = jnp.roll(v_acc, 1, axis=1)              # V[x, y-1]
    v_diag = jnp.roll(v_acc, (1, 1), axis=(0, 1))    # V[x-1, y-1]
    move_m = (xs != 0) & ((xs == ys_full) | (v_here < v_diag))  # [Tx, Ty]

    ys = jnp.arange(ty_max - 1, -1, -1)
    move_rows = move_m.T[::-1]                       # [Ty, Tx], y desc

    def step(index, inputs):
        y, move_row = inputs
        active = y < t_y
        emit = jnp.where(active, index, -1)
        move = jnp.take(move_row, index)
        index = jnp.where(active & move, index - 1, index)
        return index, emit

    _, emitted = jax.lax.scan(step, t_x - 1, (ys, move_rows), unroll=8)
    # emitted is ordered y = Ty-1 .. 0; flip back to ascending y
    return emitted[::-1]  # [Ty], -1 where y >= t_y


@functools.partial(jax.jit, static_argnames=())
def maximum_path(value, mask):
    """Batched monotonic alignment search.

    Args:
      value: [B, Tx, Ty] log-prior grid.
      mask: [B, Tx, Ty] attention mask (outer product of text/mel masks).
    Returns:
      [B, Tx, Ty] binary alignment path, same dtype as ``value``.
    """
    dtype = value.dtype
    value = (value * mask).astype(jnp.float32)
    t_x = jnp.sum(mask[:, :, 0] != 0, axis=1).astype(jnp.int32)
    t_y = jnp.sum(mask[:, 0, :] != 0, axis=1).astype(jnp.int32)

    def single(v, tx, ty):
        v_acc = _forward_dp(v, tx, ty)
        idx = _backtrace(v_acc, tx, ty)  # [Ty]
        tx_max = v.shape[0]
        path = (idx[None, :] == jnp.arange(tx_max)[:, None])
        return path

    paths = jax.vmap(single)(value, t_x, t_y)
    return paths.astype(dtype)


def maximum_path_numpy(value, mask):
    """Pure-numpy reference DP (same recurrence), used as a test oracle."""
    import numpy as np
    value = np.array(value * mask, dtype=np.float32)
    mask = np.array(mask)
    B, TX, TY = value.shape
    path = np.zeros_like(value, dtype=np.int32)
    t_xs = (mask[:, :, 0] != 0).sum(1)
    t_ys = (mask[:, 0, :] != 0).sum(1)
    for b in range(B):
        v = value[b]
        t_x, t_y = int(t_xs[b]), int(t_ys[b])
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = MAX_NEG if x == y else v[x, y - 1]
                if x == 0:
                    v_prev = 0.0 if y == 0 else MAX_NEG
                else:
                    v_prev = v[x - 1, y - 1]
                v[x, y] = max(v_cur, v_prev) + v[x, y]
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            path[b, index, y] = 1
            if index != 0 and (index == y or v[index, y - 1] < v[index - 1, y - 1]):
                index -= 1
    return path
