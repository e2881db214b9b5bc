"""Exploration: is a space-to-depth repack of the top U-Net level faster?

The top level of the score U-Net runs 3x3 convs at [B, 80, 768, 64] —
C=64 half-fills the 128-lane MXU. Space-to-depth folds 2x2 (F, T) patches
into channels: [B, 40, 384, 256], where a 3x3 stride-1 conv becomes an
EXACT 2x2 conv over patch-blocks with a sparsely-rearranged kernel
(16/9 the MACs, 2x the lane fill). This script measures candidates on the
real chip before any refactor:

  a. conv3x3 C64->64 at (80, 768)         [current]
  b. s2d conv2x2 C256->256 at (41, 385) + phase slices  [exact rearrangement]
  c. conv3x3 as 9 shifted matmuls
  d. conv3x3 C128->128 at (80, 768)       [lane-fill ceiling probe]
  e. full estimator fwd, f32 vs bf16 stored weights

Run: python tools/explore_s2d.py
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

B, F, T, C = 8, 80, 768, 64
F2, T2 = F // 2, T // 2
DT = jnp.bfloat16
K = 16


def timed(jfn, *args, k=K):
    # chain K calls ending in a scalar fetch; subtract fetch-only constant
    def run(n):
        t0 = time.perf_counter()
        v = None
        for i in range(n):
            v = jfn(*args)
        float(v.sum() if hasattr(v, 'sum') else v)
        return time.perf_counter() - t0
    run(2)  # warm
    t1 = min(run(1), run(1))
    tk = min(run(k), run(k))
    return (tk - t1) / (k - 1)


def s2d(x):
    b, f, t, c = x.shape
    return x.reshape(b, f // 2, 2, t // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, f // 2, t // 2, 4 * c)


def d2s(x, c):
    b, f2, t2, _ = x.shape
    return x.reshape(b, f2, t2, 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, f2 * 2, t2 * 2, c)


def s2d_kernel(w):
    """[3,3,Ci,Co] -> [2,2,4Ci,4Co] exact phase-rearranged kernel."""
    ci, co = w.shape[2], w.shape[3]
    wpad = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # index 3 == zero
    # df = di + 2*ba + pi - 1 ; invalid -> 3
    idx = np.zeros((2, 2, 2), np.int32)  # [phase_out, blocktap, phase_in]
    for d in range(2):
        for a in range(2):
            for p in range(2):
                v = d + 2 * a + p - 1
                idx[d, a, p] = v if 0 <= v <= 2 else 3
    idx = jnp.asarray(idx)
    # wk[ba,bb,pi,pj,ci,di,dj,co] = wpad[idx[di,ba,pi], idx[dj,bb,pj], ci, co]
    wk = wpad[idx[:, :, :, None, None, None],          # di,ba,pi
              idx[None, None, None, :, :, :]]          # dj,bb,pj
    # dims now: [di, ba, pi, dj, bb, pj, ci, co]
    wk = wk.transpose(1, 4, 2, 5, 6, 0, 3, 7)          # ba,bb,pi,pj,ci,di,dj,co
    return wk.reshape(2, 2, 4 * ci, 4 * co)


def conv_a(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def conv_b(xs, wk):
    # xs: [B,F2,T2,4C] s2d input; pad one block each side, VALID 2x2 conv
    xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    z = jax.lax.conv_general_dilated(
        xp, wk, (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))  # [B,F2+1,T2+1,4Co]
    co = z.shape[-1] // 4
    parts = []
    for di in range(2):
        for dj in range(2):
            g = (di * 2 + dj) * co
            parts.append(z[:, di:di + F2, dj:dj + T2, g:g + co])
    return jnp.stack(parts, axis=3).reshape(xs.shape[0], F2, T2, 4 * co)


def conv_c(x, w):
    # 9 shifted matmuls
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for df in range(3):
        for dt in range(3):
            xi = xp[:, df:df + F, dt:dt + T, :]
            y = jnp.einsum('bftc,co->bfto', xi, w[df, dt],
                           preferred_element_type=jnp.float32)
            out = y if out is None else out + y
    return out.astype(x.dtype)


def main():
    print('devices:', jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, F, T, C)), DT)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, DT)

    # ---- correctness of s2d rearrangement (f32, CPU-precision check) ----
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    ref = conv_a(xf, wf)
    got = d2s(conv_b(s2d(xf), s2d_kernel(wf)), C)
    err = float(jnp.max(jnp.abs(ref - got)))
    print('s2d conv max err (f32):', err)
    assert err < 1e-3, err

    # ---- timings ----
    ja = jax.jit(conv_a)
    jb = jax.jit(lambda xs, wk: conv_b(xs, wk))
    jb_full = jax.jit(lambda x, w: conv_b(s2d(x), s2d_kernel(w)))
    jc = jax.jit(conv_c)

    xs = s2d(x)
    wk = s2d_kernel(w)

    print(f'a  conv3x3 C64      : {timed(ja, x, w)*1e3:7.3f} ms')
    print(f'b  s2d conv2x2 C256 : {timed(jb, xs, wk)*1e3:7.3f} ms')
    print(f'b+ s2d incl pack+kern: {timed(jb_full, x, w)*1e3:7.3f} ms')
    print(f'c  9 shifted matmuls: {timed(jc, x, w)*1e3:7.3f} ms')

    x128 = jnp.asarray(rng.standard_normal((B, F, T, 128)), DT)
    w128 = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, DT)
    print(f'd  conv3x3 C128     : {timed(ja, x128, w128)*1e3:7.3f} ms')
    # same-FLOP comparison: C128 is 4x the MACs of C64

    # level-1 shape for reference
    x1 = jnp.asarray(rng.standard_normal((B, 40, 384, 128)), DT)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, DT)
    print(f'   conv3x3 lvl1 C128: {timed(ja, x1, w1)*1e3:7.3f} ms')

    # s2d conv for Upsample (ConvTranspose 4x4 s2): plain conv2x2 C64->256
    wu = jnp.asarray(rng.standard_normal((2, 2, 64, 256)) * 0.05, DT)
    xup = jnp.asarray(rng.standard_normal((B, 40, 384, 64)), DT)
    jup = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))), w, (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')))
    print(f'   s2d upsample 64->256: {timed(jup, xup, wu)*1e3:7.3f} ms')
    # current transposed-conv upsample: lhs-dilated conv at (80,768)
    wt = jnp.asarray(rng.standard_normal((4, 4, 64, 64)) * 0.05, DT)
    jtr = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')))
    print(f'   lhs-dilated upsample: {timed(jtr, xup, wt)*1e3:7.3f} ms')


if __name__ == '__main__':
    main()
