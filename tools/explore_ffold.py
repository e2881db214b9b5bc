"""Exploration 2: frequency-fold (F-only space-to-depth) for the top U-Net
level. [B, 80, 768, 64] -> [B, 40, 768, 128]: a 3x3 conv becomes an exact
[2, 3] conv with phase-rearranged kernel — only 4/3 the MACs (vs 16/9 for
2D s2d) at full 128-lane fill, and the time mask broadcasts unchanged.

Measures:
  a. conv3x3 C64 at (80, 768)            [current]
  f. ffold conv[2,3] C128 at (40, 768)   [exact rearrangement]
  g. ffold downsample [2,3] s(1,2) C128->64
  h. direct downsample 3x3 s2 C64
  i. groupnorm+mish elementwise at both layouts
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

B, F, T, C = 8, 80, 768, 64
F2 = F // 2
DT = jnp.bfloat16
K = 16


def timed(jfn, *args, k=K):
    def run(n):
        t0 = time.perf_counter()
        v = None
        for i in range(n):
            v = jfn(*args)
        float(v.sum() if hasattr(v, 'sum') else v)
        return time.perf_counter() - t0
    run(2)
    t1 = min(run(1), run(1))
    tk = min(run(k), run(k))
    return (tk - t1) / (k - 1)


def ffold(x):
    b, f, t, c = x.shape
    return x.reshape(b, f // 2, 2, t, c).transpose(0, 1, 3, 2, 4).reshape(
        b, f // 2, t, 2 * c)


def funfold(x, c):
    b, f2, t, _ = x.shape
    return x.reshape(b, f2, t, 2, c).transpose(0, 1, 3, 2, 4).reshape(
        b, f2 * 2, t, c)


def ffold_kernel(w):
    """[3,3,Ci,Co] -> [2,3,2Ci,2Co] exact F-phase-rearranged kernel."""
    ci, co = w.shape[2], w.shape[3]
    wpad = jnp.pad(w, ((0, 1), (0, 0), (0, 0), (0, 0)))  # row 3 == zeros
    idx = np.zeros((2, 2, 2), np.int32)  # [di, ba, pi] -> df or 3
    for d in range(2):
        for a in range(2):
            for p in range(2):
                v = d + 2 * a + p - 1
                idx[d, a, p] = v if 0 <= v <= 2 else 3
    idx = jnp.asarray(idx)
    # wk[ba, kt, pi, ci, di, co] = wpad[idx[di, ba, pi], kt, ci, co]
    wk = wpad[idx]                      # [di, ba, pi, kt, ci, co]
    wk = wk.transpose(1, 3, 2, 4, 0, 5)  # ba, kt, pi, ci, di, co
    return wk.reshape(2, 3, 2 * ci, 2 * co)


def conv_a(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def conv_f(xs, wk):
    # xs: [B,F2,T,2C]; pad 1 block in F, 1 in T; VALID [2,3] conv ->
    # [B,F2+1,T,2Co]; phase di output = z[:, di:di+F2]
    xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    z = jax.lax.conv_general_dilated(
        xp, wk, (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    co = z.shape[-1] // 2
    return jnp.concatenate([z[:, 0:F2, :, :co], z[:, 1:F2 + 1, :, co:]],
                           axis=-1)
    # NOTE: channel order after concat is (di, co) == ffold layout


def down_h(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def down_g(xs, wk):
    # phase-0-only rows: [2,3] kernel, F-stride 1 w/ pad (1,0), T-stride 2
    xp = jnp.pad(xs, ((0, 0), (1, 0), (1, 1), (0, 0)))
    return jax.lax.conv_general_dilated(
        xp, wk, (1, 2), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def gn_mish(x, scale, bias, groups=8):
    b, f, t, c = x.shape
    xr = x.astype(jnp.float32).reshape(b, f, t, groups, c // groups)
    mean = xr.mean(axis=(1, 2, 4), keepdims=True)
    var = (xr ** 2).mean(axis=(1, 2, 4), keepdims=True) - mean ** 2
    h = (xr - mean) * jax.lax.rsqrt(var + 1e-5)
    h = h.reshape(b, f, t, c) * scale + bias
    return (h * jnp.tanh(jax.nn.softplus(h))).astype(x.dtype)


def gn_mish_ffold(xs, scale, bias, groups=8):
    b, f2, t, c2 = xs.shape
    c = c2 // 2
    xr = xs.astype(jnp.float32).reshape(b, f2, t, 2, groups, c // groups)
    mean = xr.mean(axis=(1, 2, 3, 5), keepdims=True)
    var = (xr ** 2).mean(axis=(1, 2, 3, 5), keepdims=True) - mean ** 2
    h = (xr - mean) * jax.lax.rsqrt(var + 1e-5)
    sc = jnp.concatenate([scale, scale])
    bi = jnp.concatenate([bias, bias])
    h = h.reshape(b, f2, t, c2) * sc + bi
    return (h * jnp.tanh(jax.nn.softplus(h))).astype(xs.dtype)


def main():
    print('devices:', jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, F, T, C)), DT)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, DT)

    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    ref = conv_a(xf, wf)
    got = funfold(conv_f(ffold(xf), ffold_kernel(wf)), C)
    err = float(jnp.max(jnp.abs(ref - got)))
    print('ffold conv max err (f32):', err)
    assert err < 1e-3, err

    wd = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
    refd = down_h(xf, wd)
    wdk_full = ffold_kernel(wd)  # [2,3,128,128]; phase-0 outputs = [:, :, :, :64]
    gotd = down_g(ffold(xf), wdk_full[:, :, :, :C])
    errd = float(jnp.max(jnp.abs(refd - gotd)))
    print('ffold downsample max err (f32):', errd)
    assert errd < 1e-3, errd

    ja = jax.jit(conv_a)
    jf = jax.jit(conv_f)
    jh = jax.jit(down_h)
    jg = jax.jit(down_g)

    xs = ffold(x)
    wk = ffold_kernel(w)
    wb = w.astype(DT)
    wkd = wk[:, :, :, :C]

    print(f'a conv3x3 C64 (80,768)   : {timed(ja, x, wb)*1e3:7.3f} ms')
    print(f'f ffold conv[2,3] C128   : {timed(jf, xs, wk)*1e3:7.3f} ms')
    print(f'h down 3x3 s2 C64        : {timed(jh, x, wb)*1e3:7.3f} ms')
    print(f'g ffold down [2,3] s(1,2): {timed(jg, xs, wkd)*1e3:7.3f} ms')

    sc = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    bi = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    jgn = jax.jit(gn_mish)
    jgnf = jax.jit(gn_mish_ffold)
    r1 = jgn(xf, sc, bi)
    r2 = funfold(jgnf(ffold(xf), sc, bi), C)
    print('gn_mish ffold max err:', float(jnp.max(jnp.abs(r1 - r2))))
    print(f'i gn+mish (80,768,64)    : {timed(jgn, x, sc, bi)*1e3:7.3f} ms')
    print(f'i gn+mish ffold          : {timed(jgnf, xs, sc, bi)*1e3:7.3f} ms')

    # stem conv: 3x3 C2->64 both layouts
    x2 = jnp.asarray(rng.standard_normal((B, F, T, 2)), DT)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 2, C)) * 0.05, DT)
    print(f'  stem conv 2->64 direct : {timed(ja, x2, w2)*1e3:7.3f} ms')
    x2s = ffold(x2)
    w2k = ffold_kernel(w2)
    print(f'  stem conv ffold 4->128 : {timed(jf, x2s, w2k)*1e3:7.3f} ms')


if __name__ == '__main__':
    main()
