"""Pallas kernels: interpret-mode parity vs the jnp reference on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gradtts_tpu.ops.pallas.groupnorm_mish import groupnorm_mish, _reference


@pytest.mark.parametrize('shape,groups', [((2, 16, 32, 32), 8),
                                          ((1, 8, 64, 64), 8),
                                          ((3, 16, 16, 16), 4)])
def test_groupnorm_mish_interpret_parity(shape, groups):
    rng = np.random.default_rng(0)
    B, F, T, C = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    mask = jnp.asarray(rng.random((B, 1, T, 1)) > 0.2, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(C), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C), jnp.float32)
    ref = _reference(x, mask, gamma, beta, groups, 1e-5)
    pal = groupnorm_mish(x, mask, gamma, beta, groups, 1e-5, True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-5)


def test_groupnorm_mish_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 32)), jnp.bfloat16)
    mask = jnp.ones((2, 1, 32, 1), jnp.float32)
    gamma = jnp.ones((32,), jnp.float32)
    beta = jnp.zeros((32,), jnp.float32)
    ref = _reference(x, mask, gamma, beta, 8, 1e-5)
    pal = groupnorm_mish(x, mask, gamma, beta, 8, 1e-5, True)
    assert pal.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(pal, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_groupnorm_mish_grad_matches_reference():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16)), jnp.float32)
    mask = jnp.ones((2, 1, 16, 1), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(16), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(16), jnp.float32)

    def f(x, g, b):
        return jnp.sum(groupnorm_mish(x, mask, g, b, 8, 1e-5, False) ** 2)

    def fr(x, g, b):
        return jnp.sum(_reference(x, mask, g, b, 8, 1e-5) ** 2)

    got = jax.grad(f, argnums=(0, 1, 2))(x, gamma, beta)
    want = jax.grad(fr, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_groupnorm_mish_under_jit_and_vmap_free():
    x = jnp.ones((2, 8, 16, 16), jnp.float32)
    mask = jnp.ones((2, 1, 16, 1), jnp.float32)
    gamma = jnp.ones((16,), jnp.float32)
    beta = jnp.zeros((16,), jnp.float32)
    out = jax.jit(lambda x: groupnorm_mish(x, mask, gamma, beta, 8, 1e-5,
                                           False))(x)
    assert out.shape == x.shape


# ---------------- fused linear attention (+ rezero) ----------------------

from gradtts_tpu.ops.pallas import linear_attention as la


def _la_inputs(seed, B=2, F=8, T=24, C=32, H=64, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, F, T, C)), dtype)
    w_q = jnp.asarray(rng.standard_normal((C, H)) * 0.1, jnp.float32)
    w_k = jnp.asarray(rng.standard_normal((C, H)) * 0.1, jnp.float32)
    w_v = jnp.asarray(rng.standard_normal((C, H)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((H, C)) * 0.1, jnp.float32)
    b_out = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    g = jnp.asarray([0.7], jnp.float32)
    return x, w_q, w_k, w_v, w_out, b_out, g


def test_fused_linear_attention_interpret_parity():
    args = _la_inputs(0)
    ref = la._reference(*args, dim_head=16)
    out = la.fused_linear_attention_rezero(*args, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_linear_attention_tail_masking(monkeypatch):
    # Force multi-tile streaming with a ragged tail so the online-max
    # rescale and the tail mask are both exercised.
    monkeypatch.setattr(la, '_TILE_LIMIT_BYTES', 8 * 32 * 4 * 8)  # 8 rows/t
    args = _la_inputs(1, B=1, F=5, T=9, C=32, H=32)
    ref = la._reference(*args, dim_head=8)
    out = la.fused_linear_attention_rezero(*args, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_linear_attention_grad_matches_reference():
    args = _la_inputs(2, B=1, F=4, T=12, C=16, H=32)

    def loss_fused(*a):
        return jnp.sum(la.fused_linear_attention_rezero(*a, 8) ** 2)

    def loss_ref(*a):
        return jnp.sum(la._reference(*a, dim_head=8) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 4, 6))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 4, 6))(*args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_linear_attention_grad_phased_and_tail(monkeypatch):
    """The streaming Pallas backward (round 4: two sweeps over (x, dy) +
    host algebra instead of recomputing the jnp forward) must match the
    jnp VJP in the frequency-folded phases=2 layout AND with a ragged
    tile tail (masked rows in both sweeps)."""
    monkeypatch.setattr(la, '_BWD_TILE_LIMIT_BYTES', 8 * 2 * 32 * 4)
    x, w_q, w_k, w_v, w_out, b_out, g = _la_inputs(5, B=2, F=4, T=9,
                                                   C=16, H=32)
    xf = x.reshape(2, 2, 2, 9, 16).transpose(0, 1, 3, 2, 4).reshape(
        2, 2, 9, 32)
    args = (xf, w_q, w_k, w_v, w_out, b_out, g)

    def loss_fused(*a):
        return jnp.sum(la.fused_linear_attention_rezero(*a, 8, 2) ** 2)

    def loss_ref(*a):
        return jnp.sum(la._reference_phased(*a, dim_head=8, phases=2) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_estimator_fused_attention_matches_jnp():
    """Full U-Net forward: fused_attention=True vs False agree (f32)."""
    from gradtts_tpu.models.diffusion import GradLogPEstimator2d
    est = GradLogPEstimator2d(dim=16, n_feats=16)
    rng = np.random.default_rng(3)
    B, T = 2, 32
    xt = jnp.asarray(rng.standard_normal((B, T, 16)), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((B, T, 16)), jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)
    t = jnp.full((B,), 0.4, jnp.float32)
    params = est.init(jax.random.PRNGKey(0), xt, mask, mu, t, None)
    # rezero gains are zero-init; randomize so attention contributes
    params = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 0.5) if p.shape == (1,) else p, params)
    y0 = est.apply(params, xt, mask, mu, t, None, fused_attention=False)
    y1 = est.apply(params, xt, mask, mu, t, None, fused_attention=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)


def test_fused_linear_attention_phased_parity():
    """phases=2 (frequency-folded input): the phase-native kernel path —
    block-diagonal projections, shared online max, phase-folded context —
    matches the unfolded reference on the re-labelled positions."""
    x, w_q, w_k, w_v, w_out, b_out, g = _la_inputs(4, B=2, F=4, T=12,
                                                   C=16, H=32)
    b, f, t, c = x.shape
    xf = x.reshape(b, f // 2, 2, t, c).transpose(0, 1, 3, 2, 4).reshape(
        b, f // 2, t, 2 * c)
    ref = la._reference_phased(xf, w_q, w_k, w_v, w_out, b_out,
                               jnp.float32(0.7), 8, 2)
    out = la.fused_linear_attention_rezero(xf, w_q, w_k, w_v, w_out, b_out,
                                           g, 8, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and the folded result unfolds to the unfolded attention's output
    ref_unf = la._reference(x, w_q, w_k, w_v, w_out, b_out,
                            jnp.float32(0.7), 8)
    unf = np.asarray(out).reshape(b, f // 2, t, 2, c).transpose(
        0, 1, 3, 2, 4).reshape(b, f, t, c)
    np.testing.assert_allclose(unf, np.asarray(ref_unf),
                               rtol=1e-5, atol=1e-5)


def test_fused_linear_attention_phased_multitile(monkeypatch):
    monkeypatch.setattr(la, '_TILE_LIMIT_BYTES', 8 * 32 * 4 * 8)
    x, w_q, w_k, w_v, w_out, b_out, g = _la_inputs(5, B=1, F=6, T=9,
                                                   C=16, H=32)
    b, f, t, c = x.shape
    xf = x.reshape(b, f // 2, 2, t, c).transpose(0, 1, 3, 2, 4).reshape(
        b, f // 2, t, 2 * c)
    ref = la._reference_phased(xf, w_q, w_k, w_v, w_out, b_out,
                               jnp.float32(0.7), 8, 2)
    out = la.fused_linear_attention_rezero(xf, w_q, w_k, w_v, w_out, b_out,
                                           g, 8, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


# --- custom_jvp streaming attention (round 5) ------------------------------


def _jvp_tangents(seed, C, H):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((C, H)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((C, H)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((C, H)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((H, C)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
            jnp.asarray([0.3], jnp.float32))


def test_fused_attention_jvp_parity():
    """(y, dy) from the custom_jvp streaming kernels vs jax.jvp through the
    jnp reference — full tangents (x AND every weight)."""
    x, w_q, w_k, w_v, w_out, b_out, g = _la_inputs(7, B=2, F=4, T=12,
                                                   C=16, H=32)
    rng = np.random.default_rng(8)
    dx = jnp.asarray(rng.standard_normal(x.shape), x.dtype)
    dwq, dwk, dwv, dwo, dbo, dg = _jvp_tangents(9, 16, 32)

    def ref(*a):
        return la._reference_phased(*a, dim_head=8, phases=1)

    def fused(*a):
        return la.fused_linear_attention_rezero_jvp(*a, dim_head=8,
                                                    phases=1)

    g32, dg32 = jnp.float32(0.7), jnp.float32(0.3)
    y_ref, dy_ref = jax.jvp(ref, (x, w_q, w_k, w_v, w_out, b_out, g32),
                            (dx, dwq, dwk, dwv, dwo, dbo, dg32))
    y, dy = jax.jvp(fused, (x, w_q, w_k, w_v, w_out, b_out, g),
                    (dx, dwq, dwk, dwv, dwo, dbo, dg))
    scale = float(jnp.abs(dy_ref).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    assert float(jnp.abs(dy - dy_ref).max()) / scale < 1e-4
    # primal-only call agrees with the reference too
    y2 = fused(x, w_q, w_k, w_v, w_out, b_out, g)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_attention_jvp_phased_x_only(monkeypatch):
    """phases=2 + multi-tile streaming with a ragged tail, tangent on x
    only (the Hutchinson engine's exact usage pattern)."""
    monkeypatch.setattr(la, '_TILE_LIMIT_BYTES', 8 * 32 * 4 * 8)
    x, w_q, w_k, w_v, w_out, b_out, g = _la_inputs(10, B=1, F=6, T=9,
                                                   C=16, H=32)
    b, f, t, c = x.shape
    xf = x.reshape(b, f // 2, 2, t, c).transpose(0, 1, 3, 2, 4).reshape(
        b, f // 2, t, 2 * c)
    rng = np.random.default_rng(11)
    dxf = jnp.asarray(rng.standard_normal(xf.shape), xf.dtype)

    def ref(xx):
        return la._reference_phased(xx, w_q, w_k, w_v, w_out, b_out,
                                    jnp.float32(0.7), 8, 2)

    def fused(xx):
        return la.fused_linear_attention_rezero_jvp(
            xx, w_q, w_k, w_v, w_out, b_out, g, 8, 2)

    y_ref, dy_ref = jax.jvp(ref, (xf,), (dxf,))
    y, dy = jax.jvp(fused, (xf,), (dxf,))
    scale = float(jnp.abs(dy_ref).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    assert float(jnp.abs(dy - dy_ref).max()) / scale < 1e-4


def test_fused_attention_jvp_under_jit_and_scan():
    """The likelihood engine calls jax.jvp inside a lax.scan inside jit —
    the custom_jvp kernels must trace in that context."""
    x, w_q, w_k, w_v, w_out, b_out, g = _la_inputs(12, B=1, F=4, T=8,
                                                   C=16, H=32)

    @jax.jit
    def run(x):
        def step(carry, _):
            def f(xx):
                return la.fused_linear_attention_rezero_jvp(
                    xx, w_q, w_k, w_v, w_out, b_out, g, 8, 1)
            y, dy = jax.jvp(f, (carry,), (jnp.ones_like(carry),))
            return y * 1e-2, jnp.sum(dy)
        return jax.lax.scan(step, x, None, length=3)

    out, divs = run(x)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.isfinite(np.asarray(divs)))
