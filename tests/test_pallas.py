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
