"""DPM (multistep exponential integrator) sampler: solver accuracy.

Both samplers integrate the SAME probability-flow ODE, so a high-resolution
Euler solution is the ground truth; the exponential integrator must be much
closer to it than Euler at equal step counts (it integrates the stiff
linear drift exactly and is 2nd order in the score term).
"""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from gradtts_tpu.models import GradTTS, synthesize  # noqa: E402
from gradtts_tpu.models.diffusion import (  # noqa: E402
    reverse_diffusion, reverse_diffusion_dpm,
)

HP = dict(n_vocab=60, n_enc_channels=32, filter_channels=64,
          filter_channels_dp=16, n_heads=2, n_enc_layers=1,
          n_feats=16, dec_dim=16)
B, TY = 2, 32


@pytest.fixture(scope='module')
def setup():
    model = GradTTS(**HP)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, HP['n_vocab'], (B, 8)), jnp.int32)
    xl = jnp.asarray([8, 6], jnp.int32)
    y = jnp.asarray(rng.standard_normal((B, TY, HP['n_feats'])), jnp.float32)
    yl = jnp.asarray([TY, TY - 8], jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, xl, y, yl, None)

    mu = jnp.asarray(rng.standard_normal((B, TY, HP['n_feats'])) * 0.5,
                     jnp.float32)
    mask = np.ones((B, TY, 1), np.float32)
    mask[1, TY - 8:] = 0.0
    mask = jnp.asarray(mask)
    z = mu + jax.random.normal(jax.random.PRNGKey(1), mu.shape)

    def est(x_t, m2d, mu_, t, s):
        return model.apply(params, x_t, m2d, mu_, t, s,
                           spk_is_embedded=True, method=GradTTS.estimate)

    return model, params, est, z, mask, mu, (x, xl)


def _err(a, b):
    return float(jnp.max(jnp.abs(a - b)))


def test_dpm_beats_euler_at_equal_steps(setup):
    model, _params, est, z, mask, mu, _ = setup
    bm, bx = model.beta_min, model.beta_max
    truth = reverse_diffusion(est, z, mask, mu, 400, bm, bx)
    e10 = _err(reverse_diffusion(est, z, mask, mu, 10, bm, bx), truth)
    d10 = _err(reverse_diffusion_dpm(est, z, mask, mu, 10, bm, bx), truth)
    d4 = _err(reverse_diffusion_dpm(est, z, mask, mu, 4, bm, bx), truth)
    # 2nd-order exponential integrator must dominate explicit Euler
    assert d10 < e10 / 3, f'dpm10={d10:.4f} euler10={e10:.4f}'
    # and 4 DPM steps should already be in the ballpark of 10 Euler steps
    assert d4 < e10 * 1.5, f'dpm4={d4:.4f} euler10={e10:.4f}'


def test_dpm_respects_mask(setup):
    model, _params, est, z, mask, mu, _ = setup
    out = reverse_diffusion_dpm(est, z, mask, mu, 4,
                                model.beta_min, model.beta_max)
    assert np.all(np.asarray(out)[1, TY - 8:] == 0.0)
    assert np.all(np.isfinite(np.asarray(out)))


def test_synthesize_dpm_sampler(setup):
    model, params, _est, _z, _mask, _mu, (x, xl) = setup
    res = synthesize(model, params, x, xl, n_timesteps=4, y_max_length=48,
                     key=jax.random.PRNGKey(2), sampler='dpm')
    d = np.asarray(res.decoder_outputs)
    assert d.shape == (B, 48, HP['n_feats'])
    assert np.all(np.isfinite(d))
