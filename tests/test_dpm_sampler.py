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


@pytest.mark.slow
def test_dpm_fidelity_on_trained_weights():
    """Graduate the DPM claim from random weights: train the tiny model to
    convergence on a synthetic deterministic corpus (each token maps to a
    fixed mel pattern held 4 frames), then check sampler fidelity against
    a 400-step Euler ground truth on the LEARNED score field.

    Round-4 finding this test pins down: the random-weights '4 DPM steps
    beat 10 Euler steps' result does NOT survive trained weights (the
    trained score is far stiffer near t=1); what holds — with the
    eps-prediction/log-SNR-grid sampler — is ~6-8 DPM steps beating 10
    Euler steps (exact crossover moves with training state) and DPM-10
    beating Euler-10 by ~3-5x. PERFORMANCE.md's sampler table quotes
    these trained-weights numbers."""
    from gradtts_tpu.train.state import (
        init_state, make_optimizer, make_train_step,
    )
    hp = dict(HP, n_vocab=20)
    model = GradTTS(**hp)
    F = hp['n_feats']
    rng = np.random.default_rng(7)
    codebook = rng.standard_normal((hp['n_vocab'], F)).astype(np.float32)
    Bt, TX, DUR = 8, 8, 4
    tokens = rng.integers(1, hp['n_vocab'], (Bt, TX))
    mels = np.repeat(codebook[tokens], DUR, axis=1)  # [B, TX*DUR, F]
    batch = {'x': jnp.asarray(tokens, jnp.int32),
             'x_lengths': jnp.full((Bt,), TX, jnp.int32),
             'y': jnp.asarray(mels),
             'y_lengths': jnp.full((Bt,), TX * DUR, jnp.int32)}

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch['x'], batch['x_lengths'], batch['y'],
        batch['y_lengths'], None)
    opt = make_optimizer(1e-3)
    state = init_state(params, opt)
    step = jax.jit(make_train_step(model, opt, out_size=None))
    first = last = None
    for i in range(1500):
        state, metrics = step(state, batch, jax.random.PRNGKey(1000 + i))
        if first is None:
            first = float(metrics['loss/prior'])
        last = float(metrics['loss/prior'])
    # convergence evidence: the encoder prior actually learned the corpus.
    # The per-dim Gaussian NLL has a 0.5*log(2*pi) constant floor; measure
    # the learnable excess above it.
    floor = 0.5 * np.log(2 * np.pi)
    assert last - floor < 0.3 * (first - floor), \
        f'prior loss {first:.3f} -> {last:.3f} (floor {floor:.3f})'

    trained = state.params
    x, xl = batch['x'], batch['x_lengths']
    budget = 48
    noise = jnp.asarray(rng.standard_normal((Bt, budget, F)), jnp.float32)

    def synth(n, sampler):
        return np.asarray(synthesize(
            model, trained, x, xl, n_timesteps=n, y_max_length=budget,
            key=jax.random.PRNGKey(2), sampler=sampler,
            noise=noise).decoder_outputs)

    truth = synth(400, 'euler')
    mae = lambda a: float(np.abs(a - truth).mean())
    e10, e50 = mae(synth(10, 'euler')), mae(synth(50, 'euler'))
    d8, d10 = mae(synth(8, 'dpm')), mae(synth(10, 'dpm'))
    # trained-weights fidelity: 8 DPM steps out-integrate 10 Euler steps
    # with margin (measured d8=0.042 vs e10=0.072; d6/d7 also beat e10
    # here but with training-state-sensitive margins)
    assert d8 < 0.8 * e10, f'dpm8={d8:.5f} euler10={e10:.5f}'
    # and at matched steps DPM wins by a wide margin
    assert d10 < 0.6 * e10, f'dpm10={d10:.5f} euler10={e10:.5f}'
    assert e50 < e10  # sanity: more Euler steps converge toward truth
