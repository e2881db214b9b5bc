"""bf16 compute path: the U-Net with dtype=bfloat16 must stay numerically
close to the f32 path (norms/softmax/accumulations are kept f32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gradtts_tpu.models import GradTTS, synthesize

HP = dict(n_vocab=60, n_enc_channels=32, filter_channels=64,
          filter_channels_dp=16, n_heads=2, n_enc_layers=2,
          n_feats=16, dec_dim=16)

B, TX, TY = 2, 12, 32


@pytest.fixture(scope='module')
def models_and_params():
    m32 = GradTTS(dtype=jnp.float32, **HP)
    m16 = GradTTS(dtype=jnp.bfloat16, **HP)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, HP['n_vocab'], (B, TX)), jnp.int32)
    xl = jnp.asarray([TX, TX - 3], jnp.int32)
    y = jnp.asarray(rng.standard_normal((B, TY, HP['n_feats'])), jnp.float32)
    yl = jnp.asarray([TY, TY - 8], jnp.int32)
    params = jax.jit(m32.init)(jax.random.PRNGKey(0), x, xl, y, yl, None)
    return m32, m16, params, x, xl, y, yl


def test_estimator_bf16_close_to_f32(models_and_params):
    m32, m16, params, x, xl, y, yl = models_and_params
    mask = (jnp.arange(TY)[None, :] < yl[:, None]).astype(jnp.float32)
    t = jnp.asarray([0.3, 0.7], jnp.float32)
    mu = y * 0.5
    out32 = m32.apply(params, y, mask, mu, t, None, spk_is_embedded=True,
                      method=GradTTS.estimate)
    out16 = m16.apply(params, y, mask, mu, t, None, spk_is_embedded=True,
                      method=GradTTS.estimate)
    assert out16.dtype == jnp.float32  # score returned in f32
    scale = float(jnp.std(out32)) + 1e-6
    rel = float(jnp.max(jnp.abs(out32 - out16))) / scale
    assert rel < 0.12, f'bf16 deviates {rel:.3f} of output std'


def test_encoder_bf16_close_to_f32(models_and_params):
    """The text encoder under bf16 compute must track the f32 path: the
    softmax probabilities and rel-pos weights stay f32 through the value
    contractions (advisor round 3), so only the projections/convs carry
    bf16 rounding."""
    m32, m16, params, x, xl, _y, _yl = models_and_params
    mu32, logw32, _, _ = m32.apply(params, x, xl, method=GradTTS.encode)
    mu16, logw16, _, _ = m16.apply(params, x, xl, method=GradTTS.encode)
    for a, b in ((mu32, mu16), (logw32, logw16)):
        scale = float(jnp.std(a)) + 1e-6
        rel = float(jnp.max(jnp.abs(a - b))) / scale
        assert rel < 0.08, f'bf16 encoder deviates {rel:.3f} of output std'


def test_synthesize_bf16_finite_and_close(models_and_params):
    m32, m16, params, x, xl, _y, _yl = models_and_params
    key = jax.random.PRNGKey(1)
    r32 = synthesize(m32, params, x, xl, n_timesteps=5, y_max_length=48,
                     key=key)
    r16 = synthesize(m16, params, x, xl, n_timesteps=5, y_max_length=48,
                     key=key)
    d32, d16 = np.asarray(r32.decoder_outputs), np.asarray(r16.decoder_outputs)
    assert np.all(np.isfinite(d16))
    # durations are ceil(exp(logw)): bf16's last-bit drift may legally
    # flip a frame at a ceil boundary, no more than one per item
    l32 = np.asarray(r32.y_lengths)
    l16 = np.asarray(r16.y_lengths)
    assert np.all(np.abs(l32 - l16) <= 1), (l32, l16)
    # a flipped duration time-shifts every later frame of that item, so
    # value comparison is only meaningful where the discretized durations
    # agree — there bf16 must be a small perturbation (same PRNG stream)
    matched = [i for i in range(len(l32)) if l32[i] == l16[i]]
    assert matched, (l32, l16)
    for i in matched:
        L = int(l32[i])
        scale = d32[i, :L].std() + 1e-6
        assert np.abs(d32[i, :L] - d16[i, :L]).max() / scale < 0.25


@pytest.mark.slow
def test_train_trajectory_bf16_tracks_f32(models_and_params):
    """Multi-step convergence check: 200 train steps from identical init
    with identical PRNG streams — bf16 loss trajectories must track f32
    (single-step grad closeness misses cumulative drift). The reference
    trains f32 (train.py:79-119); the bf16 speedup is only claimable if
    convergence is unharmed."""
    from gradtts_tpu.train.state import (
        init_state, make_optimizer, make_train_step,
    )
    m32, m16, params, x, xl, y, yl = models_and_params
    batch = {'x': x, 'x_lengths': xl, 'y': y, 'y_lengths': yl}
    n_steps = 200

    def run(model):
        opt = make_optimizer(1e-3)
        state = init_state(params, opt)
        step = jax.jit(make_train_step(model, opt, out_size=16))
        losses = []
        for i in range(n_steps):
            state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
            losses.append(float(metrics['loss/diffusion'])
                          + float(metrics['loss/prior']))
        return np.asarray(losses)

    l32 = run(m32)
    l16 = run(m16)
    assert np.all(np.isfinite(l16))
    # both must actually learn (trajectory decreasing), and track each
    # other: same-window means agree within a few percent of the f32 scale
    assert l32[-20:].mean() < l32[:20].mean()
    assert l16[-20:].mean() < l16[:20].mean()
    scale = np.abs(l32).mean() + 1e-6
    traj_dev = np.abs(l32 - l16).mean() / scale
    final_dev = abs(l32[-20:].mean() - l16[-20:].mean()) / scale
    assert traj_dev < 0.05, f'bf16 trajectory deviates {traj_dev:.3f}'
    assert final_dev < 0.05, f'bf16 final loss deviates {final_dev:.3f}'


def test_train_step_fused_attention_matches_jnp(models_and_params):
    """A full train step with the Pallas fused-attention kernel (forward
    + round-4 streaming backward, interpret mode on CPU) must produce
    the same losses and updated params as the jnp attention path."""
    from gradtts_tpu.train.state import (
        init_state, make_optimizer, make_train_step,
    )
    m32, _m16, params, x, xl, y, yl = models_and_params
    batch = {'x': x, 'x_lengths': xl, 'y': y, 'y_lengths': yl}

    def run(fused):
        opt = make_optimizer(1e-3)
        state = init_state(params, opt)
        step = jax.jit(make_train_step(m32, opt, out_size=16,
                                       fused_attention=fused))
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        return state, metrics

    s_jnp, m_jnp = run(False)
    s_fused, m_fused = run(True)
    for k in m_jnp:
        np.testing.assert_allclose(float(m_fused[k]), float(m_jnp[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    leaves_a = jax.tree_util.tree_leaves(s_jnp.params)
    leaves_b = jax.tree_util.tree_leaves(s_fused.params)
    for a, b in zip(leaves_a, leaves_b):
        # f32 reassociation between the kernel and jnp contractions,
        # amplified by the Adam rescale: allow ~1e-4 absolute
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-4)


def test_train_step_bf16_grads(models_and_params):
    """Regression: the full train step (value_and_grad through the bf16
    U-Net incl. the lhs-dilated Upsample conv) must compile and produce
    finite losses — preferred_element_type in the conv primal used to
    break the transpose rule with mixed bf16/f32 dtypes."""
    from gradtts_tpu.train.state import (
        init_state, make_optimizer, make_train_step,
    )
    _m32, m16, params, x, xl, y, yl = models_and_params
    batch = {'x': x, 'x_lengths': xl, 'y': y, 'y_lengths': yl}
    opt = make_optimizer(1e-4)
    state = init_state(params, opt)
    step = jax.jit(make_train_step(m16, opt, out_size=16))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    assert int(state.step) == 1
