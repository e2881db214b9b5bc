"""Distributed train step on a virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gradtts_tpu import get_config
from gradtts_tpu.models import GradTTS
from gradtts_tpu.parallel.mesh import (
    make_mesh, param_shardings, replicated, shard_batch,
)
from gradtts_tpu.train.state import (
    TrainState, init_state, make_optimizer, make_train_step,
)

TINY = {'encoder.n_enc_channels': 32, 'encoder.filter_channels': 64,
        'encoder.filter_channels_dp': 16, 'encoder.n_enc_layers': 2,
        'data.n_feats': 16, 'decoder.dec_dim': 16}


def _setup(mesh, seed=0, n_spks=1):
    cfg = get_config('ljspeech', n_spks=n_spks, **TINY)
    model = GradTTS.from_config(cfg)
    B, TX, TY = 8, 12, 32
    rng = np.random.default_rng(seed)
    batch = {
        'x': np.asarray(rng.integers(1, cfg.n_vocab, (B, TX)), np.int32),
        'x_lengths': np.full((B,), TX, np.int32),
        'y': rng.standard_normal((B, TY, cfg.data.n_feats)).astype(np.float32),
        'y_lengths': np.asarray([TY, TY - 4] * 4, np.int32),
    }
    if n_spks > 1:
        batch['spk'] = np.asarray(rng.integers(0, n_spks, (B,)), np.int32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(batch['x']),
        jnp.asarray(batch['x_lengths']), jnp.asarray(batch['y']),
        jnp.asarray(batch['y_lengths']),
        jnp.asarray(batch['spk']) if 'spk' in batch else None)
    opt = make_optimizer(1e-4)
    state = init_state(params, opt)
    p_shard = param_shardings(mesh, state.params)
    state = TrainState(
        step=jax.device_put(state.step, replicated(mesh)),
        params=jax.device_put(state.params, p_shard),
        opt_state=jax.device_put(state.opt_state,
                                 param_shardings(mesh, state.opt_state)))
    return cfg, model, opt, state, batch


def _run_steps(mesh, n=2, seed=0, n_spks=1):
    cfg, model, opt, state, batch = _setup(mesh, seed, n_spks)
    step_fn = make_train_step(model, opt, out_size=16, grad_clip_norm=1.0)
    jit_step = jax.jit(step_fn, donate_argnums=(0,))
    metrics = None
    with mesh:
        sharded = shard_batch(mesh, batch)
        for i in range(n):
            state, metrics = jit_step(state, sharded, jax.random.PRNGKey(7))
    return state, {k: float(v) for k, v in metrics.items()}


def test_data_parallel_8():
    assert jax.device_count() >= 8
    mesh = make_mesh(data=8, model=1)
    state, metrics = _run_steps(mesh)
    assert int(state.step) == 2
    for k, v in metrics.items():
        assert np.isfinite(v), k


def test_dp_tp_mesh_4x2():
    mesh = make_mesh(data=4, model=2)
    state, metrics = _run_steps(mesh)
    assert np.isfinite(metrics['loss/total'])
    # at least one param is actually sharded over the model axis
    sharded = [
        l for l in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: x.sharding.spec, state.params))
        if 'model' in str(l)]
    assert sharded, 'no tensor-parallel params found'


def test_dp_and_tp_agree_with_single_device():
    m1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    m8 = make_mesh(data=4, model=2)
    s1, met1 = _run_steps(m1, n=1)
    s8, met8 = _run_steps(m8, n=1)
    assert met1['loss/total'] == pytest.approx(met8['loss/total'], rel=1e-4)
    # parameters after one step agree
    l1 = jax.tree_util.tree_leaves(jax.device_get(s1.params))
    l8 = jax.tree_util.tree_leaves(jax.device_get(s8.params))
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(l1, l8))
    assert worst < 1e-5


def test_multispeaker_step():
    mesh = make_mesh(data=8, model=1)
    state, metrics = _run_steps(mesh, n=1, n_spks=4)
    assert np.isfinite(metrics['loss/total'])


def test_grad_clip_norms_reported():
    mesh = make_mesh(data=8, model=1)
    _, metrics = _run_steps(mesh, n=1)
    assert metrics['grad_norm/encoder'] > 0
    assert metrics['grad_norm/decoder'] > 0


def test_remat_step_matches_plain():
    """remat=True (jax.checkpoint around the U-Net) must change memory, not
    math: one train step yields the same losses and parameters."""
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    cfg, model, opt, state0, batch = _setup(mesh)
    results = []
    for remat in (False, True):
        state = jax.tree_util.tree_map(jnp.copy, state0)
        step_fn = make_train_step(model, opt, out_size=16,
                                  grad_clip_norm=1.0, remat=remat)
        with mesh:
            state, metrics = jax.jit(step_fn)(
                state, shard_batch(mesh, batch), jax.random.PRNGKey(7))
        results.append((jax.device_get(state.params), metrics))
    (p0, m0), (p1, m1) = results
    assert float(m0['loss/total']) == pytest.approx(float(m1['loss/total']),
                                                    rel=1e-6)
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)))
    assert worst < 1e-6


def test_data_parallel_synthesis_matches_single_device():
    """Batched synthesis sharded over the 'data' axis is bit-compatible
    with the single-device program (same global ops, partitioned by XLA)."""
    from gradtts_tpu.models import synthesize
    from gradtts_tpu.parallel.mesh import batch_sharding

    cfg = get_config('ljspeech', **TINY)
    model = GradTTS.from_config(cfg)
    B, TX, BUDGET = 8, 12, 64
    rng = np.random.default_rng(0)
    x = np.asarray(rng.integers(1, cfg.n_vocab, (B, TX)), np.int32)
    xl = np.full((B,), TX, np.int32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(xl),
        jnp.zeros((B, 8, cfg.data.n_feats)), np.full((B,), 8, np.int32),
        None)

    def fn(params, x, xl, key):
        res = synthesize(model, params, x, xl, n_timesteps=4,
                         y_max_length=BUDGET, key=key)
        return res.decoder_outputs, res.y_lengths

    key = jax.random.PRNGKey(3)
    dec1, len1 = jax.jit(fn)(params, x, xl, key)

    mesh = make_mesh(data=8, model=1)
    with mesh:
        shard = batch_sharding(mesh)
        xs = jax.device_put(x, shard(x))
        xls = jax.device_put(xl, shard(xl))
        ps = jax.device_put(params, replicated(mesh))
        dec8, len8 = jax.jit(fn)(ps, xs, xls, key)

    np.testing.assert_array_equal(np.asarray(len1), np.asarray(len8))
    # partitioned reductions reassociate float adds; tolerance covers that
    np.testing.assert_allclose(np.asarray(dec1), np.asarray(dec8),
                               rtol=1e-3, atol=1e-3)


def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
