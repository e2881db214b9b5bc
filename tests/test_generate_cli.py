"""Whole-split batch generation: the generate CLI must synthesize EVERY
test utterance (parity: /root/reference/generate.py:66-99 — torch DataLoader
default drop_last=False), padding the tail batch to the full static batch
size (masked rows, not emitted) instead of dropping it or compiling a second
small-batch program."""

import os

import numpy as np
import pytest

from gradtts_tpu.config import get_config

CMUDICT = os.path.join(os.path.dirname(__file__), '..', 'resources',
                       'cmu_dictionary')

TINY = {
    'data.cmudict_path': CMUDICT,
    'data.x_buckets': (64,),
    'data.y_buckets': (64,),
    'encoder.n_enc_channels': 16,
    'encoder.filter_channels': 32,
    'encoder.filter_channels_dp': 32,
    'encoder.n_enc_layers': 1,
    'decoder.dec_dim': 8,
}


def _write_wav(path, sr=22050, seconds=0.4, seed=0):
    from scipy.io import wavfile
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)
           + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))


@pytest.fixture(scope='module')
def dataset_and_ckpt(tmp_path_factory):
    """19-item filelist + a .npz checkpoint for the tiny architecture."""
    tmp_path = tmp_path_factory.mktemp('gen')
    n_items = 19
    for i in range(n_items):
        _write_wav(str(tmp_path / f'{i}.wav'), seconds=0.3 + 0.02 * i, seed=i)
    filelist = tmp_path / 'list.txt'
    filelist.write_text('\n'.join(
        f'{tmp_path}/{i}.wav|item number {i}' for i in range(n_items)))

    import jax
    import jax.numpy as jnp
    from gradtts_tpu.models import GradTTS
    from gradtts_tpu.utils.io import save_params_npz

    cfg = get_config('ljspeech', **TINY)
    model = GradTTS.from_config(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
        jnp.zeros((1, 8, cfg.data.n_feats)), jnp.array([8]), None)
    ckpt = str(tmp_path / 'params.npz')
    save_params_npz(ckpt, params)
    return str(filelist), ckpt, n_items


def _run_generate(out_dir, filelist, ckpt, extra=()):
    from gradtts_tpu.cli.generate import main
    main(['-o', out_dir, '-c', ckpt, '-t', '2', '--preset', 'ljspeech',
          '--split', 'test', '--batch-size', '8', '--cpu',
          '--set', f'data.test_filelist_path={filelist}',
          *[f'{k}={v}' for k, v in TINY.items()], *extra])
    outputs = []
    for batch_dir in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, batch_dir)
        outputs += [os.path.join(full, f) for f in os.listdir(full)
                    if f.endswith('.npy')]
    return outputs


def test_generate_covers_whole_split(dataset_and_ckpt, tmp_path):
    filelist, ckpt, n_items = dataset_and_ckpt
    outputs = _run_generate(str(tmp_path / 'out'), filelist, ckpt)
    # 19 items at batch 8 -> 2 full batches + a 3-item tail, all emitted
    assert len(outputs) == n_items
    for f in outputs:
        mel = np.load(f)
        assert mel.ndim == 2 and mel.shape[1] == 80
        assert np.isfinite(mel).all()


def test_generate_sharded_covers_whole_split(dataset_and_ckpt, tmp_path):
    """Data-parallel synthesis over a 2-device mesh emits the same count
    (the tail batch is padded to batch_size, so divisibility by the mesh
    holds for every batch; fused attention is pinned off under sharding)."""
    filelist, ckpt, n_items = dataset_and_ckpt
    outputs = _run_generate(str(tmp_path / 'out_sharded'), filelist, ckpt,
                            extra=['--mesh-data', '2'])
    assert len(outputs) == n_items


def test_sharded_synthesize_with_fused_attention_matches_single_device():
    """shard_map'd synthesis over an 8-device ('data',) mesh WITH the
    Pallas fused-attention kernel enabled (interpret mode on CPU) agrees
    with the single-device fused run — the kernel is legal per-shard under
    shard_map (it has no GSPMD partitioning rule), and the externally
    drawn, batch-sharded noise makes the output mesh-size-invariant."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from gradtts_tpu.models import GradTTS, synthesize
    from gradtts_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

    cfg = get_config('ljspeech', **TINY)
    model = GradTTS.from_config(cfg)
    B, TX, Y = 8, 12, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, cfg.n_vocab, (B, TX)), jnp.int32)
    xl = jnp.full((B,), TX, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, xl,
                        jnp.zeros((B, 8, cfg.data.n_feats)),
                        jnp.full((B,), 8, jnp.int32), None)
    key = jax.random.PRNGKey(1)
    noise = jax.random.normal(key, (B, Y, cfg.data.n_feats), jnp.float32)

    def fn(params, x, xl, key, noise):
        return synthesize(model, params, x, xl, n_timesteps=2,
                          y_max_length=Y, key=key, noise=noise,
                          fused_attention=True)

    single = fn(params, x, xl, key, noise)

    mesh = make_mesh(8, 1)
    shard = batch_sharding(mesh)
    mapped = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(P(), P('data'), P('data'), P(), P('data')),
        out_specs=P('data')))
    sharded = mapped(
        jax.device_put(params, replicated(mesh)),
        jax.device_put(x, shard(x)), jax.device_put(xl, shard(xl)),
        key, jax.device_put(noise, shard(noise)))

    np.testing.assert_allclose(np.asarray(sharded.decoder_outputs),
                               np.asarray(single.decoder_outputs),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(sharded.y_lengths),
                                  np.asarray(single.y_lengths))
