"""End-to-end train() smoke test on a real (tiny) dataset: epoch-end
synthesis previews (TB images + PNGs, parity: /root/reference/train.py:
88-94, 151-172), checkpointing, and resume through the public loop."""

import os

import numpy as np

from gradtts_tpu.config import get_config

CMUDICT = os.path.join(os.path.dirname(__file__), '..', 'resources',
                       'cmu_dictionary')


def _write_wav(path, sr=22050, seconds=0.6, seed=0):
    from scipy.io import wavfile
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)
           + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))


def _tiny_cfg(tmp_path, n_items=3):
    for i in range(n_items):
        _write_wav(str(tmp_path / f'{i}.wav'), seconds=0.4 + 0.1 * i, seed=i)
    filelist = tmp_path / 'list.txt'
    filelist.write_text('\n'.join(
        f'{tmp_path}/{i}.wav|hello world number {i}'
        for i in range(n_items)))
    return get_config('ljspeech', **{
        'data.train_filelist_path': str(filelist),
        'data.cmudict_path': CMUDICT,
        'data.x_buckets': (64,),
        'data.y_buckets': (64,),
        'encoder.n_enc_channels': 16,
        'encoder.filter_channels': 32,
        'encoder.filter_channels_dp': 32,
        'encoder.n_enc_layers': 1,
        'decoder.dec_dim': 8,
        'train.batch_size': 2,
        'train.test_size': 2,
        'train.use_bf16_compute': False,
        'train.seed': 0,
        'train.log_dir': str(tmp_path / 'logs'),
    })


def test_train_with_synthesis_previews(tmp_path):
    import jax
    from gradtts_tpu.parallel.mesh import make_mesh
    from gradtts_tpu.train.loop import train

    cfg = _tiny_cfg(tmp_path)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    log_dir = str(tmp_path / 'logs')
    state = train(cfg, n_epochs=1, max_steps=1, log_dir=log_dir, mesh=mesh,
                  synthesis_every_epoch=True)
    assert int(state.step) == 1

    # ground-truth plots at start + per-epoch enc/dec/alignment plots
    for i in range(cfg.train.test_size):
        for stem in ('original', 'generated_enc', 'generated_dec',
                     'alignment'):
            path = os.path.join(log_dir, f'{stem}_{i}.png')
            assert os.path.exists(path), path
    # train.log epoch line written
    with open(os.path.join(log_dir, 'train.log')) as f:
        assert 'epoch 0' in f.read()

    # resume picks up the checkpoint written at epoch end
    state2 = train(cfg, n_epochs=1, max_steps=1, log_dir=log_dir, mesh=mesh,
                   synthesis_every_epoch=False)
    assert int(state2.step) == 2


def test_train_with_device_mel_pipeline(tmp_path):
    """train.device_mel=True: the loader fetches raw audio and extracts
    mels on the accelerator (DeviceMelCollate); the train step consumes
    the device-resident y without a host round trip."""
    import jax
    from gradtts_tpu.parallel.mesh import make_mesh
    from gradtts_tpu.train.loop import train

    cfg = _tiny_cfg(tmp_path)
    cfg = get_config('ljspeech', **{  # rebuild with the flag set
        'data.train_filelist_path': cfg.data.train_filelist_path,
        'data.cmudict_path': CMUDICT,
        'data.x_buckets': (64,), 'data.y_buckets': (64,),
        'encoder.n_enc_channels': 16, 'encoder.filter_channels': 32,
        'encoder.filter_channels_dp': 32, 'encoder.n_enc_layers': 1,
        'decoder.dec_dim': 8, 'train.batch_size': 2, 'train.test_size': 2,
        'train.use_bf16_compute': False, 'train.seed': 0,
        'train.log_dir': str(tmp_path / 'logs_dm'),
        'train.device_mel': True,
    })
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    state = train(cfg, n_epochs=1, max_steps=1,
                  log_dir=str(tmp_path / 'logs_dm'), mesh=mesh,
                  synthesis_every_epoch=False)
    assert int(state.step) == 1
