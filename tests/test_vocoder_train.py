"""Vocoder training subsystem: MelDataset parity behaviors + one GAN step.

Dataset parity target: /root/reference/hifi-gan/meldataset.py:88-170
(segment cropping, peak normalization, fmax/fmax_loss mels, fine-tuning
crops). Train-step: a tiny HiFi-GAN config runs one jitted GAN update and
every loss is finite and the generator actually moves.
"""

import os
import wave

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from gradtts_tpu.data.vocoder_dataset import (  # noqa: E402
    VocoderBatchCollate, VocoderMelDataset, vocoder_filelists,
)
from gradtts_tpu.models.hifigan import HiFiGANConfig  # noqa: E402
from gradtts_tpu.train.vocoder import (  # noqa: E402
    init_vocoder_state, make_vocoder_optimizer, make_vocoder_train_step,
)

SR = 22050


def _write_wav(path, n_samples, seed=0):
    rng = np.random.default_rng(seed)
    data = (rng.uniform(-0.5, 0.5, n_samples) * 32767).astype(np.int16)
    with wave.open(path, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(data.tobytes())


@pytest.fixture
def wav_dir(tmp_path):
    d = tmp_path / 'wavs'
    d.mkdir()
    for i, n in enumerate((SR, 4000)):  # one long, one shorter than segment
        _write_wav(str(d / f'utt{i}.wav'), n, seed=i)
    return str(d)


def test_filelists_and_dataset_shapes(wav_dir, tmp_path):
    fl = tmp_path / 'train.txt'
    fl.write_text('utt0|some text\nutt1|more text\n')
    train, valid = vocoder_filelists(str(fl), str(fl), wav_dir)
    assert len(train) == 2 and train[0].endswith('utt0.wav')

    ds = VocoderMelDataset(train, segment_size=8192, shuffle=False)
    frames = 8192 // 256
    for i in range(len(ds)):
        item = ds[i]
        assert item['audio'].shape == (8192,)
        assert item['mel'].shape == (frames, 80)
        assert item['mel_loss'].shape == (frames, 80)
        # peak-normalized to 0.95 (long file; short one is zero-padded)
        assert np.max(np.abs(item['audio'])) <= 0.95 + 1e-6

    batch = VocoderBatchCollate()([ds[0], ds[1]])
    assert batch['audio'].shape == (2, 8192)
    assert batch['mel'].shape == (2, frames, 80)


def test_dataset_fmax_loss_differs_from_input_mel(wav_dir):
    files = [os.path.join(wav_dir, 'utt0.wav')]
    ds = VocoderMelDataset(files, segment_size=8192, shuffle=False)
    item = ds[0]
    # input mel uses fmax 8000, loss mel fmax sr/2 -> different filterbanks
    assert not np.allclose(item['mel'], item['mel_loss'])


def test_fine_tuning_crop_consistency(wav_dir, tmp_path):
    from gradtts_tpu.data.dataset import load_wav
    from gradtts_tpu.data.mel import mel_spectrogram_np
    path = os.path.join(wav_dir, 'utt0.wav')
    audio, _ = load_wav(path)
    mel = mel_spectrogram_np(audio[None])[0].T  # [M, F] channel-major dump
    mel_dir = tmp_path / 'mels'
    mel_dir.mkdir()
    np.save(str(mel_dir / 'utt0.npy'), mel)

    ds = VocoderMelDataset([path], segment_size=8192, shuffle=False,
                           fine_tuning=True, base_mels_path=str(mel_dir),
                           seed=3)
    item = ds[0]
    frames = 8192 // 256
    assert item['mel'].shape == (frames, 80)
    assert item['audio'].shape == (8192,)
    # the cropped generator mel matches the mel of the cropped audio
    # (same frames modulo edge padding of the STFT)
    recomputed = mel_spectrogram_np(item['audio'][None])[0]
    assert np.allclose(item['mel'][2:-2], recomputed[2:-2], atol=2e-1)


TINY = HiFiGANConfig(
    resblock='1', upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    upsample_initial_channel=16, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),), num_mels=80, sampling_rate=SR)


def test_gan_train_step_runs_and_learns():
    segment = 1024  # 64 frames * hop 16
    gen_opt = make_vocoder_optimizer(2e-4, steps_per_epoch=10)
    disc_opt = make_vocoder_optimizer(2e-4, steps_per_epoch=10)
    state = init_vocoder_state(jax.random.PRNGKey(0), TINY, segment,
                               gen_opt, disc_opt)

    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.9, 0.9, (2, segment)).astype(np.float32)
    from gradtts_tpu.data.mel import mel_spectrogram_np
    kw = dict(n_fft=64, hop_size=16, win_size=64, sampling_rate=SR)
    mel = mel_spectrogram_np(audio, num_mels=80, **kw)
    batch = {'mel': mel, 'audio': audio, 'mel_loss': mel}

    step_fn = make_vocoder_train_step(TINY, gen_opt, disc_opt,
                                      n_fft=64, hop_size=16, win_size=64)
    jit_step = jax.jit(step_fn)
    before = jax.tree_util.tree_leaves(state.gen_params)[0].copy()
    state, metrics = jit_step(state, batch)
    state, metrics = jit_step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    assert int(state.step) == 2
    after = jax.tree_util.tree_leaves(state.gen_params)[0]
    assert not np.allclose(before, after)
    assert float(metrics['loss/gen_mel']) > 0
