"""Mel front-end parity vs the reference torch pipeline + dataset/collate."""

import os

import numpy as np
import pytest

from gradtts_tpu.data.mel import (
    mel_filterbank, mel_spectrogram, mel_spectrogram_np,
    hann_window_periodic,
)
from gradtts_tpu.data.dataset import (
    BatchCollate, DataLoader, TextMelDataset, TextMelSpeakerDataset,
    bucket_length, load_wav, transform_txt, wav_header,
)

CMUDICT = os.path.join(os.path.dirname(__file__), '..', 'resources',
                       'cmu_dictionary')


def _ref_mel(audio):
    """Reference mel pipeline (data.py:68-91) with our filterbank in place
    of librosa's (librosa itself is absent; filterbank parity is asserted
    separately against its published slaney formula via golden values)."""
    import torch
    y = torch.tensor(audio, dtype=torch.float32)
    n_fft, hop, win = 1024, 256, 1024
    y = torch.nn.functional.pad(
        y.unsqueeze(1), (int((n_fft - hop) / 2), int((n_fft - hop) / 2)),
        mode='reflect').squeeze(1)
    spec = torch.stft(y, n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win), center=False,
                      pad_mode='reflect', normalized=False, onesided=True,
                      return_complex=True)
    mag = torch.abs(spec)
    basis = torch.tensor(mel_filterbank(22050, 1024, 80, 0.0, 8000.0))
    mel = torch.matmul(basis, mag)
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()


def test_hann_window_matches_torch():
    import torch
    np.testing.assert_allclose(hann_window_periodic(1024),
                               torch.hann_window(1024).numpy(), atol=5e-7)


def test_mel_filterbank_analytic():
    """Validate the slaney filterbank against scalar math done from the
    published definition (linear below 1 kHz: mel = 3f/200; log above:
    mel = 15 + 27*ln(f/1000)/ln(6.4); slaney norm 2/bandwidth)."""
    import math
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert fb[0, 0] == 0.0
    mel_max = 15.0 + 27.0 * math.log(8000.0 / 1000.0) / math.log(6.4)
    mel_step = mel_max / 81.0
    f1 = 200.0 * mel_step / 3.0           # first mel breakpoint in Hz
    f2 = 2.0 * f1
    df = 22050.0 / 2.0 / 512.0            # fft bin spacing
    enorm = 2.0 / f2
    # bin 1 sits on the rising slope of filter 0, bin 2 on the falling one
    np.testing.assert_allclose(fb[0, 1], (df / f1) * enorm, rtol=1e-5)
    np.testing.assert_allclose(fb[0, 2], ((f2 - 2 * df) / f1) * enorm,
                               rtol=1e-5)
    # the peak of filter m sits at mel breakpoint m+1
    for m in (10, 40, 79):
        f_peak_mel = (m + 1) * mel_step
        f_peak = (200.0 * f_peak_mel / 3.0 if f_peak_mel < 15.0
                  else 1000.0 * math.exp(math.log(6.4) / 27.0
                                         * (f_peak_mel - 15.0)))
        assert abs(np.argmax(fb[m]) * df - f_peak) <= df
    assert (fb >= 0).all()
    assert np.count_nonzero(fb.sum(1) > 0) == 80
    try:
        import librosa
        ref = librosa.filters.mel(sr=22050, n_fft=1024, n_mels=80,
                                  fmin=0.0, fmax=8000.0)
        np.testing.assert_allclose(fb, ref, atol=1e-6)
    except ImportError:
        pass


def test_mel_matches_reference_pipeline():
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(22050) * 0.1).astype(np.float32)[None]
    ref = _ref_mel(audio)  # [1, 80, T]
    ours = np.array(mel_spectrogram(audio))  # [1, T, 80]
    assert ours.shape[1] == ref.shape[2]
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=2e-4)
    ours_np = mel_spectrogram_np(audio)
    np.testing.assert_allclose(ours_np.transpose(0, 2, 1), ref, atol=2e-4)


def _write_wav(path, sr=22050, seconds=0.6, seed=0):
    from scipy.io import wavfile
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)
           + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))
    return wav


def test_load_wav_roundtrip(tmp_path):
    p = str(tmp_path / 'a.wav')
    wav = _write_wav(p)
    loaded, sr = load_wav(p)
    assert sr == 22050
    np.testing.assert_allclose(loaded, wav, atol=1e-3)


def test_dataset_and_collate(tmp_path):
    paths = []
    for i in range(3):
        p = str(tmp_path / f'{i}.wav')
        _write_wav(p, seconds=0.5 + 0.2 * i, seed=i)
        paths.append(p)
    filelist = tmp_path / 'list.txt'
    filelist.write_text('\n'.join(
        f'{p}|hello world number {i}' for i, p in enumerate(paths)))

    ds = TextMelDataset(str(filelist), CMUDICT, shuffle=False)
    item = ds[0]
    assert item['x'].dtype == np.int32
    assert item['y'].shape[-1] == 80
    assert item['x'][0] == 148  # interspersed blank

    collate = BatchCollate(x_buckets=(32, 64), y_buckets=(64, 128))
    batch = collate([ds[i] for i in range(3)])
    assert batch['x'].shape[1] in (32, 64)
    assert batch['y'].shape[1] in (64, 128)
    assert batch['y'].shape[1] % 4 == 0
    assert (batch['y_lengths'] <= batch['y'].shape[1]).all()
    # padded regions zero
    b0 = batch['y'][0]
    assert np.abs(b0[batch['y_lengths'][0]:]).max() == 0

    loader = DataLoader(ds, batch_size=2, collate=collate, shuffle=True,
                        seed=1, drop_last=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]['x'].shape[0] == 2


def test_device_mel_loader_matches_host_path(tmp_path):
    """DataLoader(device_mel=True) — raw audio batched + one jitted
    STFT+mel on the accelerator — must reproduce the host numpy pipeline:
    same bucket shapes, same y_lengths, same mel values to fft precision,
    zero tails. (The host twin computes its fft in float64 via numpy;
    the device path is float32, hence the tolerance.)"""
    paths = []
    for i in range(4):
        p = str(tmp_path / f'dm{i}.wav')
        _write_wav(p, seconds=0.4 + 0.17 * i, seed=10 + i)
        paths.append(p)
    filelist = tmp_path / 'list.txt'
    filelist.write_text('\n'.join(
        f'{p}|device mel test {i}' for i, p in enumerate(paths)))

    ds = TextMelDataset(str(filelist), CMUDICT, shuffle=False)
    collate = BatchCollate(x_buckets=(64,), y_buckets=(64, 128))
    host = list(DataLoader(ds, 4, collate, shuffle=False, drop_last=True,
                           num_workers=1))[0]
    dev = list(DataLoader(ds, 4, collate, shuffle=False, drop_last=True,
                          num_workers=1, device_mel=True))[0]
    assert host['y'].shape == dev['y'].shape
    np.testing.assert_array_equal(host['y_lengths'], dev['y_lengths'])
    np.testing.assert_array_equal(host['x'], dev['x'])
    np.testing.assert_allclose(dev['y'], host['y'], rtol=2e-3, atol=2e-3)
    for i, L in enumerate(dev['y_lengths']):
        assert np.abs(dev['y'][i, L:]).max() == 0


def test_device_mel_loader_speaker_items(tmp_path):
    p = str(tmp_path / 'sdm.wav')
    _write_wav(p)
    filelist = tmp_path / 'list.txt'
    filelist.write_text(f'{p}|hi there|7\n{p}|bye now|3')
    ds = TextMelSpeakerDataset(str(filelist), CMUDICT, shuffle=False)
    batch = list(DataLoader(ds, 2, BatchCollate(), shuffle=False,
                            num_workers=1, device_mel=True))[0]
    np.testing.assert_array_equal(batch['spk'], [7, 3])


def test_speaker_dataset(tmp_path):
    p = str(tmp_path / 's.wav')
    _write_wav(p)
    filelist = tmp_path / 'list.txt'
    filelist.write_text(f'{p}|hi there|7\n{p}|bye now|3')
    ds = TextMelSpeakerDataset(str(filelist), CMUDICT, shuffle=False)
    batch = BatchCollate()([ds[0], ds[1]])
    np.testing.assert_array_equal(batch['spk'], [7, 3])


def test_wav_header_and_item_lengths(tmp_path):
    """item_lengths must predict __getitem__'s shapes exactly — multi-host
    shape agreement (loop.py barrier signatures) is built on it."""
    paths = []
    for i in range(3):
        p = str(tmp_path / f'{i}.wav')
        wav = _write_wav(p, seconds=0.41 + 0.17 * i, seed=i)
        n, sr = wav_header(p)
        assert (n, sr) == (len(wav), 22050)
        paths.append(p)
    filelist = tmp_path / 'list.txt'
    filelist.write_text('\n'.join(
        f'{p}|some words here number {"again " * i}{i}'
        for i, p in enumerate(paths)))
    ds = TextMelDataset(str(filelist), CMUDICT, shuffle=False)
    for i in range(3):
        xl, yl = ds.item_lengths(i)
        item = ds[i]
        assert xl == item['x'].shape[-1]
        assert yl == item['y'].shape[0]


def test_sharded_loader_shapes_agree_across_hosts(tmp_path):
    """Two per-host loaders over the same dataset must collate IDENTICAL
    batch shapes even though each host's local rows have different maxima
    (ADVICE r1: shapes derived from the GLOBAL batch, not local rows)."""
    paths = []
    for i in range(8):
        p = str(tmp_path / f'{i}.wav')
        # lengths spread widely so local maxima genuinely differ per host
        _write_wav(p, seconds=0.3 + 0.15 * i, seed=i)
        paths.append(p)
    filelist = tmp_path / 'list.txt'
    filelist.write_text('\n'.join(
        f'{p}|word {"more text " * (i % 4)}{i}' for i, p in enumerate(paths)))

    def batches_for(host):
        ds = TextMelDataset(str(filelist), CMUDICT, shuffle=False)
        collate = BatchCollate(x_buckets=(16, 24, 32, 48, 64),
                               y_buckets=(32, 48, 64, 96, 128))
        loader = DataLoader(ds, batch_size=4, collate=collate, shuffle=True,
                            seed=3, num_workers=2, shard=(host, 2))
        return list(loader)

    b0, b1 = batches_for(0), batches_for(1)
    assert len(b0) == len(b1) == 2
    for a, b in zip(b0, b1):
        assert a['x'].shape == b['x'].shape
        assert a['y'].shape == b['y'].shape
        # disjoint halves of the global batch
        assert not np.array_equal(a['x_lengths'], b['x_lengths']) or \
            not np.array_equal(a['y_lengths'], b['y_lengths'])
        # provided global shapes still cover every local row
        assert (a['y_lengths'] <= a['y'].shape[1]).all()
        assert (b['y_lengths'] <= b['y'].shape[1]).all()


def test_collate_rejects_undersized_global_shapes(tmp_path):
    p = str(tmp_path / 'a.wav')
    _write_wav(p, seconds=1.0)
    filelist = tmp_path / 'list.txt'
    filelist.write_text(f'{p}|hello world')
    ds = TextMelDataset(str(filelist), CMUDICT, shuffle=False)
    with pytest.raises(ValueError, match='smaller than local'):
        BatchCollate()([ds[0]], shapes=(4, 4))


def test_transform_txt():
    assert transform_txt("Hello [noise] (um) <sil> {x} That 's IT ") == \
        "hello that's it"


def test_bucket_length():
    assert bucket_length(5, (8, 16)) == 8
    assert bucket_length(9, (8, 16)) == 16
    assert bucket_length(99, (8, 16)) == 16


def test_dataloader_caches_items_across_epochs(tmp_path):
    """Round-5 input-pipeline fix: epoch 2+ must not re-decode audio or
    re-tokenize text (the reference re-decodes every epoch) — and the
    cache must respect its byte budget."""
    paths = []
    for i in range(3):
        p = str(tmp_path / f'{i}.wav')
        _write_wav(p, seconds=0.4, seed=i)
        paths.append(p)
    filelist = tmp_path / 'list.txt'
    filelist.write_text('\n'.join(
        f'{p}|hello world number {i}' for i, p in enumerate(paths)))
    ds = TextMelDataset(str(filelist), CMUDICT, shuffle=False)

    calls = {'n': 0}
    orig = TextMelDataset.__getitem__

    class Counting(TextMelDataset):
        def __getitem__(self, i):
            calls['n'] += 1
            return orig(self, i)

    cds = Counting(str(filelist), CMUDICT, shuffle=False)
    collate = BatchCollate(x_buckets=(64,), y_buckets=(64,))
    loader = DataLoader(cds, batch_size=3, collate=collate, shuffle=False,
                        drop_last=False, num_workers=1)
    a = list(loader)
    assert calls['n'] == 3
    b = list(loader)  # second epoch: all cache hits
    assert calls['n'] == 3
    np.testing.assert_array_equal(a[0]['y'], b[0]['y'])

    # budget 0 disables caching
    calls['n'] = 0
    loader0 = DataLoader(cds, batch_size=3, collate=collate, shuffle=False,
                         drop_last=False, num_workers=1, cache_bytes=0)
    list(loader0)
    list(loader0)
    assert calls['n'] == 6

    # tiny budget: caches nothing beyond what fits
    calls['n'] = 0
    loader1 = DataLoader(cds, batch_size=3, collate=collate, shuffle=False,
                         drop_last=False, num_workers=1, cache_bytes=1)
    list(loader1)
    list(loader1)
    assert calls['n'] == 6


def test_device_mel_int16_upload_exact_for_pcm16(tmp_path):
    """upload_dtype='int16' (half the host->device bytes) must reproduce
    the float32 wire format BIT-EXACTLY for PCM16-sourced wavs: load_wav
    yields i/32768, and the collate's round(a*32768) recovers i before
    the on-device /32768 conversion."""
    paths = []
    for i in range(4):
        p = str(tmp_path / f'i16_{i}.wav')
        _write_wav(p, seconds=0.4 + 0.1 * i, seed=20 + i)
        paths.append(p)
    filelist = tmp_path / 'list.txt'
    filelist.write_text('\n'.join(
        f'{p}|int sixteen test {i}' for i, p in enumerate(paths)))
    ds = TextMelDataset(str(filelist), CMUDICT, shuffle=False)
    collate = BatchCollate(x_buckets=(64,), y_buckets=(64, 128))
    f32 = list(DataLoader(ds, 4, collate, shuffle=False, drop_last=True,
                          num_workers=1, device_mel=True))[0]
    i16 = list(DataLoader(ds, 4, collate, shuffle=False, drop_last=True,
                          num_workers=1, device_mel=True,
                          mel_upload_dtype='int16'))[0]
    np.testing.assert_array_equal(np.asarray(f32['y']),
                                  np.asarray(i16['y']))


def test_stft_dft_matches_fft_lowering():
    """The TPU-first dense windowed-DFT lowering (round 5 default) must
    reproduce the rfft lowering to f32 rounding — on both the
    chunk-sliced (S % hop == 0) and gather (ragged S) framing paths."""
    from gradtts_tpu.data.mel import stft_magnitude
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    for S in (1024 + 7 * 256, 5000):
        y = jnp.asarray(rng.standard_normal((2, S)) * 0.3, jnp.float32)
        a = np.asarray(stft_magnitude(y, method='dft'))
        b = np.asarray(stft_magnitude(y, method='fft'))
        assert a.shape == b.shape
        scale = np.abs(b).max()
        assert np.abs(a - b).max() / scale < 1e-5, S
