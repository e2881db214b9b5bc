"""Dataset prep: SPH reader/segmenter, TED-LIUM STM pipeline, profiling
helpers, plotting."""

import os
import struct

import numpy as np
import pytest


FS = 16000


def _write_sph(path, data_i16, sr=FS, byte_format='01'):
    header_size = 1024
    fields = (f'sample_rate -i {sr}\n'
              f'channel_count -i 1\n'
              f'sample_n_bytes -i 2\n'
              f'sample_count -i {len(data_i16)}\n'
              f'sample_byte_format -s{len(byte_format)} {byte_format}\n'
              'sample_coding -s3 pcm\n'
              'end_head\n')
    head = f'NIST_1A\n{header_size:8d}\n{fields}'.encode('ascii')
    head = head + b' ' * (header_size - len(head))
    dtype = '<i2' if byte_format == '01' else '>i2'
    with open(path, 'wb') as f:
        f.write(head)
        f.write(np.asarray(data_i16, dtype).tobytes())


def test_sph_roundtrip(tmp_path):
    from gradtts_tpu.data.sph import read_sph
    t = np.arange(FS) / FS
    wav = (0.5 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    path = str(tmp_path / 'a.sph')
    _write_sph(path, wav)
    data, sr = read_sph(path)
    assert sr == FS and data.shape == (FS,)
    np.testing.assert_allclose(data, wav.astype(np.float32) / 32768.0,
                               atol=1e-6)
    # big-endian variant
    _write_sph(path, wav, byte_format='10')
    data_be, _ = read_sph(path)
    np.testing.assert_allclose(data_be, data, atol=1e-6)


def test_sph_segment_to_wav(tmp_path):
    from gradtts_tpu.data.dataset import load_wav
    from gradtts_tpu.data.sph import sph_segment_to_wav
    wav = (np.linspace(-0.5, 0.5, 2 * FS) * 32767).astype(np.int16)
    sph = str(tmp_path / 'b.sph')
    _write_sph(sph, wav)
    out = str(tmp_path / 'seg.wav')
    sph_segment_to_wav(sph, out, 0.5, 1.0)
    data, sr = load_wav(out)
    assert sr == FS and data.shape == (FS // 2,)
    np.testing.assert_allclose(
        data, wav[FS // 2:FS].astype(np.float32) / 32768.0, atol=2e-4)


def test_tedlium_prepare_pipeline(tmp_path):
    """segment + filelist subcommands end-to-end on a synthetic corpus."""
    from gradtts_tpu.cli.prepare import main as prepare_main

    sph_dir = tmp_path / 'sph'
    stm_dir = tmp_path / 'stm'
    wav_dir = tmp_path / 'wav'
    sph_dir.mkdir()
    stm_dir.mkdir()
    t = np.arange(4 * FS) / FS
    wav = (0.4 * np.sin(2 * np.pi * 200 * t) * 32767).astype(np.int16)
    _write_sph(str(sph_dir / 'AlGore_2009.sph'), wav)
    (stm_dir / 'AlGore_2009.stm').write_text(
        'AlGore_2009 1 AlGore 0.50 1.50 <o,f0,male> hello there world\n'
        'AlGore_2009 1 AlGore 2.00 3.00 <o,f0,male> ignore_time_segment_in_scoring\n'
        'AlGore_2009 1 AlGore 3.00 3.80 <o,f0,male> good morning\n')

    prepare_main(['tedlium-segment', '--sph-dir', str(sph_dir),
                  '--stm-dir', str(stm_dir), '--out-dir', str(wav_dir)])
    wavs = sorted(f for f in os.listdir(wav_dir) if f.endswith('.wav'))
    assert len(wavs) == 2      # the ignore_time_segment line is dropped
    assert (wav_dir / 'speaker_dict.txt').exists()

    filelist = tmp_path / 'train.txt'
    prepare_main(['tedlium-filelist', '--stm-dir', str(stm_dir),
                  '--wav-dir', str(wav_dir), '--speaker-dict',
                  str(wav_dir / 'speaker_dict.txt'), '--out', str(filelist),
                  '--require-wav'])
    lines = filelist.read_text().strip().splitlines()
    assert len(lines) == 2
    wav_path, text, spk = lines[0].split('|')
    assert os.path.exists(wav_path)
    assert text == 'hello there world'
    assert spk == '1'


def test_throughput_counters():
    from gradtts_tpu.utils.profiling import Throughput
    tp = Throughput(sample_rate=16000, hop_length=256)
    tp.start()
    tp.add(frames=1600, items=2)   # 1600*256/16000 = 25.6 audio-sec
    tp.stop()
    s = tp.summary()
    assert s['audio_seconds'] == pytest.approx(25.6)
    assert s['items'] == 2
    assert s['audio_sec_per_sec'] > 0
    assert s['rtf'] == pytest.approx(s['elapsed_s'] / 25.6)


def test_time_jitted_blocks():
    import jax
    import jax.numpy as jnp
    from gradtts_tpu.utils.profiling import time_jitted

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((64, 64))
    stats = time_jitted(f, x, iters=3, warmup=1)
    assert stats['min_s'] > 0
    assert float(stats['last_output']) == pytest.approx(64 * 64 * 64)


def test_save_plot_and_plot_tensor(tmp_path):
    from gradtts_tpu.utils.plotting import plot_tensor, save_plot
    mat = np.random.default_rng(0).standard_normal((80, 100))
    img = plot_tensor(mat)
    assert img.ndim == 3 and img.shape[2] == 3
    out = str(tmp_path / 'spec.png')
    save_plot(mat, out)
    assert os.path.getsize(out) > 0
