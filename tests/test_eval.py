"""Objective evaluation: YIN F0, DTW, mcep, metric formulas, MCD tool."""

import os

import numpy as np
import pytest

from gradtts_tpu.eval import (
    align, dtw_path, evaluate_pair, f0_frame_error, gross_pitch_error,
    log_f0_rmse, mcd, mcep_from_waveform, voicing_decision_error,
    warp_frequency, yin_f0, evaluate_mcd_dirs,
)

FS = 16000


def _tone(f0, seconds=0.5, fs=FS, amp=0.3):
    t = np.arange(int(seconds * fs)) / fs
    return amp * np.sin(2 * np.pi * f0 * t)


# --- YIN -------------------------------------------------------------------


def test_yin_pure_tone():
    for f0 in (110.0, 220.0, 330.0):
        track = yin_f0(_tone(f0), FS)
        voiced = track[track > 0]
        assert voiced.size > 0.8 * track.size
        np.testing.assert_allclose(np.median(voiced), f0, rtol=0.02)


def test_yin_silence_is_unvoiced():
    track = yin_f0(np.zeros(8000), FS)
    assert np.all(track == 0)


def test_yin_noise_mostly_unvoiced():
    rng = np.random.default_rng(0)
    track = yin_f0(rng.standard_normal(8000) * 0.1, FS)
    assert np.mean(track > 0) < 0.35


def test_yin_voiced_unvoiced_boundary():
    x = np.concatenate([_tone(220, 0.3), np.zeros(FS // 4)])
    track = yin_f0(x, FS)
    third = len(track) // 3
    assert np.mean(track[:third] > 0) > 0.8
    assert np.mean(track[-third:] > 0) < 0.2


# --- DTW -------------------------------------------------------------------


def test_dtw_identity():
    a = np.random.default_rng(0).standard_normal((10, 3))
    cost, path = dtw_path(a, a)
    assert cost == pytest.approx(0.0, abs=1e-6)
    assert path == [(i, i) for i in range(10)]


def test_dtw_shift_alignment():
    a = np.array([[0.], [0.], [1.], [2.], [3.]])
    b = np.array([[0.], [1.], [2.], [3.]])
    cost, path = dtw_path(a, b)
    assert cost == pytest.approx(0.0)
    ai, bi = np.array(path).T
    # aligned values must match exactly
    np.testing.assert_array_equal(a[ai], b[bi])


def test_dtw_monotone_and_complete():
    rng = np.random.default_rng(1)
    a, b = rng.standard_normal((12, 2)), rng.standard_normal((7, 2))
    _, path = dtw_path(a, b)
    ai, bi = np.array(path).T
    assert path[0] == (0, 0) and path[-1] == (11, 6)
    assert np.all(np.diff(ai) >= 0) and np.all(np.diff(bi) >= 0)
    assert np.all((np.diff(ai) + np.diff(bi)) >= 1)


# --- mcep ------------------------------------------------------------------


def test_warp_frequency_endpoints_and_inverse():
    om = np.linspace(0, np.pi, 50)
    w = warp_frequency(om, 0.42)
    assert w[0] == pytest.approx(0.0)
    assert w[-1] == pytest.approx(np.pi)
    assert np.all(np.diff(w) > 0)
    np.testing.assert_allclose(warp_frequency(w, -0.42), om, atol=1e-9)


def test_mcep_shapes_and_sensitivity():
    x = _tone(220)
    mc = mcep_from_waveform(x, FS, n_fft=512, n_shift=256, order=23,
                            alpha=0.42)
    assert mc.shape == ((len(x) - 512) // 256 + 1, 24)
    mc2 = mcep_from_waveform(_tone(440), FS, n_fft=512, n_shift=256,
                             order=23, alpha=0.42)
    # different spectra -> different cepstra
    assert np.mean(np.abs(mc.mean(0) - mc2.mean(0))) > 1e-3


def test_mcd_zero_for_identical():
    x = _tone(220)
    mc = mcep_from_waveform(x, FS)
    assert mcd(mc, mc) == pytest.approx(0.0)
    assert mcd(mc, mc, use_dtw=False) == pytest.approx(0.0)


# --- F0 metric formulas (hand values) -------------------------------------


def test_f0_metric_formulas():
    true_f = np.array([100.0, 100.0, 0.0, 200.0, 0.0])
    est_f = np.array([100.0, 150.0, 50.0, 0.0, 0.0])
    # both-voiced frames: idx 0, 1; gross errors among them: idx 1 (50% off)
    assert gross_pitch_error(true_f, est_f) == pytest.approx(1 / 2)
    # voicing mismatches: idx 2 (est voiced), idx 3 (est unvoiced) -> 2/5
    assert voicing_decision_error(true_f, est_f) == pytest.approx(2 / 5)
    # ffe = (gpe_frames + vde_frames) / len = (1 + 2)/5
    assert f0_frame_error(true_f, est_f) == pytest.approx(3 / 5)
    # log rmse over both-voiced frames 0,1
    expected = np.sqrt(np.mean([0.0, (np.log(150) - np.log(100)) ** 2]))
    assert log_f0_rmse(true_f, est_f) == pytest.approx(expected)


# --- end-to-end pair evaluation -------------------------------------------


def test_evaluate_pair_self_is_perfect():
    x = _tone(220, 0.6)
    m = evaluate_pair(x, x, FS)
    assert m['mcd'] == pytest.approx(0.0, abs=1e-9)
    assert m['log_f0_rmse'] == pytest.approx(0.0, abs=1e-9)
    assert m['gpe'] == 0.0 and m['vde'] == 0.0 and m['ffe'] == 0.0


def test_evaluate_pair_detects_pitch_shift():
    a = _tone(200, 0.6)
    b = _tone(300, 0.6)
    m = evaluate_pair(a, b, FS)
    assert m['gpe'] > 0.5                      # 50% off >> 20% band
    expected = abs(np.log(200) - np.log(300))
    assert m['log_f0_rmse'] == pytest.approx(expected, rel=0.1)
    assert m['mcd'] > 0.5


# --- MCD tool --------------------------------------------------------------


def test_evaluate_mcd_dirs(tmp_path):
    from scipy.io import wavfile
    gen, gt = tmp_path / 'gen', tmp_path / 'gt'
    gen.mkdir()
    gt.mkdir()
    for i, f0 in enumerate([220.0, 330.0]):
        ref = _tone(f0)
        pred = _tone(f0 * 1.01)
        wavfile.write(str(gt / f'utt{i}.wav'), FS,
                      (ref * 32767).astype(np.int16))
        wavfile.write(str(gen / f'utt{i}_gen.wav'), FS,
                      (pred * 32767).astype(np.int16))
    out = tmp_path / 'out'
    mcd_dict = evaluate_mcd_dirs(str(gen), str(gt), outdir=str(out), nj=2,
                                 n_fft=512, n_shift=256)
    assert sorted(mcd_dict) == ['utt0', 'utt1']
    assert all(np.isfinite(v) and v >= 0 for v in mcd_dict.values())
    utt2mcd = (out / 'utt2mcd').read_text().strip().splitlines()
    assert len(utt2mcd) == 2 and utt2mcd[0].startswith('utt0 ')
    assert (out / 'mcd_avg_result.txt').exists()


def test_evaluate_mcd_dirs_world_backend(tmp_path):
    """The standalone MCD tool's 'world' backend (SPTK mel-cepstral
    analysis, the reference tool's extractor) runs end-to-end through the
    directory driver and the CLI flag."""
    from scipy.io import wavfile
    gen, gt = tmp_path / 'gen', tmp_path / 'gt'
    gen.mkdir()
    gt.mkdir()
    ref = _tone(220.0, 0.4)
    pred = _tone(220.0 * 1.03, 0.4)
    wavfile.write(str(gt / 'u.wav'), FS, (ref * 32767).astype(np.int16))
    wavfile.write(str(gen / 'u_gen.wav'), FS,
                  (pred * 32767).astype(np.int16))
    out = tmp_path / 'out'
    mcd_dict = evaluate_mcd_dirs(str(gen), str(gt), outdir=str(out), nj=1,
                                 n_fft=512, n_shift=256, backend='world')
    assert np.isfinite(mcd_dict['u']) and mcd_dict['u'] > 0
    from gradtts_tpu.eval.mcd_tool import mcd_for_pair
    same = mcd_for_pair(str(gen / 'u_gen.wav'), str(gen / 'u_gen.wav'),
                        n_fft=512, n_shift=256, backend='world')
    assert same == pytest.approx(0.0, abs=1e-9)
    with pytest.raises(ValueError):
        mcd_for_pair(str(gen / 'u_gen.wav'), str(gt / 'u.wav'),
                     backend='nope')
    from gradtts_tpu.cli.evaluate_mcd import main as mcd_main
    mcd_main([str(gen), str(gt), '--outdir', str(out), '--nj', '1',
              '--n_fft', '512', '--n_shift', '256',
              '--dsp-backend', 'world'])
    assert (out / 'utt2mcd').exists()


# --- golden-value regression guard (committed fixtures) --------------------

FIXTURES = os.path.join(os.path.dirname(__file__), 'fixtures')


def test_dsp_golden_values():
    """Frozen YIN/mcep/metric outputs for the committed fixture wavs: any
    change to the built-in DSP (eval/f0.py, eval/mcep.py, eval/metrics.py)
    that shifts numbers must be deliberate and re-freeze these values
    (regenerate via the script in this test's git history)."""
    from gradtts_tpu.data.dataset import load_wav
    golden = np.load(os.path.join(FIXTURES, 'eval_golden.npz'))
    a, fs = load_wav(os.path.join(FIXTURES, 'eval_a.wav'))
    b, _ = load_wav(os.path.join(FIXTURES, 'eval_b.wav'))

    np.testing.assert_allclose(
        yin_f0(a, fs, frame_length=512, hop=256), golden['f0_a'],
        rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(
        yin_f0(b, fs, frame_length=512, hop=256), golden['f0_b'],
        rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(mcep_from_waveform(a, fs), golden['mcep_a'],
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(mcep_from_waveform(b, fs), golden['mcep_b'],
                               rtol=1e-10, atol=1e-10)

    names = [str(n) for n in golden['metric_names']]
    m_ab = evaluate_pair(a, b, fs, backend='yin')
    np.testing.assert_allclose([m_ab[k] for k in names],
                               golden['metrics_ab'], rtol=1e-8)
    m_aa = evaluate_pair(a, a, fs, backend='yin')
    np.testing.assert_allclose([m_aa[k] for k in names],
                               golden['metrics_aa'], rtol=1e-8, atol=1e-12)


def test_dsp_backend_selection():
    from gradtts_tpu.data.dataset import load_wav
    from gradtts_tpu.eval.world import world_available
    a, fs = load_wav(os.path.join(FIXTURES, 'eval_a.wav'))
    with pytest.raises(ValueError):
        evaluate_pair(a, a, fs, backend='nope')
    # 'auto' resolves to whichever backend this environment has
    m = evaluate_pair(a, a, fs, backend='auto')
    assert m['mcd'] == pytest.approx(0.0, abs=1e-8)


def test_world_backend_reference_comparable():
    """The 'world' backend (WORLD harvest + CheapTrick + SPTK mcep — the
    reference toolchain's extractors) executes everywhere: through
    pyworld/pysptk when installed, else through the from-scratch numpy
    implementations in eval/worldnp.py.  Either way self-comparison is
    exactly zero and distinct audio separates."""
    from gradtts_tpu.data.dataset import load_wav
    a, fs = load_wav(os.path.join(FIXTURES, 'eval_a.wav'))
    b, _ = load_wav(os.path.join(FIXTURES, 'eval_b.wav'))
    m_aa = evaluate_pair(a, a, fs, backend='world')
    assert m_aa['mcd'] == pytest.approx(0.0, abs=1e-6)
    assert m_aa['log_f0_rmse'] == pytest.approx(0.0, abs=1e-9)
    assert m_aa['gpe'] == 0.0 and m_aa['vde'] == 0.0 and m_aa['ffe'] == 0.0
    m_ab = evaluate_pair(a, b, fs, backend='world')
    assert m_ab['mcd'] > 0.5 and m_ab['log_f0_rmse'] > 0.05


def test_world_golden_values():
    """Frozen outputs of the from-scratch WORLD/SPTK backend
    (eval/worldnp.py) on the committed fixture wavs: any change that
    shifts harvest F0 tracks, mcep tracks, or metrics must be deliberate
    and re-freeze these values (regenerate via
    tools/freeze_world_golden.py).  Complements tests/test_worldnp.py's
    ground-truth accuracy suite with an exact regression pin."""
    from gradtts_tpu.data.dataset import load_wav
    from gradtts_tpu.eval.world import sptk_mcep, world_extract
    golden = np.load(os.path.join(FIXTURES, 'world_golden.npz'))
    a, fs = load_wav(os.path.join(FIXTURES, 'eval_a.wav'))
    b, _ = load_wav(os.path.join(FIXTURES, 'eval_b.wav'))

    mc_a, f0_a = world_extract(a, fs, impl='numpy')
    _, f0_b = world_extract(b, fs, impl='numpy')
    np.testing.assert_array_equal(f0_a > 0, golden['f0_a'] > 0)
    np.testing.assert_allclose(f0_a, golden['f0_a'], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(f0_b, golden['f0_b'], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(mc_a, golden['mcep_f0_a'], rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(sptk_mcep(a, fs, impl='numpy'),
                               golden['sptk_mcep_a'], rtol=1e-5, atol=1e-7)
    m_ab = evaluate_pair(a, b, fs, backend='world')
    names = [str(n) for n in golden['metric_names']]
    np.testing.assert_allclose([m_ab[k] for k in names],
                               golden['metrics_ab'], rtol=1e-6)


def test_world_numpy_crosschecks_pyworld():
    """Where pyworld/pysptk ARE installed, the numpy re-implementations
    must agree with the C libraries on the fixture audio: same voicing
    decisions on >=85% of frames, median voiced F0 within 1%, and SPTK
    mcep tracks close enough that the MCD between the two implementations'
    cepstra of the SAME audio is far below a real inter-audio MCD.
    Skipped only where the C libraries are absent (the numpy side is then
    covered by tests/test_worldnp.py's ground-truth suite)."""
    from gradtts_tpu.eval.world import world_available
    if not world_available():
        pytest.skip('pyworld/pysptk not installed in this environment')
    from gradtts_tpu.data.dataset import load_wav
    from gradtts_tpu.eval.world import sptk_mcep, world_extract
    a, fs = load_wav(os.path.join(FIXTURES, 'eval_a.wav'))
    mc_c, f0_c = world_extract(a, fs, impl='pyworld')
    mc_n, f0_n = world_extract(a, fs, impl='numpy')
    n = min(len(f0_c), len(f0_n))
    agree = np.mean((f0_c[:n] > 0) == (f0_n[:n] > 0))
    assert agree >= 0.85
    both = (f0_c[:n] > 0) & (f0_n[:n] > 0)
    if both.any():
        assert (np.median(f0_n[:n][both])
                == pytest.approx(np.median(f0_c[:n][both]), rel=0.01))
    m_c = sptk_mcep(a, fs, impl='pyworld')
    m_n = sptk_mcep(a, fs, impl='numpy')
    assert mcd(m_n, m_c) < 1.0  # same audio, two impls: near-identical
