"""Extended benchmark suite: all five BASELINE.md benchmark configs on the
real chip. ``bench.py`` stays the driver's single-line headline; this suite
prints one JSON line PER config for the performance report.

Configs (BASELINE.md "Benchmark configs"):
  1. LJSpeech 10-step Euler mel-only synthesis        (audio_s/s/chip)
  2. LJSpeech 50-step Euler + HiFi-GAN waveform       (audio_s/s/chip)
     + vocoder-only throughput                         (x real time)
  3. Libri-TTS multispeaker batched synthesis          (audio_s/s/chip)
  4. TED-LIUM speaker-conditioned training step with
     on-device MAS in the loop                         (utt/s/chip)
  5. ODE-likelihood n-best rescoring, 10-step Euler
     Hutchinson                                        (hypotheses/s/chip)

Timing methodology is bench.py's: the tunneled backend's
``block_until_ready`` can return before execution finishes, so each
measurement chains K jitted calls ending in a scalar device->host fetch,
subtracts a fetch-only (K=1) constant, and divides by K-1. Weights are
random (throughput is weight-independent); shapes are the production
bucket shapes.
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

HOP, SR = 256, 22050


def timed_per_call(jfn, args_for, k=8):
    """Median-of-2 chained timing minus the fetch-only constant."""
    def run(kk, seed0):
        t0 = time.perf_counter()
        v = 0.0
        for i in range(kk):
            v = jfn(*args_for(seed0 + i))
        float(v)
        return time.perf_counter() - t0

    # warmup/compile + tunnel spin-up
    float(jfn(*args_for(0)))
    float(jfn(*args_for(1)))
    t1 = min(run(1, 100), run(1, 200))
    tk = min(run(k, 300), run(k, 400))
    return max((tk - t1) / (k - 1), 1e-9)


def emit(metric, value, unit, note=''):
    line = {'metric': metric, 'value': round(float(value), 3), 'unit': unit}
    if note:
        line['note'] = note
    print(json.dumps(line), flush=True)


def _init_tts(cfg, B, TX, dtype):
    from gradtts_tpu.models import GradTTS
    model = GradTTS.from_config(cfg, dtype=dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, cfg.n_vocab, size=(B, TX)), jnp.int32)
    x_lengths = jnp.full((B,), TX, jnp.int32)
    spk = (jnp.asarray(rng.integers(0, cfg.n_spks, size=(B,)), jnp.int32)
           if cfg.n_spks > 1 else None)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, x_lengths,
        jnp.zeros((B, 8, cfg.data.n_feats)), jnp.full((B,), 8, jnp.int32),
        spk)
    return model, params, x, x_lengths, spk


def bench_mel_synthesis(preset, metric, n_steps=10, B=8, TX=128, Y=768,
                        sampler='euler'):
    # B=8 is the measured v5e optimum (batch dim tiles onto 8 sublanes;
    # B=16 costs 2.09x the B=8 time) — see bench.py / PERFORMANCE.md
    from gradtts_tpu import get_config
    from gradtts_tpu.models import synthesize

    cfg = get_config(preset)
    model, params, x, x_lengths, spk = _init_tts(cfg, B, TX, jnp.bfloat16)

    def fn(params, x, x_lengths, spk, key):
        res = synthesize(model, params, x, x_lengths, n_timesteps=n_steps,
                         y_max_length=Y, key=key, spk=spk, sampler=sampler)
        return res.decoder_outputs.sum()

    jfn = jax.jit(fn)
    per_call = timed_per_call(
        jfn, lambda s: (params, x, x_lengths, spk, jax.random.PRNGKey(s)))
    emit(metric, B * Y * HOP / SR / per_call, 'audio_s/s/chip',
         f'{preset} B{B} T{Y} {n_steps}-step {sampler} bf16')


def bench_waveform(B=8, TX=128, Y=768, n_steps=50):
    from gradtts_tpu import get_config
    from gradtts_tpu.models import synthesize
    from gradtts_tpu.models.hifigan import Generator, HiFiGANConfig

    cfg = get_config('ljspeech')
    model, params, x, x_lengths, _ = _init_tts(cfg, B, TX, jnp.bfloat16)

    voc = Generator(HiFiGANConfig())
    mel0 = jnp.zeros((B, Y, 80))
    vparams = jax.jit(voc.init)(jax.random.PRNGKey(0), mel0)

    def fn(params, vparams, x, x_lengths, key):
        res = synthesize(model, params, x, x_lengths, n_timesteps=n_steps,
                         y_max_length=Y, key=key)
        wav = voc.apply(vparams, res.decoder_outputs)
        return wav.sum()

    jfn = jax.jit(fn)
    per_call = timed_per_call(
        jfn, lambda s: (params, vparams, x, x_lengths,
                        jax.random.PRNGKey(s)))
    emit('waveform_50step_euler_hifigan', B * Y * HOP / SR / per_call,
         'audio_s/s/chip', f'ljspeech B{B} T{Y} 50-step euler + vocoder')

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, Y, 80)), jnp.float32)
    for dtype, tag in ((jnp.float32, 'f32'), (jnp.bfloat16, 'bf16')):
        voc_d = Generator(HiFiGANConfig(), dtype=dtype)

        def vfn(vparams, mel, _voc=voc_d):
            return _voc.apply(vparams, mel).sum()

        per_call = timed_per_call(jax.jit(vfn), lambda s: (vparams, mel))
        emit('hifigan_vocoder_throughput_' + tag, B * Y * HOP / SR / per_call,
             'x_realtime/chip',
             f'B{B} T{Y} {tag} (V100 reference claim: 167.9x)')


def bench_train_step(B=16):
    from gradtts_tpu import get_config
    from gradtts_tpu.train.state import (
        init_state, make_optimizer, make_train_step)
    from gradtts_tpu.models import GradTTS

    cfg = get_config('tedlium-spk')
    model = GradTTS.from_config(cfg, dtype=jnp.bfloat16)
    TX, TY = 192, 344  # ~5.5 s utterances pre-crop (16 kHz, hop 256)
    rng = np.random.default_rng(0)
    batch = {
        'x': jnp.asarray(rng.integers(1, cfg.n_vocab, (B, TX)), jnp.int32),
        'x_lengths': jnp.full((B,), TX, jnp.int32),
        'y': jnp.asarray(rng.standard_normal((B, TY, cfg.data.n_feats)),
                         jnp.float32),
        'y_lengths': jnp.full((B,), TY, jnp.int32),
        'spk': jnp.asarray(rng.integers(0, cfg.n_spks, (B,)), jnp.int32),
    }
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch['x'], batch['x_lengths'],
        batch['y'][:, :8], jnp.full((B,), 8, jnp.int32), batch['spk'])
    optimizer = make_optimizer(cfg.train.learning_rate)
    state = init_state(params, optimizer)
    step = make_train_step(model, optimizer, out_size=cfg.out_size)

    def fn(state, batch, key):
        state, metrics = step(state, batch, key)
        return state, metrics['loss/total']

    jfn = jax.jit(fn, donate_argnums=(0,))

    # keep a second state replica so donation doesn't invalidate reuse
    def run(kk, seed0):
        nonlocal state
        t0 = time.perf_counter()
        v = 0.0
        for i in range(kk):
            state, v = jfn(state, batch, jax.random.PRNGKey(seed0 + i))
        float(v)
        return time.perf_counter() - t0

    state, v = jfn(state, batch, jax.random.PRNGKey(0))
    float(v)
    t1 = min(run(1, 100), run(1, 200))
    tk = min(run(8, 300), run(8, 400))
    per_call = max((tk - t1) / 7, 1e-9)
    emit('train_step_tedlium_spk_mas', B / per_call, 'utt/s/chip',
         f'B{B} TY{TY} crop {cfg.out_size} full step: 3 losses + on-device '
         f'MAS + per-submodule clip + adam, bf16 model')


def bench_likelihood(B=8, TX=128, TY=512, n_euler=10):
    from gradtts_tpu import get_config
    from gradtts_tpu.models import GradTTS
    from gradtts_tpu.nbest.scoring import score_batch

    cfg = get_config('ljspeech')
    model, params, x, x_lengths, _ = _init_tts(cfg, B, TX, jnp.bfloat16)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((B, TY, cfg.data.n_feats)),
                    jnp.float32)
    y_lengths = jnp.full((B,), TY, jnp.int32)

    def fn(params, key, x, x_lengths, y, y_lengths):
        return score_batch(model, params, key, x, x_lengths, y, y_lengths,
                           n_euler=n_euler).score.sum()

    jfn = jax.jit(fn)
    per_call = timed_per_call(
        jfn, lambda s: (params, jax.random.PRNGKey(s), x, x_lengths,
                        y, y_lengths))
    emit('nbest_likelihood_scoring', B / per_call, 'hypotheses/s/chip',
         f'B{B} T{TY} {n_euler}-step euler hutchinson-jvp')


def bench_mel_frontend(B=8, Y=768):
    """On-chip mel front end (north-star item): batched reflect-padded
    STFT + slaney mel matmul + log as one jitted program, the
    DataLoader(device_mel=True) compute path."""
    from gradtts_tpu.data.mel import mel_from_padded_jit
    hop, n_fft = 256, 1024
    S = (Y - 1) * hop + n_fft
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, S)) * 0.1, jnp.float32)

    def fn(audio):
        return mel_from_padded_jit(audio).sum()

    jfn = jax.jit(fn)
    per_call = timed_per_call(jfn, lambda s: (audio + 1e-6 * s,))
    emit('mel_frontend_stft_mel', B * Y * HOP / SR / per_call,
         'audio_s/s/chip', f'B{B} {Y} frames n_fft {n_fft} hop {hop}')


ALL = {
    'mel10': lambda: bench_mel_synthesis(
        'ljspeech', 'mel_10step_euler', n_steps=10),
    'mel_frontend': bench_mel_frontend,
    'waveform': bench_waveform,
    'multispeaker': lambda: bench_mel_synthesis(
        'libri-tts', 'multispeaker_mel_10step_euler', n_steps=10),
    'train': bench_train_step,
    'likelihood': bench_likelihood,
    # supplementary (beyond-reference capability): the multistep
    # exponential integrator (eps-prediction, log-SNR grid) at 8 steps
    # beats 10-step Euler ODE error ON WEIGHTS TRAINED TO CONVERGENCE
    # (tests/test_dpm_sampler.py::test_dpm_fidelity_on_trained_weights;
    # the earlier 4-step claim held only for random weights and was
    # retired in round 4 — see PERFORMANCE.md 'Sampler efficiency')
    'dpm8': lambda: bench_mel_synthesis(
        'ljspeech', 'mel_dpm_8step', n_steps=8, sampler='dpm'),
}


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('configs', nargs='*', default=list(ALL),
                    help=f'subset of {sorted(ALL)}')
    args = ap.parse_args()
    for name in (args.configs or list(ALL)):
        ALL[name]()
