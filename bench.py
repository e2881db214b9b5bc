"""Benchmark: synthesis throughput on the real chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Primary metric (per BASELINE.md): audio-seconds synthesized per wall-clock
second per chip at 10-step Euler reverse diffusion on the flagship LJSpeech
GradTTS (14.8M params), batched bucketed synthesis, bf16 compute.

vs_baseline: the reference publishes no numbers (BASELINE.json
"published": {}); the denominator is an estimate of single-GPU PyTorch
Grad-TTS throughput derived from the upstream paper's reported RTF at
10-step sampling (~0.1 => ~10 audio-sec/s) times batch scaling observed on
A100-class parts (~x4) => 40 audio-sec/s. Treat it as a yardstick, not a
measured baseline.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

A100_TORCH_EST_AUDIO_SEC_PER_SEC = 40.0

B = 8           # batch of utterances
TX = 128        # text bucket
Y_BUDGET = 768  # mel-frame bucket (~8.9 s audio at 22.05 kHz / hop 256)
N_STEPS = 10
HOP, SR = 256, 22050


def main():
    from gradtts_tpu import get_config
    from gradtts_tpu.models import GradTTS, synthesize

    cfg = get_config('ljspeech')
    model = GradTTS.from_config(cfg)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, cfg.n_vocab, size=(B, TX)), jnp.int32)
    x_lengths = jnp.full((B,), TX, jnp.int32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, x_lengths,
        jnp.zeros((B, 8, cfg.data.n_feats)), jnp.full((B,), 8, jnp.int32),
        None)

    def fn(params, x, x_lengths, key):
        res = synthesize(model, params, x, x_lengths, n_timesteps=N_STEPS,
                         y_max_length=Y_BUDGET, key=key)
        return res.decoder_outputs

    jfn = jax.jit(fn)
    # warmup/compile
    out = jfn(params, x, x_lengths, jax.random.PRNGKey(1))
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        out = jfn(params, x, x_lengths, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    audio_sec = B * Y_BUDGET * HOP / SR  # frames actually computed per call
    value = audio_sec / dt
    print(json.dumps({
        'metric': 'audio_sec_synthesized_per_sec_per_chip_10step_euler',
        'value': round(value, 3),
        'unit': 'audio_s/s/chip',
        'vs_baseline': round(value / A100_TORCH_EST_AUDIO_SEC_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
