"""Benchmark: synthesis throughput on the real chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Primary metric (per BASELINE.md): audio-seconds synthesized per wall-clock
second per chip at 10-step Euler reverse diffusion on the flagship LJSpeech
GradTTS (14.8M params), batched bucketed synthesis, bf16 U-Net compute
(f32 norms / f32 sampler state).

Timing methodology: on the tunneled TPU backend ``block_until_ready``
returns before execution finishes, so dispatch-only timing overreports by
orders of magnitude. We instead time K chained calls followed by a scalar
device->host fetch, subtract the fetch-only constant measured separately,
and divide by K.

vs_baseline: the reference publishes no numbers (BASELINE.json
"published": {}); the denominator is an estimate of single-GPU PyTorch
Grad-TTS throughput derived from the upstream paper's reported RTF at
10-step sampling (~0.1 => ~10 audio-sec/s) times batch scaling observed on
A100-class parts (~x4) => 40 audio-sec/s. Treat it as a yardstick, not a
measured baseline. One point IS measured: tools/baseline_anchor.py runs
the unmodified reference torch implementation and this framework on the
same host CPU with identical converted weights (see PERFORMANCE.md,
"Measured baseline anchor").
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# Break-even framing for the ">=3x A100" north-star claim (BASELINE.md):
# at the round-4 driver-captured chip throughput of 922 audio-s/s
# (BENCH_r04.json; run-to-run tunnel spread ~0.7%), the claim fails only
# if real A100 torch Grad-TTS exceeds 922/3 = 307 audio-s/s — i.e. 7.7x
# this estimate. The measured same-host CPU anchor
# (tools/baseline_anchor.py: reference torch 1.16 audio-s/s on 2 CPUs)
# bounds how implausible that is; see PERFORMANCE.md "Break-even analysis".
A100_TORCH_EST_AUDIO_SEC_PER_SEC = 40.0

B = 8           # batch of utterances — measured optimum on v5e: the batch
                # dim tiles onto 8 sublanes, so B=8 wastes none; B=16 costs
                # 2.09x the time of B=8 (575 vs 602 audio-s/s), and
                # non-multiples of 8 (B=6, B=12) are far worse
TX = 128        # text bucket
Y_BUDGET = 768  # mel-frame bucket (~8.9 s audio at 22.05 kHz / hop 256)
N_STEPS = 10
HOP, SR = 256, 22050
K = 8           # chained calls per timed measurement


def main():
    from gradtts_tpu import get_config
    from gradtts_tpu.models import GradTTS, synthesize

    cfg = get_config('ljspeech')
    model = GradTTS.from_config(cfg, dtype=jnp.bfloat16)

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
        return res.decoder_outputs.sum()  # scalar: cheap to fetch

    jfn = jax.jit(fn)

    # warmup/compile + tunnel spin-up (first fetch is very slow)
    float(jfn(params, x, x_lengths, jax.random.PRNGKey(1)))
    float(jfn(params, x, x_lengths, jax.random.PRNGKey(2)))

    def timed(k, seed0):
        t0 = time.perf_counter()
        v = 0.0
        for i in range(k):
            v = jfn(params, x, x_lengths, jax.random.PRNGKey(seed0 + i))
        float(v)  # force full pipeline drain + one host fetch
        return time.perf_counter() - t0

    # fetch-only constant: k=1 measurement; amortized over K calls
    t1 = min(timed(1, 100), timed(1, 200))
    tk = min(timed(K, 300), timed(K, 400))
    per_call = max((tk - t1) / (K - 1), 1e-9)

    audio_sec = B * Y_BUDGET * HOP / SR  # frames actually computed per call
    value = audio_sec / per_call
    print(json.dumps({
        'metric': 'audio_sec_synthesized_per_sec_per_chip_10step_euler',
        'value': round(value, 3),
        'unit': 'audio_s/s/chip',
        'vs_baseline': round(value / A100_TORCH_EST_AUDIO_SEC_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
