"""Measured same-host baseline anchor: reference PyTorch Grad-TTS vs this
framework, both on CPU, identical weights and inputs.

The reference publishes no benchmark numbers (BASELINE.json "published": {})
and no GPU is attached to this environment, so ``bench.py``'s
``vs_baseline`` denominator is an estimate. This tool provides the one
measured anchor that IS available: the reference implementation
(/root/reference, run as an unmodified black box via tests/ref_oracle.py)
and our JAX implementation synthesize the same batch with the same
converted production-dims weights (/root/reference/params.py:12-37) at
10-step Euler on the same host CPU, and the ratio is recorded in
PERFORMANCE.md.

Audio-seconds are counted from the duration-predicted frame counts (shared
weights => identical durations in both frameworks); our framework computes
a padded bucket beyond those frames and that padding cost counts against
us, not for us.

Run: python tools/baseline_anchor.py   (takes a few minutes on CPU)
"""

import os
import sys
import time
import json

os.environ['JAX_PLATFORMS'] = 'cpu'  # this tool is same-host CPU by design

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(_ROOT, 'tests'))
sys.path.insert(0, _ROOT)

import numpy as np  # noqa: E402

B, TX, N_STEPS = 8, 128, 10
HOP, SR = 256, 22050

# production dims: /root/reference/params.py:12-37
HP = dict(n_vocab=149, n_enc_channels=192, filter_channels=768,
          filter_channels_dp=256, n_heads=2, n_enc_layers=6, enc_kernel=3,
          enc_dropout=0.1, window_size=4, n_feats=80, dec_dim=64,
          beta_min=0.05, beta_max=20.0, pe_scale=1000.0)


def fix_len(length, num_downsamplings=2):
    factor = 2 ** num_downsamplings
    return int(np.ceil(length / factor)) * factor


def main():
    import torch
    from ref_oracle import load_reference_model

    import jax
    # the axon sitecustomize force-sets jax_platforms='axon,cpu' at
    # interpreter start, overriding JAX_PLATFORMS — override it back
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from gradtts_tpu.models import GradTTS, synthesize
    from gradtts_tpu.utils.convert import gradtts_torch_to_flax

    assert jax.devices()[0].platform == 'cpu'
    print(f'# host: {os.cpu_count()} cpus, torch {torch.__version__} '
          f'({torch.get_num_threads()} threads), jax {jax.__version__}',
          file=sys.stderr)

    ref = load_reference_model()
    torch.manual_seed(0)
    tmodel = ref.tts.GradTTS(
        HP['n_vocab'], 1, 64, HP['n_enc_channels'], HP['filter_channels'],
        HP['filter_channels_dp'], HP['n_heads'], HP['n_enc_layers'],
        HP['enc_kernel'], HP['enc_dropout'], HP['window_size'],
        HP['n_feats'], HP['dec_dim'], HP['beta_min'], HP['beta_max'],
        HP['pe_scale']).eval()

    rng = np.random.default_rng(0)
    x = rng.integers(1, HP['n_vocab'], size=(B, TX))
    x_lengths = np.full((B,), TX, np.int64)
    tx, txl = torch.tensor(x), torch.tensor(x_lengths)

    # ---- reference torch synthesis (black box, its own length logic) ----
    def torch_run():
        with torch.no_grad():
            y_enc, y_dec, attn = tmodel(tx, txl, n_timesteps=N_STEPS,
                                        temperature=1.0, stoc=False,
                                        length_scale=1.0)
        return y_dec

    y_dec = torch_run()  # warm (includes any lazy init)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        y_dec = torch_run()
        times.append(time.perf_counter() - t0)
    t_torch = min(times)
    ty_torch = y_dec.shape[-1]

    # audio actually synthesized: duration-predicted lengths (shared
    # weights make these identical across frameworks)
    with torch.no_grad():
        mu_x, logw, x_mask = tmodel.encoder(tx, txl, None)
        w_ceil = torch.ceil(torch.exp(logw) * x_mask)
        y_lens = torch.clamp_min(w_ceil.sum([1, 2]), 1).long()
    audio_s = float(y_lens.sum()) * HOP / SR
    print(f'# torch: {t_torch*1e3:.0f} ms/batch, y_max={ty_torch} frames, '
          f'{audio_s:.1f} audio-s', file=sys.stderr)

    # ---- ours, same weights, CPU, jitted ----
    jmodel = GradTTS(n_spks=1, spk_emb_dim=64, **HP)
    params = jax.jit(jmodel.init)(
        jax.random.PRNGKey(0), jnp.array(x), jnp.array(x_lengths),
        jnp.zeros((B, 8, HP['n_feats'])), jnp.full((B,), 8, jnp.int32), None)
    params = gradtts_torch_to_flax(tmodel.state_dict(), params)
    y_budget = fix_len(ty_torch)

    def fn(params, x, xl, key):
        res = synthesize(jmodel, params, x, xl, n_timesteps=N_STEPS,
                         y_max_length=y_budget, key=key,
                         fused_attention=False)
        return res.decoder_outputs.sum()

    jfn = jax.jit(fn)
    jx, jxl = jnp.array(x), jnp.array(x_lengths)
    float(jfn(params, jx, jxl, jax.random.PRNGKey(1)))  # compile
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        float(jfn(params, jx, jxl, jax.random.PRNGKey(2 + i)))
        times.append(time.perf_counter() - t0)
    t_jax = min(times)
    print(f'# ours (jax cpu): {t_jax*1e3:.0f} ms/batch, bucket {y_budget} '
          f'frames', file=sys.stderr)

    print(json.dumps({
        'torch_reference_audio_s_per_s_cpu': round(audio_s / t_torch, 2),
        'gradtts_tpu_audio_s_per_s_cpu': round(audio_s / t_jax, 2),
        'speedup_same_host_cpu': round(t_torch / t_jax, 3),
        'batch': B, 'tx': TX, 'n_steps': N_STEPS,
        'y_frames_torch': int(ty_torch), 'y_bucket_ours': y_budget,
        'host_cpus': os.cpu_count(),
    }))


if __name__ == '__main__':
    main()
