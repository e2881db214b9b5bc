"""Synthesis CLI: text file -> mel (-> waveform with HiFi-GAN) + RTF print.

Behavioral parity target: /root/reference/inference.py:37-101 (same flags
-f/-c/-t/-s/-o, temperature 1.5, RTF formula t*sr/(frames*hop)), extended
with --preset config selection, bucketed static-shape synthesis, and
support for both our orbax checkpoints and reference torch ``.pt`` files
(converted on load).

Usage:
  python -m gradtts_tpu.cli.inference -f texts.txt -c ckpt -o outdir \
      [--preset ljspeech] [-t 10] [-s SPK] [--vocoder hifigan.pt] [--cpu]
"""

import argparse
import json
import os
import time

import numpy as np


def load_acoustic_params(checkpoint_path, model, example_init):
    """Load our orbax checkpoint dir or a reference torch .pt state_dict."""
    if os.path.isdir(checkpoint_path):
        from gradtts_tpu.train.checkpoint import restore_checkpoint
        payload = restore_checkpoint(os.path.dirname(checkpoint_path),
                                     path=checkpoint_path) \
            if os.path.basename(checkpoint_path).startswith('step_') \
            else restore_checkpoint(checkpoint_path)
        return payload['params']
    if checkpoint_path.endswith(('.pt', '.pth')):
        import torch
        from gradtts_tpu.utils.convert import gradtts_torch_to_flax
        sd = torch.load(checkpoint_path, map_location='cpu')
        if 'model' in sd and isinstance(sd['model'], dict):
            sd = sd['model']
        return gradtts_torch_to_flax(sd, example_init)
    if checkpoint_path.endswith('.npz'):
        from gradtts_tpu.utils.io import load_params_npz
        return load_params_npz(checkpoint_path)
    raise ValueError(f'unrecognized checkpoint {checkpoint_path}')


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-f', '--file', required=True,
                        help='path to a file with texts to synthesize')
    parser.add_argument('-c', '--checkpoint', required=True,
                        help='Grad-TTS checkpoint (orbax dir, .pt, or .npz)')
    parser.add_argument('-t', '--timesteps', type=int, default=10)
    parser.add_argument('-s', '--speaker_id', type=int, default=None)
    parser.add_argument('-o', '--output', required=True)
    parser.add_argument('--preset', default='ljspeech')
    parser.add_argument('--temperature', type=float, default=1.5)
    parser.add_argument('--length-scale', type=float, default=1.0)
    parser.add_argument('--stoc', action='store_true',
                        help='use the stochastic (SDE) sampler branch')
    parser.add_argument('--sampler', default='euler',
                        choices=('euler', 'dpm'),
                        help='dpm = multistep exponential integrator '
                             '(~equal quality at far fewer steps)')
    parser.add_argument('--vocoder', default=None,
                        help='HiFi-GAN checkpoint (.pt with "generator" key '
                             'or orbax dir); mels are saved as .npy if unset')
    parser.add_argument('--vocoder-config', default=None)
    parser.add_argument('--cpu', action='store_true',
                        help='run on CPU instead of the TPU backend')
    parser.add_argument('--bf16', action='store_true',
                        help='bfloat16 compute in the U-Net and vocoder '
                             '(float32 params/norms; fastest on TPU)')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--set', nargs='*', default=[],
                        help='dotted config overrides (must match training)')
    args = parser.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from gradtts_tpu import get_config
    from gradtts_tpu.config import fix_len_compatibility
    from gradtts_tpu.data.dataset import bucket_length
    from gradtts_tpu.models import GradTTS, synthesize
    from gradtts_tpu.text import CMUDict, intersperse_blank, text_to_sequence
    from gradtts_tpu.text.symbols import symbols

    import ast
    overrides = {}
    for kv in args.set:
        k, v = kv.split('=', 1)
        try:
            overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v
    cfg = get_config(args.preset, **overrides)
    if args.speaker_id is not None:
        assert cfg.n_spks > 1, 'preset is not multispeaker'

    print('Initializing Grad-TTS...')
    compute_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = GradTTS.from_config(cfg, dtype=compute_dtype)
    # Upstream multi-speaker .pt checkpoints use encoder-side speaker
    # concat; detect the wiring from the state dict and rebuild the model
    # accordingly (SURVEY.md §3 quirk; detect_encoder_speaker docstring).
    if args.checkpoint.endswith(('.pt', '.pth')) and cfg.n_spks > 1:
        import torch
        from gradtts_tpu.utils.convert import detect_encoder_speaker
        sd_probe = torch.load(args.checkpoint, map_location='cpu')
        if 'model' in sd_probe and isinstance(sd_probe['model'], dict):
            sd_probe = sd_probe['model']
        if detect_encoder_speaker(sd_probe, cfg.encoder.n_enc_channels):
            print('Detected upstream encoder-side speaker wiring')
            model = GradTTS.from_config(cfg, encoder_speaker=True,
                                        dtype=compute_dtype)
        del sd_probe
    dummy_x = jnp.zeros((1, 8), jnp.int32)
    example_init = jax.jit(model.init)(
        jax.random.PRNGKey(0), dummy_x, jnp.array([8]),
        jnp.zeros((1, 8, cfg.data.n_feats)), jnp.array([8]),
        jnp.array([0]) if cfg.n_spks > 1 else
        (jnp.zeros((1, cfg.spk_emb_dim)) if cfg.n_spks == -1 else None))
    params = load_acoustic_params(args.checkpoint, model, example_init)
    n_params = sum(int(np.prod(np.shape(l)))
                   for l in jax.tree_util.tree_leaves(params))
    print(f'Number of parameters: {n_params}')

    vocoder = vocoder_params = None
    if args.vocoder:
        from gradtts_tpu.models.hifigan import (
            Generator, HiFiGANConfig, hifigan_torch_to_flax)
        vcfg_path = args.vocoder_config or \
            '/root/reference/checkpts/hifigan-config.json'
        vcfg = HiFiGANConfig.from_json(vcfg_path) \
            if os.path.exists(vcfg_path) else HiFiGANConfig()
        vocoder = Generator(vcfg, dtype=compute_dtype)
        print('Initializing HiFi-GAN...')
        if args.vocoder.endswith(('.pt', '.pth')):
            import torch
            sd = torch.load(args.vocoder, map_location='cpu')
            vocoder_params = hifigan_torch_to_flax(sd['generator'], vcfg)
        else:
            from gradtts_tpu.train.checkpoint import restore_checkpoint
            vocoder_params = restore_checkpoint(args.vocoder)['params']

    with open(args.file, encoding='utf-8') as f:
        texts = [line.strip() for line in f if line.strip()]
    cmu = CMUDict(cfg.data.cmudict_path)
    os.makedirs(args.output, exist_ok=True)

    spk = None
    if args.speaker_id is not None:
        spk = jnp.array([args.speaker_id])

    sr, hop = cfg.data.sample_rate, cfg.data.hop_length
    x_buckets = cfg.data.x_buckets

    import functools

    @functools.lru_cache(maxsize=None)
    def synth_for_budget(y_budget):
        @jax.jit
        def synth(params, x, x_lengths, key, spk=None):
            return synthesize(model, params, x, x_lengths,
                              n_timesteps=args.timesteps,
                              y_max_length=y_budget, key=key,
                              temperature=args.temperature, stoc=args.stoc,
                              spk=spk, length_scale=args.length_scale,
                              sampler=args.sampler)
        return synth

    key = jax.random.PRNGKey(args.seed)
    for i, text in enumerate(texts):
        ids = intersperse_blank(text_to_sequence(text, dictionary=cmu),
                                len(symbols))
        xb = bucket_length(len(ids), x_buckets)
        x = np.zeros((1, xb), np.int32)
        x[0, :len(ids)] = ids
        # frame budget: generous upper bound, bucketed for few compiles
        y_budget = fix_len_compatibility(
            bucket_length(10 * len(ids), cfg.data.y_buckets))
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        res = synth_for_budget(y_budget)(
            params, jnp.array(x), jnp.array([len(ids)]), sub, spk)
        frames = int(res.y_lengths[0])
        mel = np.array(res.decoder_outputs[0, :frames])
        dt = time.perf_counter() - t0
        print(f'Synthesizing {i} text... Grad-TTS RTF: '
              f'{dt * sr / (frames * hop)}')
        np.save(os.path.join(args.output, f'mel_{i}.npy'), mel)
        if vocoder is not None:
            wav = np.array(vocoder.apply(vocoder_params, mel[None]))[0]
            wav = np.clip(wav, -1, 1)
            from scipy.io import wavfile
            wavfile.write(os.path.join(args.output, f'sample_{i}.wav'),
                          sr, (wav * 32767).astype(np.int16))
    print(f'Done. Check out the `{args.output}` folder for samples.')


if __name__ == '__main__':
    main()
