"""Objective TTS evaluation CLI: synthesize the test set and score it.

Behavioral parity target: /root/reference/evaluate_tts.py:196-244 — N test
utterances, 50-step synthesis, HiFi-GAN vocoding, per-utterance
(log-F0 RMSE, MCD, GPE, VDE, FFE), mean vector printed at the end.

  python -m gradtts_tpu.cli.evaluate --checkpoint CKPT --vocoder HIFIGAN \
      [--preset ljspeech] [--n-utterances 50] [--timesteps 50] [--cpu] \
      [--out-dir DIR]
"""

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--vocoder', required=True,
                        help='HiFi-GAN checkpoint (.pt with "generator" key)')
    parser.add_argument('--vocoder-config', default=None)
    parser.add_argument('--preset', default='ljspeech')
    parser.add_argument('--split', default='test')
    parser.add_argument('--n-utterances', type=int, default=50)
    parser.add_argument('--timesteps', type=int, default=50)
    parser.add_argument('--temperature', type=float, default=1.5)
    parser.add_argument('--speaker-id', type=int, default=None)
    parser.add_argument('--out-dir', default=None,
                        help='also write wavs + per-utt metrics here')
    parser.add_argument('--dsp-backend', default='auto',
                        choices=['auto', 'yin', 'world'],
                        help="feature extractors: 'world' = WORLD harvest + "
                             'CheapTrick + SPTK mcep (reference-comparable '
                             'numbers; uses pyworld/pysptk when installed, '
                             'else the built-in numpy implementations of '
                             "the same algorithms); 'yin' = fast built-in "
                             "DSP; 'auto' picks pyworld-world when "
                             "importable, else 'yin'")
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from gradtts_tpu import get_config
    from gradtts_tpu.cli.inference import load_acoustic_params
    from gradtts_tpu.config import fix_len_compatibility
    from gradtts_tpu.data.dataset import bucket_length, dataset_from_config
    from gradtts_tpu.eval import evaluate_pair
    from gradtts_tpu.models import GradTTS, synthesize
    from gradtts_tpu.models.hifigan import (
        Generator, HiFiGANConfig, hifigan_torch_to_flax)

    cfg = get_config(args.preset)
    model = GradTTS.from_config(cfg)
    example_init = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
        jnp.zeros((1, 8, cfg.data.n_feats)), jnp.array([8]),
        jnp.array([0]) if cfg.n_spks > 1 else
        (jnp.zeros((1, cfg.spk_emb_dim)) if cfg.n_spks == -1 else None))
    params = load_acoustic_params(args.checkpoint, model, example_init)

    vcfg_path = args.vocoder_config or \
        '/root/reference/checkpts/hifigan-config.json'
    vcfg = HiFiGANConfig.from_json(vcfg_path) if os.path.exists(vcfg_path) \
        else HiFiGANConfig()
    vocoder = Generator(vcfg)
    if args.vocoder.endswith(('.pt', '.pth')):
        import torch
        sd = torch.load(args.vocoder, map_location='cpu')
        vocoder_params = hifigan_torch_to_flax(sd['generator'], vcfg)
    else:
        from gradtts_tpu.train.checkpoint import restore_checkpoint
        vocoder_params = restore_checkpoint(args.vocoder)['params']

    dataset = dataset_from_config(cfg, args.split)
    n = min(args.n_utterances, len(dataset))
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

    from gradtts_tpu.data.dataset import load_wav

    key = jax.random.PRNGKey(args.seed)
    rows = []
    for i in range(n):
        item = dataset[i]
        path = dataset.filepaths_and_text[i][0]
        ref_x, fs = load_wav(path)
        x = jnp.asarray(item['x'])[None]
        xl = jnp.asarray([x.shape[1]])
        spk = None
        if args.speaker_id is not None:
            spk = jnp.array([args.speaker_id])
        elif 'spk' in item and cfg.n_spks > 1:
            spk = jnp.asarray(item['spk']).reshape(1)
        elif 'spk' in item and cfg.n_spks == -1:
            spk = jnp.asarray(item['spk'])[None]
        budget = fix_len_compatibility(
            bucket_length(2 * item['y'].shape[0] + 8, cfg.data.y_buckets))
        key, sub = jax.random.split(key)
        res = synthesize(model, params, x, xl, n_timesteps=args.timesteps,
                         y_max_length=budget, key=sub,
                         temperature=args.temperature, spk=spk)
        frames = int(res.y_lengths[0])
        mel = res.decoder_outputs[:, :frames]
        pred_x = np.asarray(vocoder.apply(vocoder_params, mel))[0]
        pred_x = np.clip(pred_x, -1, 1)

        metrics = evaluate_pair(pred_x, ref_x, fs,
                                backend=args.dsp_backend)
        rows.append(metrics)
        print(f'[{i + 1}/{n}] ' + ' '.join(
            f'{k}={v:.4f}' for k, v in metrics.items()))
        if args.out_dir:
            from scipy.io import wavfile
            wavfile.write(os.path.join(args.out_dir, f'eval_{i}.wav'), fs,
                          (pred_x * 32767).astype(np.int16))

    means = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    print('MEAN:', json.dumps(means))  # parity: evaluate_tts.py:244
    if args.out_dir:
        with open(os.path.join(args.out_dir, 'metrics.json'), 'w') as f:
            json.dump({'per_utt': rows, 'mean': means}, f, indent=2)


if __name__ == '__main__':
    main()
