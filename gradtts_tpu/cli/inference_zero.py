"""Zero-shot synthesis CLI: clone a voice from a reference waveform.

Behavioral parity target: /root/reference/inference_zero.py:25-104 — same
flags (-f/-c/-t/-s), speaker wav -> ECAPA embedding -> zero-speaker
GradTTS (n_spks = -1) -> HiFi-GAN -> wavs + mel/mu plots + RTF print.

The ECAPA encoder comes from speechbrain, which needs network weights; in
hermetic environments pass ``--spk-emb vec.npy`` (a precomputed 192-d
embedding, e.g. from scripts/spk_emb precompute) instead of ``-s wav``.

  python -m gradtts_tpu.cli.inference_zero -f texts.txt -c ckpt \
      (-s speaker.wav | --spk-emb emb.npy) [-t 10] [-o out] \
      [--vocoder hifigan.pt] [--preset tedlium] [--cpu]
"""

import argparse
import os
import time


def speaker_embedding_from_wav(wav_path: str):
    """ECAPA embedding via speechbrain (parity: inference_zero.py:30-59).
    Raises a clear error when speechbrain isn't installed."""
    try:
        from speechbrain.pretrained import EncoderClassifier
    except ImportError as e:
        raise SystemExit(
            'speechbrain is not available in this environment; precompute '
            'the ECAPA embedding elsewhere and pass --spk-emb vec.npy'
        ) from e
    import numpy as np
    from gradtts_tpu.data.dataset import load_wav
    classifier = EncoderClassifier.from_hparams(
        source='speechbrain/spkrec-ecapa-voxceleb')
    import torch
    signal, _sr = load_wav(wav_path)
    emb = classifier.encode_batch(torch.from_numpy(signal)[None])
    return np.asarray(emb).reshape(1, -1)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-f', '--file', required=True)
    parser.add_argument('-c', '--checkpoint', required=True)
    parser.add_argument('-t', '--timesteps', type=int, default=10)
    parser.add_argument('-s', '--speaker', default=None,
                        help='speaker reference wav (needs speechbrain)')
    parser.add_argument('--spk-emb', default=None,
                        help='precomputed speaker embedding (.npy, [D] or [1,D])')
    parser.add_argument('-o', '--output', default='out')
    parser.add_argument('--preset', default='tedlium')
    parser.add_argument('--temperature', type=float, default=1.5)
    parser.add_argument('--vocoder', default=None)
    parser.add_argument('--vocoder-config', default=None)
    parser.add_argument('--plots', action='store_true')
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args(argv)
    if (args.speaker is None) == (args.spk_emb is None):
        parser.error('pass exactly one of -s/--speaker or --spk-emb')

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import functools

    import jax.numpy as jnp
    import numpy as np

    from gradtts_tpu import get_config
    from gradtts_tpu.cli.inference import load_acoustic_params
    from gradtts_tpu.config import fix_len_compatibility
    from gradtts_tpu.data.dataset import bucket_length
    from gradtts_tpu.models import GradTTS, synthesize
    from gradtts_tpu.text import CMUDict, intersperse_blank, text_to_sequence
    from gradtts_tpu.text.symbols import symbols
    from gradtts_tpu.utils.plotting import save_plot

    cfg = get_config(args.preset)
    assert cfg.n_spks == -1, \
        f'preset {args.preset!r} is not zero-speaker (n_spks={cfg.n_spks})'

    if args.spk_emb:
        spk = np.load(args.spk_emb).reshape(1, -1).astype(np.float32)
    else:
        spk = speaker_embedding_from_wav(args.speaker).astype(np.float32)
    assert spk.shape[1] == cfg.spk_emb_dim, \
        f'embedding dim {spk.shape[1]} != config spk_emb_dim {cfg.spk_emb_dim}'
    spk = jnp.asarray(spk)

    print('Initializing Grad-TTS...')
    model = GradTTS.from_config(cfg)
    example_init = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
        jnp.zeros((1, 8, cfg.data.n_feats)), jnp.array([8]),
        jnp.zeros((1, cfg.spk_emb_dim)))
    params = load_acoustic_params(args.checkpoint, model, example_init)

    vocoder = vocoder_params = None
    if args.vocoder:
        from gradtts_tpu.models.hifigan import (
            Generator, HiFiGANConfig, hifigan_torch_to_flax)
        vcfg = HiFiGANConfig.from_json(args.vocoder_config) \
            if args.vocoder_config else HiFiGANConfig()
        vocoder = Generator(vcfg)
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

    sr, hop = cfg.data.sample_rate, cfg.data.hop_length

    @functools.lru_cache(maxsize=None)
    def synth_for_budget(y_budget):
        @jax.jit
        def fn(params, x, x_lengths, key, spk):
            return synthesize(model, params, x, x_lengths,
                              n_timesteps=args.timesteps,
                              y_max_length=y_budget, key=key,
                              temperature=args.temperature, spk=spk)
        return fn

    from scipy.io import wavfile

    key = jax.random.PRNGKey(args.seed)
    for i, text in enumerate(texts):
        ids = intersperse_blank(text_to_sequence(text, dictionary=cmu),
                                len(symbols))
        xb = bucket_length(len(ids), cfg.data.x_buckets)
        x = np.zeros((1, xb), np.int32)
        x[0, :len(ids)] = ids
        y_budget = fix_len_compatibility(
            bucket_length(10 * len(ids), cfg.data.y_buckets))
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        res = synth_for_budget(y_budget)(
            params, jnp.asarray(x), jnp.asarray([len(ids)]), sub, spk)
        frames = int(res.y_lengths[0])
        dt = time.perf_counter() - t0
        print(f'Synthesizing {i} text... Grad-TTS RTF: '
              f'{dt * sr / (frames * hop)}')
        mel = np.asarray(res.decoder_outputs[0, :frames])
        if args.plots:
            save_plot(mel.T, os.path.join(args.output, f'mel_{i}.png'))
            save_plot(np.asarray(res.encoder_outputs[0, :frames]).T,
                      os.path.join(args.output, f'mu_{i}.png'))
        if vocoder is not None:
            audio = np.asarray(vocoder.apply(vocoder_params, mel[None]))[0]
            audio = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
            wavfile.write(os.path.join(args.output, f'sample_{i}.wav'), sr,
                          audio)
        else:
            np.save(os.path.join(args.output, f'mel_{i}.npy'), mel)
    print(f'Done. Check out the `{args.output}` folder for samples.')


if __name__ == '__main__':
    main()
