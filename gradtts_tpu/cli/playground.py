"""Likelihood sanity playground: bpd of real speech under a checkpoint.

Behavioral parity target: /root/reference/playground.py:76-173 and
playground_zero.py — load a checkpoint, take utterances from a filelist,
build the text-conditional score model on the TRUE transcription, and
print per-utterance probability-flow ODE likelihoods ("bpd") as a smoke
check that the model + likelihood engine are wired correctly.

  python -m gradtts_tpu.cli.playground --checkpoint CKPT --filelist F \
      [--preset ljspeech] [--n-utterances 3] [--n-euler 10] [--repeats 3] \
      [--cpu]
"""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--filelist', required=True)
    parser.add_argument('--preset', default='ljspeech')
    parser.add_argument('--n-utterances', type=int, default=3)
    parser.add_argument('--n-euler', type=int, default=10,
                        help='0 selects the adaptive Dormand-Prince solver')
    parser.add_argument('--repeats', type=int, default=3,
                        help='Hutchinson probes averaged per utterance')
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
    from gradtts_tpu.data.dataset import (
        TextMelDataset, TextMelSpeakerDataset)
    from gradtts_tpu.models import GradTTS
    from gradtts_tpu.nbest.scoring import NBestScorer

    cfg = get_config(args.preset)
    model = GradTTS.from_config(cfg)
    example_init = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
        jnp.zeros((1, 8, cfg.data.n_feats)), jnp.array([8]),
        jnp.array([0]) if cfg.n_spks > 1 else
        (jnp.zeros((1, cfg.spk_emb_dim)) if cfg.n_spks == -1 else None))
    params = load_acoustic_params(args.checkpoint, model, example_init)

    ds_cls = TextMelSpeakerDataset if cfg.n_spks > 1 else TextMelDataset
    dataset = ds_cls(args.filelist, cfg.data.cmudict_path,
                     add_blank=cfg.data.add_blank, n_fft=cfg.data.n_fft,
                     n_mels=cfg.data.n_feats,
                     sample_rate=cfg.data.sample_rate,
                     hop_length=cfg.data.hop_length,
                     win_length=cfg.data.win_length, f_min=cfg.data.f_min,
                     f_max=cfg.data.f_max, shuffle=False)

    scorer = NBestScorer(model, params, n_euler=args.n_euler, batch_size=1)
    key = jax.random.PRNGKey(args.seed)
    print('Calculating likelihood')
    for i in range(min(args.n_utterances, len(dataset))):
        item = dataset[i]
        scores = []
        for _ in range(args.repeats):
            key, sub = jax.random.split(key)
            scores.append(float(scorer.score_items([item], sub)[0]))
        n_frames = item['y'].shape[0]
        # bits-per-dim normalization of the negative log-likelihood
        bpd = np.mean(scores) / (n_frames * cfg.data.n_feats) / np.log(2)
        print(f'utt {i}: score={np.mean(scores):.1f} '
              f'(std {np.std(scores):.1f} over {args.repeats} probes), '
              f'{bpd:.3f} bpd')
    print("That's a nice likelihood!")


if __name__ == '__main__':
    main()
