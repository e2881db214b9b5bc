"""n-best rescoring CLI: score / compile / rescore / sweep subcommands.

Replaces the reference's hydra drivers (/root/reference/n_best/
n_best_list_experiment.py, get_score_parallel.py + submit_score.sh,
compile_scores.py, n_best_list_evaluate.py, analyse_scores.py + the optuna
sweep config) with one entry point:

  python -m gradtts_tpu.cli.nbest score   --n-best L.pkl --checkpoint CKPT \
      --filelist dev.txt --out-dir scores/e330 [-N 100] [--n-euler 10] \
      [--shard k/K] [--preset tedlium-spk] [--batch-size 8]
  python -m gradtts_tpu.cli.nbest compile --directory scores/e330 -I 507 \
      -N 100 --out diffusion_scores/e330.npy
  python -m gradtts_tpu.cli.nbest rescore --n-best L.pkl \
      --diff-scores diffusion_scores/e330.npy -n 10 \
      [--weight diffusion_score=-0.001 ...] [--out result.yaml]
  python -m gradtts_tpu.cli.nbest sweep   --n-best L.pkl \
      --diff-scores e330.npy -n 10 --trials 500 [--out result.yaml]
"""

import argparse
import json
import os


def _add_common(p):
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--seed', type=int, default=1)


def _load_model(args):
    import jax
    import jax.numpy as jnp
    from gradtts_tpu import get_config
    from gradtts_tpu.cli.inference import load_acoustic_params
    from gradtts_tpu.models import GradTTS

    cfg = get_config(args.preset)
    model = GradTTS.from_config(cfg)
    dummy_x = jnp.zeros((1, 8), jnp.int32)
    example_init = jax.jit(model.init)(
        jax.random.PRNGKey(0), dummy_x, jnp.array([8]),
        jnp.zeros((1, 8, cfg.data.n_feats)), jnp.array([8]),
        jnp.array([0]) if cfg.n_spks > 1 else
        (jnp.zeros((1, cfg.spk_emb_dim)) if cfg.n_spks == -1 else None))
    params = load_acoustic_params(args.checkpoint, model, example_init)
    return cfg, model, params


def cmd_score(args):
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    from gradtts_tpu.data.dataset import (
        TextMelDataset, TextMelSpeakerDataset)
    from gradtts_tpu.nbest import NBestList, NBestScorer, score_n_best

    cfg, model, params = _load_model(args)
    ds_cls = TextMelSpeakerDataset if cfg.n_spks > 1 else TextMelDataset
    dataset = ds_cls(args.filelist, cfg.data.cmudict_path,
                     add_blank=cfg.data.add_blank, n_fft=cfg.data.n_fft,
                     n_mels=cfg.data.n_feats,
                     sample_rate=cfg.data.sample_rate,
                     hop_length=cfg.data.hop_length,
                     win_length=cfg.data.win_length, f_min=cfg.data.f_min,
                     f_max=cfg.data.f_max, shuffle=False)
    n_best = NBestList.from_pickle(args.n_best)
    shard = None
    if args.shard:
        k, K = args.shard.split('/')
        shard = (int(k), int(K))
    scorer = NBestScorer(model, params, n_euler=args.n_euler,
                         batch_size=args.batch_size)
    n = score_n_best(scorer, dataset, n_best, args.N, args.out_dir,
                     name=args.name, seed=args.seed, shard=shard,
                     resume=not args.no_resume, progress=True)
    print(f'scored {n} (utterance, hypothesis) pairs -> {args.out_dir}')


def cmd_compile(args):
    from gradtts_tpu.nbest import compile_scores
    scores = compile_scores(args.directory, args.I, args.N, args.out)
    print(f'compiled [{args.I}, {args.N}] score matrix '
          f'(nonzero {int((scores != 0).sum())}) -> {args.out}')


def _parse_weights(pairs):
    from gradtts_tpu.nbest import SCORE_NAMES
    weights = {name: 0.0 for name in SCORE_NAMES}
    for kv in pairs or []:
        k, v = kv.split('=', 1)
        if k not in weights:
            raise SystemExit(f'unknown score name {k!r}; one of {SCORE_NAMES}')
        weights[k] = float(v)
    return weights


def _rescoring_setup(args):
    import numpy as np
    from gradtts_tpu.nbest import NBestList
    n_best = NBestList.from_pickle(args.n_best)
    if args.diff_scores:
        diff = np.load(args.diff_scores).reshape((len(n_best), -1))
        n_best.set_diffusion_scores(diff[:, :args.n], args.n)
    return n_best


def _dump_result(out, path):
    import yaml
    with open(path, 'w') as f:
        yaml.dump(out, f)
    print(f'wrote {path}')


def cmd_rescore(args):
    from gradtts_tpu.nbest import rescoring_wer
    n_best = _rescoring_setup(args)
    weights = _parse_weights(args.weight)
    result = rescoring_wer(n_best, weights, args.n)
    out = dict(weights)
    out['wer'] = float(result)
    if args.diff_scores:
        out['diff_config'] = os.path.basename(args.diff_scores).rsplit(
            '.', 1)[0]
    print(json.dumps(out, indent=2))
    if args.out:
        _dump_result(out, args.out)


def cmd_sweep(args):
    from gradtts_tpu.nbest import (
        DEFAULT_SPACE, rescoring_wer, refine, tpe_minimize)
    n_best = _rescoring_setup(args)
    features = n_best.feature_matrix(args.n)

    def objective(weights):
        return rescoring_wer(n_best, weights, args.n, features=features)

    res = tpe_minimize(objective, DEFAULT_SPACE, n_trials=args.trials,
                       seed=args.seed)
    best, best_wer = res.best_params, res.best_value
    if args.refine:
        best, best_wer = refine(objective, best, DEFAULT_SPACE)
    out = {k: float(v) for k, v in best.items()}
    out['wer'] = float(best_wer)
    print(json.dumps(out, indent=2))
    if args.out:
        _dump_result(out, args.out)


def cmd_results(args):
    """Collect result.yaml files from sweep/rescore runs into one CSV
    sorted by WER (parity: /root/reference/n_best/compile_results.py)."""
    import pandas as pd
    import yaml
    rows = []
    for root, _dirs, files in os.walk(args.directory):
        for filename in files:
            if filename.endswith('result.yaml'):
                with open(os.path.join(root, filename)) as f:
                    data = yaml.safe_load(f)
                if isinstance(data, dict):
                    rows.append(data)
    df = pd.DataFrame(rows).sort_values('wer')
    df.to_csv(args.out)
    print(f'{len(rows)} results -> {args.out}')
    if len(rows):
        print(df.head(5).to_string())


def main(argv=None):
    parser = argparse.ArgumentParser(prog='gradtts_tpu.cli.nbest')
    sub = parser.add_subparsers(dest='cmd', required=True)

    p = sub.add_parser('score', help='diffusion-likelihood scoring')
    p.add_argument('--n-best', required=True)
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--filelist', required=True)
    p.add_argument('--out-dir', required=True)
    p.add_argument('--preset', default='tedlium-spk')
    p.add_argument('-N', type=int, default=100)
    p.add_argument('--n-euler', type=int, default=10)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--name', default='scores')
    p.add_argument('--shard', default=None, help='k/K utterance sharding')
    p.add_argument('--no-resume', action='store_true')
    _add_common(p)
    p.set_defaults(fn=cmd_score)

    p = sub.add_parser('compile', help='score shards -> [I,N] .npy')
    p.add_argument('--directory', required=True)
    p.add_argument('-I', type=int, required=True)
    p.add_argument('-N', type=int, required=True)
    p.add_argument('--out', required=True)
    p.set_defaults(fn=cmd_compile)

    p = sub.add_parser('rescore', help='linear rescoring WER')
    p.add_argument('--n-best', required=True)
    p.add_argument('--diff-scores', default=None)
    p.add_argument('-n', type=int, default=10)
    p.add_argument('--weight', nargs='*', default=[],
                   help='name=value pairs; unset names weigh 0')
    p.add_argument('--out', default=None)
    _add_common(p)
    p.set_defaults(fn=cmd_rescore)

    p = sub.add_parser('sweep', help='TPE weight search')
    p.add_argument('--n-best', required=True)
    p.add_argument('--diff-scores', default=None)
    p.add_argument('-n', type=int, default=10)
    p.add_argument('--trials', type=int, default=500)
    p.add_argument('--refine', action='store_true',
                   help='Nelder-Mead polish of the best TPE point')
    p.add_argument('--out', default=None)
    _add_common(p)
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser('results', help='collect result.yaml files -> CSV')
    p.add_argument('--directory', required=True)
    p.add_argument('--out', default='results.csv')
    p.set_defaults(fn=cmd_results)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == '__main__':
    main()
