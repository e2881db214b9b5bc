"""Training CLI.

Replaces the reference's three edit-the-import trainers (train.py,
train_multi_speaker.py, train_zero_speaker.py) with one entry point:

  python -m gradtts_tpu.cli.train --preset ljspeech [--log-dir DIR]
      [--epochs N] [--max-steps N] [--batch-size B] [--mesh-data D]
      [--mesh-model M] [--cpu] [--set key=value ...]

The preset picks the dataset flavor (single / speaker-id / zero-speaker)
exactly as the reference's params modules did.
"""

import argparse
import ast
import logging


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--preset', default='ljspeech')
    parser.add_argument('--log-dir', default=None)
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--max-steps', type=int, default=None)
    parser.add_argument('--batch-size', type=int, default=None)
    parser.add_argument('--mesh-data', type=int, default=None)
    parser.add_argument('--mesh-model', type=int, default=None)
    parser.add_argument('--no-resume', action='store_true')
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--set', nargs='*', default=[],
                        help='dotted config overrides, e.g. '
                             'train.learning_rate=2e-4')
    args = parser.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(name)s %(message)s')

    from gradtts_tpu import get_config
    from gradtts_tpu.parallel.mesh import initialize_distributed
    from gradtts_tpu.train.loop import train

    # multi-host bring-up (no-op single host; see initialize_distributed)
    if initialize_distributed():
        logging.getLogger('gradtts_tpu.train').info(
            'distributed: process %d/%d, %d local / %d global devices',
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count())

    overrides = {}
    for kv in args.set:
        k, v = kv.split('=', 1)
        try:
            overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v
    if args.batch_size is not None:
        overrides['train.batch_size'] = args.batch_size
    if args.mesh_data is not None:
        overrides['train.mesh_data'] = args.mesh_data
    if args.mesh_model is not None:
        overrides['train.mesh_model'] = args.mesh_model

    cfg = get_config(args.preset, **overrides)
    train(cfg, n_epochs=args.epochs, max_steps=args.max_steps,
          log_dir=args.log_dir, resume=not args.no_resume)


if __name__ == '__main__':
    main()
