"""HiFi-GAN vocoder training / fine-tuning CLI.

Completes the reference's vocoder subsystem: the reference ships the
HiFi-GAN model + losses + MelDataset (/root/reference/hifi-gan/models.py,
meldataset.py) but no training entry point. Usage:

  python -m gradtts_tpu.cli.train_vocoder \
      --input-wavs-dir wavs --input-training-file train.txt \
      --input-validation-file valid.txt --log-dir logs/hifigan \
      [--config checkpts/hifigan-config.json] [--fine-tuning --base-mels-path mels/] \
      [--batch-size 16] [--epochs 3100] [--cpu]
"""

import argparse
import logging
import os
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--input-wavs-dir', required=True)
    parser.add_argument('--input-training-file', required=True)
    parser.add_argument('--input-validation-file', default=None)
    parser.add_argument('--log-dir', required=True)
    parser.add_argument('--config', default=None,
                        help='hifigan-config.json (defaults to V1 22.05 kHz)')
    parser.add_argument('--batch-size', type=int, default=16)
    parser.add_argument('--segment-size', type=int, default=None,
                        help='defaults to the config JSON value (8192)')
    parser.add_argument('--epochs', type=int, default=100)
    parser.add_argument('--max-steps', type=int, default=None)
    parser.add_argument('--learning-rate', type=float, default=None,
                        help='defaults to the config JSON value')
    parser.add_argument('--lr-decay', type=float, default=None,
                        help='defaults to the config JSON value')
    parser.add_argument('--save-every', type=int, default=5,
                        help='checkpoint every N epochs')
    parser.add_argument('--fine-tuning', action='store_true')
    parser.add_argument('--base-mels-path', default=None,
                        help='precomputed generator mels (<stem>.npy)')
    parser.add_argument('--init-generator', default=None,
                        help='torch HiFi-GAN checkpoint to fine-tune from')
    parser.add_argument('--seed', type=int, default=1234)
    parser.add_argument('--no-resume', action='store_true')
    parser.add_argument('--cpu', action='store_true')
    args = parser.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(name)s %(message)s')
    log = logging.getLogger('gradtts_tpu.train_vocoder')

    from gradtts_tpu.data.dataset import DataLoader
    from gradtts_tpu.data.vocoder_dataset import (
        VocoderBatchCollate, VocoderMelDataset, vocoder_filelists,
    )
    from gradtts_tpu.models.hifigan import HiFiGANConfig, hifigan_torch_to_flax
    from gradtts_tpu.train.checkpoint import (
        latest_checkpoint, restore_checkpoint, save_checkpoint,
    )
    from gradtts_tpu.train.loop import MetricsLogger
    from gradtts_tpu.train.vocoder import (
        VocoderTrainState, init_vocoder_state, make_vocoder_optimizer,
        make_vocoder_train_step,
    )

    cfg = (HiFiGANConfig.from_json(args.config) if args.config
           else HiFiGANConfig())
    segment_size = args.segment_size if args.segment_size else \
        cfg.segment_size

    train_files, _ = vocoder_filelists(
        args.input_training_file,
        args.input_validation_file or args.input_training_file,
        args.input_wavs_dir)
    # mel analysis settings come from the config JSON so the dataset, the
    # in-graph loss mel, and the generator's upsampling product all agree
    dataset = VocoderMelDataset(
        train_files, segment_size=segment_size,
        n_fft=cfg.n_fft, num_mels=cfg.num_mels, hop_size=cfg.hop_size,
        win_size=cfg.win_size, sampling_rate=cfg.sampling_rate,
        fmin=cfg.fmin, fmax=cfg.fmax, fmax_loss=cfg.fmax_loss,
        seed=args.seed, fine_tuning=args.fine_tuning,
        base_mels_path=args.base_mels_path)
    loader = DataLoader(dataset, args.batch_size, VocoderBatchCollate(),
                        shuffle=True, seed=args.seed)

    steps_per_epoch = max(len(loader), 1)
    lr = args.learning_rate if args.learning_rate else cfg.learning_rate
    lr_decay = args.lr_decay if args.lr_decay else cfg.lr_decay
    gen_opt = make_vocoder_optimizer(lr, betas=(cfg.adam_b1, cfg.adam_b2),
                                     lr_decay=lr_decay,
                                     steps_per_epoch=steps_per_epoch)
    disc_opt = make_vocoder_optimizer(lr, betas=(cfg.adam_b1, cfg.adam_b2),
                                      lr_decay=lr_decay,
                                      steps_per_epoch=steps_per_epoch)

    ckpt_dir = os.path.join(args.log_dir, 'ckpt')
    resuming = not args.no_resume and latest_checkpoint(ckpt_dir)

    gen_params = None
    if args.init_generator and not resuming:
        import torch
        ckpt = torch.load(args.init_generator, map_location='cpu')
        sd = ckpt.get('generator', ckpt)
        gen_params = hifigan_torch_to_flax(sd, cfg)
        log.info('initialized generator from %s', args.init_generator)

    state = init_vocoder_state(jax.random.PRNGKey(args.seed), cfg,
                               segment_size, gen_opt, disc_opt,
                               gen_params=gen_params)

    start_step = 0
    if resuming:
        # restore with the freshly-initialized state as the template so
        # optax states come back as the proper NamedTuple pytrees (an
        # untyped restore yields plain dicts/lists that adamw rejects)
        template = {'step': 0, 'params': _ckpt_payload(state).params,
                    'opt_state': _ckpt_payload(state).opt_state}
        payload = restore_checkpoint(ckpt_dir, template=template)
        state = VocoderTrainState(
            step=jnp.asarray(payload['step']),
            gen_params=payload['params']['gen'],
            mpd_params=payload['params']['mpd'],
            msd_params=payload['params']['msd'],
            gen_opt=payload['opt_state']['gen'],
            disc_opt=payload['opt_state']['disc'])
        start_step = int(payload['step'])
        log.info('resumed from step %d', start_step)

    step_fn = make_vocoder_train_step(cfg, gen_opt, disc_opt)
    jit_step = jax.jit(step_fn, donate_argnums=(0,))

    metrics_log = MetricsLogger(args.log_dir)
    step = start_step
    last_saved = start_step
    done = False
    for epoch in range(args.epochs):
        epoch_metrics = []
        t0 = time.time()
        for batch in loader:
            state, metrics = jit_step(state, batch)
            step += 1
            host = {k: float(v) for k, v in metrics.items()}
            epoch_metrics.append(host)
            metrics_log.scalars(host, step)
            if args.max_steps is not None and step - start_step >= args.max_steps:
                done = True
                break
        if epoch_metrics:
            means = {k: float(np.mean([m[k] for m in epoch_metrics]))
                     for k in epoch_metrics[0]}
            msg = (f'epoch {epoch}: ' + ', '.join(
                f'{k}={v:.4f}' for k, v in means.items())
                + f' ({time.time() - t0:.1f}s)')
            log.info(msg)
            metrics_log.text(msg)
        if (epoch + 1) % args.save_every == 0 or done:
            save_checkpoint(ckpt_dir, _ckpt_payload(state), step)
            last_saved = step
        if done:
            break
    if step > last_saved:
        # final save so runs whose epoch count isn't a save_every multiple
        # still end with a checkpoint
        save_checkpoint(ckpt_dir, _ckpt_payload(state), step)
    metrics_log.close()
    return state


def _ckpt_payload(state):
    """Adapt VocoderTrainState to the (params, opt_state, step) layout
    save_checkpoint expects."""
    from gradtts_tpu.train.state import TrainState
    return TrainState(
        step=state.step,
        params={'gen': state.gen_params, 'mpd': state.mpd_params,
                'msd': state.msd_params},
        opt_state={'gen': state.gen_opt, 'disc': state.disc_opt})


if __name__ == '__main__':
    main()
