"""Batch test-set synthesis CLI.

Behavioral parity target: /root/reference/generate.py:53-110 — synthesize
the whole (zero-speaker) test split, vocode, and dump wavs + mel plots per
(batch, item) for evaluation.

TPU-first deviation: the reference loops utterance-by-utterance through a
speechbrain 16 kHz HiFi-GAN; here batches are synthesized in one compiled
program per bucket and vocoded with our flax HiFi-GAN generator (any
checkpoint; pass the 16 kHz config/weights for parity with speechbrain's).

  python -m gradtts_tpu.cli.generate -o OUTDIR -c CKPT [-t 10] \
      [--preset tedlium] [--vocoder hifigan.pt] [--vocoder-config cfg.json] \
      [--split test] [--batch-size 8] [--cpu]
"""

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-o', '--output_dir', required=True)
    parser.add_argument('-c', '--checkpoint', required=True)
    parser.add_argument('-t', '--timesteps', type=int, default=10)
    parser.add_argument('--preset', default='tedlium')
    parser.add_argument('--split', default='test')
    parser.add_argument('--vocoder', default=None)
    parser.add_argument('--vocoder-config', default=None)
    parser.add_argument('--batch-size', type=int, default=8)
    parser.add_argument('--mesh-data', type=int, default=1,
                        help='shard each batch over this many devices '
                             '(-1 = all); batch-size must be divisible')
    parser.add_argument('--temperature', type=float, default=1.5)
    parser.add_argument('--sampler', default='euler',
                        choices=['euler', 'dpm'],
                        help='dpm = multistep exponential integrator, '
                             'fewer steps for equal ODE error (~6-8 dpm '
                             'steps match 10 euler on trained weights)')
    parser.add_argument('--plots', action='store_true',
                        help='save generated/reference mel heatmaps')
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--set', nargs='*', default=[],
                        help='dotted config overrides (must match training)')
    args = parser.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import functools

    import jax.numpy as jnp
    import numpy as np

    from gradtts_tpu import get_config
    from gradtts_tpu.cli.inference import load_acoustic_params
    from gradtts_tpu.data.dataset import (
        BatchCollate, DataLoader, dataset_from_config)
    from gradtts_tpu.models import GradTTS, synthesize
    from gradtts_tpu.utils.plotting import save_plot

    from gradtts_tpu.cli import parse_overrides
    cfg = get_config(args.preset, **parse_overrides(args.set))
    model = GradTTS.from_config(cfg)
    example_init = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
        jnp.zeros((1, 8, cfg.data.n_feats)), jnp.array([8]),
        jnp.array([0]) if cfg.n_spks > 1 else
        (jnp.zeros((1, cfg.spk_emb_dim)) if cfg.n_spks == -1 else None))
    params = load_acoustic_params(args.checkpoint, model, example_init)

    vocoder = vocoder_params = None
    if args.vocoder:
        from gradtts_tpu.models.hifigan import (
            Generator, HiFiGANConfig, hifigan_torch_to_flax)
        vcfg = HiFiGANConfig.from_json(args.vocoder_config) \
            if args.vocoder_config else HiFiGANConfig()
        vocoder = Generator(vcfg)
        if args.vocoder.endswith(('.pt', '.pth')):
            import torch
            sd = torch.load(args.vocoder, map_location='cpu')
            vocoder_params = hifigan_torch_to_flax(sd['generator'], vcfg)
        else:
            from gradtts_tpu.train.checkpoint import restore_checkpoint
            vocoder_params = restore_checkpoint(args.vocoder)['params']

    dataset = dataset_from_config(cfg, args.split)
    collate = BatchCollate(x_buckets=cfg.data.x_buckets,
                           y_buckets=cfg.data.y_buckets)
    # drop_last=False: the reference synthesizes EVERY test utterance
    # (generate.py:66-99); the tail batch is padded back up to batch_size
    # below (repeated rows, not emitted) so the compiled program keeps one
    # static batch shape — on TPU a non-multiple-of-8 batch is
    # catastrophically slower (see PERFORMANCE.md), so padding beats a
    # second small-batch compile on both counts.
    loader = DataLoader(dataset, args.batch_size, collate, shuffle=True,
                        seed=args.seed, drop_last=False)

    # data-parallel synthesis: shard the batch axis over a ('data',) mesh
    # and run synthesize under shard_map — inside each shard the program is
    # single-device, so the Pallas fused-attention kernel is legal (it has
    # no GSPMD partitioning rule) and keeps its TPU auto-default. The z
    # noise is drawn once globally and sharded with the batch, so the same
    # seed yields the same output at any mesh size (single-device
    # agreement: tests/test_generate_cli.py, tests/test_train_parallel.py).
    shard = None
    mesh = None
    if args.mesh_data != 1:
        from gradtts_tpu.parallel.mesh import (
            batch_sharding, make_mesh, replicated)
        devices = None if args.mesh_data == -1 \
            else jax.devices()[:args.mesh_data]
        mesh = make_mesh(args.mesh_data, 1, devices=devices)
        n_data = mesh.shape['data']
        if args.batch_size % n_data:
            raise SystemExit(f'--batch-size {args.batch_size} not divisible '
                             f'by data-mesh size {n_data}')
        params = jax.device_put(params, replicated(mesh))
        shard = batch_sharding(mesh)

    @functools.lru_cache(maxsize=None)
    def synth_fn(y_budget, has_spk):
        def fn(params, x, x_lengths, key, spk, noise):
            return synthesize(model, params, x, x_lengths,
                              n_timesteps=args.timesteps,
                              y_max_length=y_budget, key=key,
                              temperature=args.temperature, spk=spk,
                              sampler=args.sampler, noise=noise)
        if mesh is None:
            return jax.jit(fn)
        from jax.sharding import PartitionSpec as P

        def fn_sharded(params, x, x_lengths, key, spk, noise):
            # The key arrives replicated (in_spec P()); fold the shard index
            # in so any stochastic path drawing from it (future stoc=True
            # etc.) gets distinct per-shard noise. The CLI samplers are
            # deterministic given the pre-drawn batch-sharded z noise, so
            # this preserves same-seed-any-mesh-size output agreement.
            key = jax.random.fold_in(key, jax.lax.axis_index('data'))
            return fn(params, x, x_lengths, key, spk, noise)

        b = P('data')
        spk_spec = b if has_spk else P()
        mapped = jax.shard_map(
            fn_sharded, mesh=mesh,
            in_specs=(P(), b, b, P(), spk_spec, b),
            out_specs=b)
        return jax.jit(mapped)

    from scipy.io import wavfile
    from tqdm import tqdm

    key = jax.random.PRNGKey(args.seed)
    for i, batch in enumerate(tqdm(loader)):
        key, sub = jax.random.split(key)
        n_real = batch['x'].shape[0]
        if n_real < args.batch_size:  # tail batch: pad rows, emit n_real
            pad = args.batch_size - n_real
            batch = {k: np.concatenate(
                [v, np.repeat(v[-1:], pad, axis=0)], axis=0)
                for k, v in batch.items()}
        y_budget = max(int(2 * batch['y'].shape[1]), 64)
        y_budget += (-y_budget) % 4
        spk = jnp.asarray(batch['spk']) if 'spk' in batch else None
        bx, bl = jnp.asarray(batch['x']), jnp.asarray(batch['x_lengths'])
        # one global noise draw, sharded with the batch: same seed -> same
        # output at any mesh size
        sub, z_key = jax.random.split(sub)
        noise = jax.random.normal(
            z_key, (args.batch_size, y_budget, model.n_feats), jnp.float32)
        if shard is not None:
            bx = jax.device_put(bx, shard(bx))
            bl = jax.device_put(bl, shard(bl))
            noise = jax.device_put(noise, shard(noise))
            spk = jax.device_put(spk, shard(spk)) if spk is not None else None
        res = synth_fn(y_budget, spk is not None)(
            params, bx, bl, sub, spk, noise)
        out_dir = os.path.join(args.output_dir, str(i))
        os.makedirs(out_dir, exist_ok=True)
        for j in range(n_real):
            length = int(res.y_lengths[j])
            mel = np.asarray(res.decoder_outputs[j, :length])    # [T, F]
            if vocoder is not None:
                audio = np.asarray(vocoder.apply(vocoder_params, mel[None]))[0]
                audio = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
                wavfile.write(os.path.join(out_dir, f'{j}.wav'),
                              cfg.data.sample_rate, audio)
            else:
                np.save(os.path.join(out_dir, f'{j}.npy'), mel)
            if args.plots:
                ref_len = int(batch['y_lengths'][j])
                save_plot(mel.T, os.path.join(out_dir, f'{j}_gen.png'))
                save_plot(batch['y'][j, :ref_len].T,
                          os.path.join(out_dir, f'{j}_ref.png'))
    print(f'Done. Check out the `{args.output_dir}` folder.')


if __name__ == '__main__':
    main()
