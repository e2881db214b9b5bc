"""Worker for the 2-process distributed training test (not a test module).

Run as: python distributed_worker.py <process_id> <port> <log_dir>

Each of the two processes exposes 4 virtual CPU devices, joins a
jax.distributed cluster (global mesh: 8 devices, ('data','model') = (4,2)),
runs two full training steps with a per-host injected loader, saves an
orbax checkpoint from all processes, then resumes from it. Prints
``LOSS <v>`` (must match across processes — the psum'd global loss) and
``RESUMED <step>``.
"""

import os
import sys


def main():
    pid, port, log_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    # force EXACTLY 4 virtual devices, overriding any inherited flag (the
    # pytest conftest exports 8 for single-process tests)
    flags = [f for f in os.environ.get('XLA_FLAGS', '').split()
             if '--xla_force_host_platform_device_count' not in f]
    flags.append('--xla_force_host_platform_device_count=4')
    os.environ['XLA_FLAGS'] = ' '.join(flags)
    # CPU cross-process collectives go through gloo; in a sandboxed
    # container only loopback routes between the two processes
    os.environ.setdefault('GLOO_SOCKET_IFNAME', 'lo')

    import jax
    jax.config.update('jax_platforms', 'cpu')

    from gradtts_tpu.parallel.mesh import initialize_distributed
    assert initialize_distributed(coordinator_address=f'127.0.0.1:{port}',
                                  num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np
    from gradtts_tpu import get_config
    from gradtts_tpu.parallel.mesh import make_mesh
    from gradtts_tpu.train.loop import train

    # real tiny dataset, one PRIVATE copy per process (identical bytes and
    # ordering, so cross-host shapes/values agree without file races):
    # exercises the real per-host input pipeline (each process loads only
    # its 4-row block of the global batch-8) and the epoch-end previews
    # synthesized from all-gathered params.
    from scipy.io import wavfile
    data_dir = os.path.join(log_dir, f'data_{pid}')
    os.makedirs(data_dir, exist_ok=True)
    n_items = 8
    lines = []
    for i in range(n_items):
        t = np.arange(int(22050 * 0.35)) / 22050.0
        g = np.random.default_rng(i)  # seeded by ITEM, same on both hosts
        wav = (0.3 * np.sin(2 * np.pi * (180 + 20 * i) * t)
               + 0.05 * g.standard_normal(t.shape)).astype(np.float32)
        path = os.path.join(data_dir, f'{i}.wav')
        wavfile.write(path, 22050, (wav * 32767).astype(np.int16))
        lines.append(f'{path}|hello world number {i}')
    filelist = os.path.join(data_dir, 'list.txt')
    with open(filelist, 'w') as f:
        f.write('\n'.join(lines))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_config('ljspeech', **{
        'data.train_filelist_path': filelist,
        'data.cmudict_path': os.path.join(repo, 'resources',
                                          'cmu_dictionary'),
        'data.x_buckets': (64,), 'data.y_buckets': (64,),
        'encoder.n_enc_channels': 16, 'encoder.filter_channels': 32,
        'encoder.filter_channels_dp': 16, 'encoder.n_enc_layers': 1,
        'decoder.dec_dim': 16,
        'train.batch_size': 8, 'train.test_size': 1,
        'train.save_every': 1, 'train.use_bf16_compute': False,
        # exercise the device-mel collate through the per-host sharded
        # loader: each process extracts its local rows' mels on its own
        # devices, then the global batch assembles from the local shards
        'train.device_mel': True,
    })
    mesh = make_mesh(data=4, model=2)

    # 8 items / global batch 8 -> 1 step per epoch; 2 epochs = 2 steps,
    # with previews + checkpoint at each epoch end (save_every=1)
    state = train(cfg, n_epochs=2, log_dir=log_dir, mesh=mesh, resume=False)
    step0 = int(state.step)
    assert step0 == 2, step0

    # synthetic batch for the cross-process loss-agreement check below
    B_local, TX, TY = 4, 12, 32
    rng = np.random.default_rng(100 + pid)
    batches = [{
        'x': rng.integers(1, cfg.n_vocab, (B_local, TX)).astype(np.int32),
        'x_lengths': np.full((B_local,), TX, np.int32),
        'y': rng.standard_normal((B_local, TY, cfg.data.n_feats))
             .astype(np.float32),
        'y_lengths': np.full((B_local,), TY, np.int32),
    }]

    # the loss of one more deterministic step must agree across processes
    # (it is a psum over the global batch)
    from gradtts_tpu.models import GradTTS
    from gradtts_tpu.train.state import make_optimizer, make_train_step
    from gradtts_tpu.parallel.mesh import multihost_barrier, shard_batch
    model = GradTTS.from_config(cfg)
    step_fn = jax.jit(make_train_step(model, make_optimizer(1e-4),
                                      out_size=cfg.out_size))
    with mesh:
        sharded = shard_batch(mesh, batches[0], per_host=True)
        k7 = np.asarray(jax.random.PRNGKey(7))
        # compile → barrier → execute, so neither process's first collective
        # of this new program waits on a peer that is still compiling
        compiled = step_fn.lower(state, sharded, k7).compile()
        multihost_barrier('worker/loss_step_compiled')
        _, metrics = compiled(state, sharded, k7)
    print(f'LOSS {float(metrics["loss/total"]):.6f}', flush=True)

    # resume from the checkpoint written at epoch end
    state2 = train(cfg, n_epochs=1, max_steps=1, log_dir=log_dir, mesh=mesh,
                   resume=True, loader=batches)
    print(f'RESUMED {int(state2.step)}', flush=True)


if __name__ == '__main__':
    main()
