"""Training loop: epochs over the data loader, jitted sharded step, logging,
checkpoints, and epoch-end synthesis previews.

Behavioral parity target: /root/reference/train.py:59-175 (same scalar
names, same loss accounting, test-batch previews, per-epoch checkpoints),
re-designed for TPU: a single compiled train step runs under a
('data','model') mesh with the batch sharded over 'data'; metrics are host
scalars once per step; checkpoints carry optimizer state.
"""

import logging
import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from gradtts_tpu.config import GradTTSConfig
from gradtts_tpu.data.dataset import (
    BatchCollate, DataLoader, dataset_from_config,
)
from gradtts_tpu.models import GradTTS, synthesize
from gradtts_tpu.parallel.mesh import (
    batch_sharding, make_mesh, param_shardings, replicated, shard_batch,
)
from gradtts_tpu.train.checkpoint import (
    latest_checkpoint, restore_checkpoint, save_checkpoint,
)
from gradtts_tpu.train.state import (
    TrainState, init_state, make_optimizer, make_train_step,
)

log = logging.getLogger('gradtts_tpu.train')


class MetricsLogger:
    """TensorBoard (via torch.utils.tensorboard when available) + train.log
    text file, mirroring the reference's logging surfaces."""

    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass
        self._txt = open(os.path.join(log_dir, 'train.log'), 'a')

    def scalars(self, metrics: dict, step: int):
        for k, v in metrics.items():
            if self._tb is not None:
                self._tb.add_scalar(k, float(v), global_step=step)

    def text(self, msg: str):
        self._txt.write(msg + '\n')
        self._txt.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._txt.close()


def train(cfg: GradTTSConfig, n_epochs: Optional[int] = None,
          max_steps: Optional[int] = None, log_dir: Optional[str] = None,
          mesh=None, resume: bool = True, loader=None,
          synthesis_every_epoch: bool = True):
    """Run training per config. Returns the final TrainState.

    ``loader``/``max_steps`` exist for tests (inject a synthetic dataset,
    bound the work).
    """
    log_dir = log_dir or cfg.train.log_dir
    n_epochs = n_epochs if n_epochs is not None else cfg.train.n_epochs
    mesh = mesh or make_mesh(cfg.train.mesh_data, cfg.train.mesh_model)

    dtype = jnp.bfloat16 if cfg.train.use_bf16_compute else jnp.float32
    model = GradTTS.from_config(cfg, dtype=dtype)
    key = jax.random.PRNGKey(cfg.train.seed)

    if loader is None:
        dataset = dataset_from_config(cfg, 'train')
        collate = BatchCollate(x_buckets=cfg.data.x_buckets,
                               y_buckets=cfg.data.y_buckets)
        loader = DataLoader(dataset, cfg.train.batch_size, collate,
                            shuffle=True, seed=cfg.train.seed)

    # init on host then place with shardings
    try:
        first = next(iter(loader))
    except StopIteration:
        raise ValueError(
            'training dataset produced no batches — check '
            f'data.train_filelist_path ({cfg.data.train_filelist_path!r}) '
            f'and batch_size ({cfg.train.batch_size}) vs dataset size')
    key, init_key = jax.random.split(key)
    params = jax.jit(model.init)(
        init_key, jnp.asarray(first['x']), jnp.asarray(first['x_lengths']),
        jnp.asarray(first['y']), jnp.asarray(first['y_lengths']),
        jnp.asarray(first['spk']) if 'spk' in first else None)

    optimizer = make_optimizer(cfg.train.learning_rate)
    state = init_state(params, optimizer)

    p_shard = param_shardings(mesh, state.params)
    state = TrainState(
        step=jax.device_put(state.step, replicated(mesh)),
        params=jax.device_put(state.params, p_shard),
        opt_state=jax.device_put(state.opt_state,
                                 param_shardings(mesh, state.opt_state)))

    start_step = 0
    ckpt_dir = os.path.join(log_dir, 'ckpt')
    if resume and latest_checkpoint(ckpt_dir):
        payload = restore_checkpoint(ckpt_dir)
        state = TrainState(
            step=jnp.asarray(payload['step']),
            params=jax.device_put(payload['params'], p_shard),
            opt_state=jax.device_put(
                payload['opt_state'], param_shardings(mesh, payload['opt_state'])))
        if 'key' in payload:
            key = jnp.asarray(payload['key'])
        start_step = int(payload['step'])
        log.info('resumed from step %d', start_step)

    step_fn = make_train_step(model, optimizer, out_size=cfg.out_size,
                              grad_clip_norm=cfg.train.grad_clip_norm)
    jit_step = jax.jit(step_fn, donate_argnums=(0,))

    metrics_log = MetricsLogger(log_dir)
    step = start_step
    with mesh:
        for epoch in range(n_epochs):
            epoch_metrics = []
            t0 = time.time()
            for batch in loader:
                key, step_key = jax.random.split(key)
                sharded = shard_batch(mesh, batch)
                state, metrics = jit_step(state, sharded, step_key)
                step += 1
                epoch_metrics.append(
                    {k: float(v) for k, v in metrics.items()})
                metrics_log.scalars(epoch_metrics[-1], step)
                if max_steps is not None and step - start_step >= max_steps:
                    break
            means = {k: float(np.mean([m[k] for m in epoch_metrics]))
                     for k in epoch_metrics[0]} if epoch_metrics else {}
            msg = (f'epoch {epoch}: ' + ', '.join(
                f'{k}={v:.4f}' for k, v in means.items())
                + f' ({time.time() - t0:.1f}s)')
            log.info(msg)
            metrics_log.text(msg)
            if (epoch + 1) % cfg.train.save_every == 0:
                save_checkpoint(ckpt_dir, state, step, key)
            if max_steps is not None and step - start_step >= max_steps:
                break
    metrics_log.close()
    return state


def synthesis_preview(cfg: GradTTSConfig, model, params, test_items,
                      n_timesteps=50, key=None):
    """Epoch-end synthesis of held-out items (parity: train.py:151-172).
    Returns list of (encoder_mel, decoder_mel, attn) numpy arrays."""
    key = key if key is not None else jax.random.PRNGKey(0)
    out = []
    for item in test_items:
        x = jnp.asarray(item['x'])[None]
        xl = jnp.asarray([x.shape[1]])
        budget = int(4 * max(32, 2 * x.shape[1]))
        res = synthesize(model, {'params': params['params']}, x, xl,
                         n_timesteps=n_timesteps, y_max_length=budget,
                         key=key)
        L = int(res.y_lengths[0])
        out.append((np.array(res.encoder_outputs[0, :L]),
                    np.array(res.decoder_outputs[0, :L]),
                    np.array(res.attn[0, :, :L])))
    return out
