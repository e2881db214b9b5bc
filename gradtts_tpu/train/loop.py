"""Training loop: epochs over the data loader, jitted sharded step, logging,
checkpoints, and epoch-end synthesis previews.

Behavioral parity target: /root/reference/train.py:59-175 (same scalar
names, same loss accounting, test-batch previews, per-epoch checkpoints),
re-designed for TPU: a single compiled train step runs under a
('data','model') mesh with the batch sharded over 'data'; metrics stay on
device and are fetched in batches (no per-step host sync); checkpoints
carry optimizer state.
"""

import hashlib
import itertools
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
    batch_sharding, make_mesh, multihost_barrier, param_shardings,
    replicated, shard_batch,
)
from gradtts_tpu.train.checkpoint import (
    latest_checkpoint, restore_checkpoint, save_checkpoint,
)
from gradtts_tpu.train.state import (
    TrainState, init_state, make_optimizer, make_train_step,
)

log = logging.getLogger('gradtts_tpu.train')

# Coordination-service barrier ids must not be reused across train() calls
# in one process (the distributed worker calls train() twice for resume;
# barrier-reuse semantics differ across XLA versions) — every invocation
# gets a fresh prefix.
_train_invocations = itertools.count()


class MetricsLogger:
    """TensorBoard (via torch.utils.tensorboard when available) + train.log
    text file, mirroring the reference's logging surfaces."""

    def __init__(self, log_dir, enabled: bool = True):
        """``enabled=False`` makes every method a no-op — used on non-zero
        processes so a shared log_dir isn't written N times."""
        self.log_dir = log_dir
        self._tb = None
        self._txt = None
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
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

    def images(self, images: dict, step: int):
        """HWC uint8 arrays -> TB images (parity: train.py:92-93,158-166)."""
        for k, v in images.items():
            if self._tb is not None:
                self._tb.add_image(k, v, global_step=step,
                                   dataformats='HWC')

    def text(self, msg: str):
        if self._txt is not None:
            self._txt.write(msg + '\n')
            self._txt.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._txt is not None:
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
    multihost = jax.process_count() > 1
    bar = f'train{next(_train_invocations)}'  # per-invocation barrier prefix

    dtype = jnp.bfloat16 if cfg.train.use_bf16_compute else jnp.float32
    model = GradTTS.from_config(cfg, dtype=dtype)
    # The PRNG key lives on the host as numpy: numpy inputs are valid on a
    # multi-process mesh (every process passes the same value), committed
    # process-local jax.Arrays are not.
    key = np.asarray(jax.random.PRNGKey(cfg.train.seed))

    def split_key(k):
        a, b = jax.random.split(k)
        return np.asarray(a), np.asarray(b)

    dataset = None
    if loader is None:
        dataset = dataset_from_config(cfg, 'train')
        collate = BatchCollate(x_buckets=cfg.data.x_buckets,
                               y_buckets=cfg.data.y_buckets)
        # per-host input pipeline: each process loads only its block of
        # every global batch (same shuffled order everywhere)
        shard = ((jax.process_index(), jax.process_count())
                 if multihost else None)
        device_mel = cfg.train.device_mel
        if device_mel is None:  # auto: single-host TPU extracts on-device
            device_mel = (jax.devices()[0].platform in ('tpu', 'axon')
                          and not multihost)
        loader = DataLoader(dataset, cfg.train.batch_size, collate,
                            shuffle=True, seed=cfg.train.seed, shard=shard,
                            device_mel=device_mel)

    try:
        first = next(iter(loader))
    except StopIteration:
        raise ValueError(
            'training dataset produced no batches — check '
            f'data.train_filelist_path ({cfg.data.train_filelist_path!r}) '
            f'and batch_size ({cfg.train.batch_size}) vs dataset size')
    key, init_key = split_key(key)

    optimizer = make_optimizer(cfg.train.learning_rate)

    # Initialize INSIDE jit with out_shardings so parameters materialize
    # already sharded across the (possibly multi-host) mesh; dummy shapes
    # are compile-time constants, so no host batch crosses process
    # boundaries.
    x0 = np.zeros((2, 8), np.int32)
    l0 = np.full((2,), 8, np.int32)
    y0 = np.zeros((2, 8, cfg.data.n_feats), np.float32)
    spk0 = (np.zeros((2,) + np.shape(first['spk'])[1:],
                     np.asarray(first['spk']).dtype)
            if 'spk' in first else None)

    def init_all(k):
        params = model.init(k, x0, l0, y0, l0, spk0)
        return init_state(params, optimizer)

    abstract = jax.eval_shape(init_all, jax.random.PRNGKey(0))
    state_shardings = TrainState(
        step=replicated(mesh),
        params=param_shardings(mesh, abstract.params),
        opt_state=param_shardings(mesh, abstract.opt_state))
    with mesh:
        init_jit = jax.jit(init_all, out_shardings=state_shardings)
        if multihost:
            # compile -> barrier -> execute: the first collective of a new
            # program must not start while a peer is still compiling (the
            # cross-process communicator bring-up has a ~30s key-exchange
            # timeout; see multihost_barrier docstring)
            init_exec = init_jit.lower(init_key).compile()
            multihost_barrier(f'{bar}/init_compiled')
            state = init_exec(init_key)
        else:
            state = init_jit(init_key)

    start_step = 0
    ckpt_dir = os.path.join(log_dir, 'ckpt')
    latest = latest_checkpoint(ckpt_dir) if resume else None
    if latest:
        # typed restore: the freshly-initialized state is the template, so
        # optax NamedTuple states come back as the right types (untyped
        # orbax restore yields plain dicts/lists that adam rejects)
        template = {'step': np.zeros((), np.int32),
                    'params': jax.tree_util.tree_map(
                        lambda s: np.zeros(s.shape, s.dtype),
                        abstract.params),
                    'opt_state': jax.tree_util.tree_map(
                        lambda s: np.zeros(s.shape, s.dtype),
                        abstract.opt_state)}
        try:  # checkpoints written by the loop carry the PRNG key
            import orbax.checkpoint as ocp
            md = ocp.PyTreeCheckpointer().metadata(latest)
            tree = getattr(getattr(md, 'item_metadata', md), 'tree', None)
            if tree is not None and 'key' in tree:
                template['key'] = np.zeros((2,), np.uint32)
        except Exception:
            pass
        payload = restore_checkpoint(ckpt_dir, template=template)
        with mesh:
            reshard_jit = jax.jit(lambda s: s, out_shardings=state_shardings)
            restored = TrainState(step=np.asarray(payload['step'], np.int32),
                                  params=payload['params'],
                                  opt_state=payload['opt_state'])
            if multihost:  # same compile -> barrier -> execute discipline
                reshard_exec = reshard_jit.lower(restored).compile()
                multihost_barrier(f'{bar}/restore_compiled')
                state = reshard_exec(restored)
            else:
                state = reshard_jit(restored)
        if 'key' in payload:
            key = np.asarray(payload['key'])
        start_step = int(payload['step'])
        log.info('resumed from step %d', start_step)

    step_fn = make_train_step(model, optimizer, out_size=cfg.out_size,
                              grad_clip_norm=cfg.train.grad_clip_norm,
                              remat=cfg.train.remat_estimator)
    # Pin the output state to the SAME canonical shardings as the input
    # state: without this GSPMD propagates its own (e.g. TP-sharded biases)
    # onto the updated params, which forces a second silent compile on step
    # 2 under jit and breaks AOT executables outright.
    jit_step = jax.jit(step_fn, donate_argnums=(0,),
                       out_shardings=(state_shardings, replicated(mesh)))
    if multihost:
        # don't let a fast-compiling process start executing collectives
        # while a peer is still compiling (see multihost_barrier docstring)
        multihost_barrier(f'{bar}/state_ready')
    # Per batch-signature AOT executables (multihost only): agree on the
    # signature, compile, barrier, then execute — keeps every process's
    # first collective of a new program within the communicator bring-up
    # window. Barrier names are derived from a HASH of the signature (not a
    # local counter), so divergent shapes can never silently pair up two
    # different programs; the pre-compile `sig` barrier fails fast with a
    # diagnostic if hosts ever disagree (they shouldn't: the sharded
    # DataLoader derives shapes from global metadata).
    _executables = {}

    def run_step(st, sharded, step_key):
        if not multihost:
            return jit_step(st, sharded, step_key)
        sig = tuple(sorted((k, np.shape(v), str(np.asarray(v).dtype) if
                            isinstance(v, np.ndarray) else str(v.dtype))
                           for k, v in sharded.items()))
        if sig not in _executables:
            digest = hashlib.sha1(repr(sig).encode()).hexdigest()[:16]
            try:
                multihost_barrier(f'{bar}/sig_{digest}', timeout_s=300)
            except Exception as e:
                raise RuntimeError(
                    'cross-process batch-shape agreement barrier failed — '
                    'hosts likely collated different shapes for the same '
                    f'global batch. Local signature: {sig}') from e
            _executables[sig] = jit_step.lower(st, sharded,
                                               step_key).compile()
            multihost_barrier(f'{bar}/compiled_{digest}')
        return _executables[sig](st, sharded, step_key)

    metrics_log = MetricsLogger(log_dir, enabled=jax.process_index() == 0)

    # Epoch-end synthesis previews (parity: train.py:88-94 ground-truth
    # images at step 0; :151-172 enc/dec/alignment TB images + PNGs every
    # save_every epochs). Previews run on FULL host-gathered params so they
    # work under tensor parallelism and multihost (sample_test_batch is
    # seed-deterministic, so every process picks the same items and the
    # gather collective lines up; only process 0 synthesizes/writes).
    test_items = None
    if (synthesis_every_epoch and dataset is not None
            and len(dataset) >= cfg.train.test_size):
        from gradtts_tpu.utils.plotting import plot_tensor, save_plot
        test_items = dataset.sample_test_batch(cfg.train.test_size)
        if jax.process_index() == 0:
            gt = {}
            for i, item in enumerate(test_items):
                gt[f'image_{i}/ground_truth'] = plot_tensor(item['y'].T)
                save_plot(item['y'].T, os.path.join(log_dir,
                                                    f'original_{i}.png'))
            metrics_log.images(gt, 0)

    # All-gather params to host numpy: one jitted identity with replicated
    # out_shardings (XLA inserts the all-gather over ICI); every process
    # then holds a complete copy. Compile -> barrier -> execute, same
    # discipline as the train step (see multihost_barrier docstring).
    _gather_exec = []

    def gather_params_to_host(params):
        gather = jax.jit(lambda p: p, out_shardings=replicated(mesh))
        if multihost:
            if not _gather_exec:
                _gather_exec.append(gather.lower(params).compile())
                multihost_barrier(f'{bar}/gather_compiled')
            full = _gather_exec[0](params)
        else:
            full = gather(params)
        return jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x.addressable_data(0))),
            full)

    def log_previews(at_step):
        from gradtts_tpu.utils.plotting import plot_tensor, save_plot
        host_params = gather_params_to_host(state.params)
        if jax.process_index() != 0:
            return
        previews = synthesis_preview(cfg, model, host_params, test_items,
                                     n_timesteps=50)
        for i, (y_enc, y_dec, attn) in enumerate(previews):
            metrics_log.images({
                f'image_{i}/generated_enc': plot_tensor(y_enc.T),
                f'image_{i}/generated_dec': plot_tensor(y_dec.T),
                f'image_{i}/alignment': plot_tensor(attn),
            }, at_step)
            save_plot(y_enc.T, os.path.join(log_dir, f'generated_enc_{i}.png'))
            save_plot(y_dec.T, os.path.join(log_dir, f'generated_dec_{i}.png'))
            save_plot(attn, os.path.join(log_dir, f'alignment_{i}.png'))

    # Metrics stay ON DEVICE during the epoch (the reference fetches 5
    # scalars per step, train.py:121-130, forcing a device round trip that
    # serializes the pipeline). Buffered device scalars are fetched in one
    # device_get every `flush_every` steps / at epoch end, then written to
    # TB retroactively with their true global_step — same scalar names and
    # granularity, no per-step host sync.
    flush_every = 50
    step = start_step
    with mesh:
        for epoch in range(n_epochs):
            epoch_metrics = []
            pending = []  # [(step, {name: device scalar})]

            def flush():
                if not pending:
                    return
                fetched = jax.device_get([m for _, m in pending])
                for (at_step, _), vals in zip(pending, fetched):
                    host = {k: float(v) for k, v in vals.items()}
                    epoch_metrics.append(host)
                    metrics_log.scalars(host, at_step)
                pending.clear()

            t0 = time.time()
            for batch in loader:
                key, step_key = split_key(key)
                sharded = shard_batch(mesh, batch, per_host=multihost)
                state, metrics = run_step(state, sharded, step_key)
                step += 1
                pending.append((step, metrics))
                if len(pending) >= flush_every:
                    flush()
                if max_steps is not None and step - start_step >= max_steps:
                    break
            flush()
            means = {k: float(np.mean([m[k] for m in epoch_metrics]))
                     for k in epoch_metrics[0]} if epoch_metrics else {}
            msg = (f'epoch {epoch}: ' + ', '.join(
                f'{k}={v:.4f}' for k, v in means.items())
                + f' ({time.time() - t0:.1f}s)')
            log.info(msg)
            metrics_log.text(msg)
            if (epoch + 1) % cfg.train.save_every == 0:
                if test_items is not None:
                    log_previews(step)
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
        spk = None
        if 'spk' in item:
            s = jnp.asarray(item['spk'])
            # speaker-id items carry a [1] int id (already batch-shaped);
            # zero-speaker items carry a [spk_emb_dim] float vector
            spk = s[None] if s.dtype.kind == 'f' else s
        budget = int(4 * max(32, 2 * x.shape[1]))
        res = synthesize(model, {'params': params['params']}, x, xl,
                         n_timesteps=n_timesteps, y_max_length=budget,
                         key=key, spk=spk)
        L = int(res.y_lengths[0])
        out.append((np.array(res.encoder_outputs[0, :L]),
                    np.array(res.decoder_outputs[0, :L]),
                    np.array(res.attn[0, :, :L])))
    return out
