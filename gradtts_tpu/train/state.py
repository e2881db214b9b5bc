"""Train state, optimizer, and the jitted distributed train step.

Optimizer parity with the reference trainer (/root/reference/train.py:87,
113-119): Adam(lr=1e-4) with gradient clipping applied PER SUBMODULE — the
encoder tree and the decoder (estimator) tree are each clipped to global
norm 1 separately, and (faithfully) the speaker embedding table is NOT
clipped. Unlike the reference, optimizer state is part of the checkpoint
(the reference only saves model weights, losing Adam moments on resume —
SURVEY.md §5).
"""

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def _subtree_clip(grads_params, max_norm: float):
    """Clip 'encoder' and 'estimator' subtrees to max_norm each; returns
    (clipped_grads, (enc_norm, dec_norm)) — the norms are logged like the
    reference's TB scalars."""
    def global_norm(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))

    def clip(tree, norm):
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
        return jax.tree_util.tree_map(lambda g: g * scale, tree)

    out = dict(grads_params)
    enc_norm = global_norm(grads_params['encoder'])
    dec_norm = global_norm(grads_params['estimator'])
    out['encoder'] = clip(grads_params['encoder'], enc_norm)
    out['estimator'] = clip(grads_params['estimator'], dec_norm)
    return out, (enc_norm, dec_norm)


def make_optimizer(learning_rate: float = 1e-4) -> optax.GradientTransformation:
    return optax.adam(learning_rate)


def init_state(params, optimizer) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params['params']))


def make_train_step(model, optimizer, out_size: Optional[int],
                    grad_clip_norm: float = 1.0, remat: bool = False,
                    fused_attention: Optional[bool] = None):
    """Returns train_step(state, batch, key) -> (state, metrics dict).

    jit-able and shardable: under a mesh, batch arrays arrive sharded over
    'data' and XLA inserts the gradient psum automatically. ``remat``
    rematerializes the U-Net in the backward pass (see compute_loss).

    ``fused_attention`` defaults to on for single-device TPU backends:
    since round 4 the Pallas attention kernel has a real streaming backward
    (two sweeps over (x, dy) instead of recomputing the jnp forward),
    measured faster than the jnp path in the full train step (17.6 -> 17.0
    ms at B16 on v5e). Under a multi-device mesh it defaults OFF because a
    ``pallas_call`` inside pjit has no GSPMD partitioning rule — XLA would
    have to all-gather the sharded batch onto every device to run it.
    The sharded generate path (nbest/sharded synthesis) CAN use it because
    it wraps the whole model call in ``shard_map``, where each device
    traces its own per-shard pallas_call on local shapes; the train step
    instead relies on pjit's automatic gradient psum, so wrapping it in
    shard_map would mean hand-writing the cross-device gradient reduction.
    Pass ``fused_attention=True`` explicitly only with a shard_map-style
    caller.
    """
    from gradtts_tpu.models.tts import compute_loss

    if fused_attention is None:
        # auto-on only single-device: under a multi-device mesh the
        # pallas_call has no GSPMD partitioning rule (the sharded
        # generate.py path wraps it in shard_map instead)
        from gradtts_tpu.ops.pallas.linear_attention import _on_tpu
        fused_attention = _on_tpu() and jax.device_count() == 1

    def loss_fn(params, batch, key, dropout_key):
        res = compute_loss(
            model, params, key, batch['x'], batch['x_lengths'], batch['y'],
            batch['y_lengths'], spk=batch.get('spk'), out_size=out_size,
            train=True, dropout_key=dropout_key, remat=remat,
            fused_attention=fused_attention)
        total = res.dur_loss + res.prior_loss + res.diff_loss
        return total, res

    def train_step(state: TrainState, batch, key):
        key, loss_key, drop_key = jax.random.split(key, 3)
        (total, res), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, loss_key, drop_key)
        gp, (enc_norm, dec_norm) = _subtree_clip(grads['params'],
                                                 grad_clip_norm)
        grads = dict(grads)
        grads['params'] = gp
        updates, opt_state = optimizer.update(grads['params'],
                                              state.opt_state,
                                              state.params['params'])
        new_params = dict(state.params)
        new_params['params'] = optax.apply_updates(state.params['params'],
                                                   updates)
        metrics = {
            'loss/total': total,
            'loss/duration': res.dur_loss,
            'loss/prior': res.prior_loss,
            'loss/diffusion': res.diff_loss,
            'grad_norm/encoder': enc_norm,
            'grad_norm/decoder': dec_norm,
        }
        return TrainState(state.step + 1, new_params, opt_state), metrics

    return train_step
