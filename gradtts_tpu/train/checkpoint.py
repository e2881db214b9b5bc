"""Checkpointing via Orbax with atomic per-step directories.

Improves on the reference's ``torch.save(state_dict)`` per epoch
(/root/reference/train.py:174-175, utils.py:30-45): optimizer state, step
counter, and PRNG key are all saved, so resume is exact; writes are atomic
(orbax rename semantics) so a crash mid-save can't corrupt the latest
checkpoint.
"""

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, state, step: int, key=None):
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f'step_{step:08d}')
    multihost = jax.process_count() > 1
    # Single host: pull to numpy (cheap, keeps the file layout trivial).
    # Multi-host: hand orbax the sharded jax.Arrays directly — every
    # process writes its own shards, process 0 the metadata; a device_get
    # here would fail on non-addressable shards.
    fetch = (lambda t: t) if multihost else jax.device_get
    payload = {
        'step': np.asarray(step),
        'params': fetch(state.params),
        'opt_state': fetch(state.opt_state),
    }
    if key is not None:
        payload['key'] = fetch(key)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if d.startswith('step_')
             and os.path.isdir(os.path.join(ckpt_dir, d))]
    if not steps:
        return None
    return os.path.join(ckpt_dir, sorted(steps)[-1])


def restore_checkpoint(ckpt_dir: str, template: Optional[Any] = None,
                       path: Optional[str] = None):
    """Restore the latest (or a specific) checkpoint. Returns the raw
    payload dict or None if nothing to restore."""
    path = path or latest_checkpoint(ckpt_dir)
    if path is None:
        return None
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)
