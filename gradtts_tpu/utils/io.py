"""Lightweight param (de)serialization helpers (single-file .npz format,
handy for tests and for shipping converted reference checkpoints)."""

import numpy as np

import jax


def _flatten(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        key = f'{prefix}/{k}' if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(path, params):
    np.savez(path, **_flatten(jax.device_get(params)))


def load_params_npz(path):
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})
