"""ctypes binding for the native C++/OpenMP Monotonic Alignment Search.

Builds ``libgradtts_mas.so`` on first use (g++ -O3 -fopenmp -shared) and
exposes :func:`maximum_path_native` with the same signature as the JAX op.
This mirrors the reference's native MAS extension
(/root/reference/model/monotonic_align/) as a CPU reference implementation;
the production path on TPU is the jit'd scan in gradtts_tpu/ops/mas.py.
"""

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'mas.cc')

_lib = None


def _lib_path() -> str:
    """Build target: next to the source when the package dir is writable
    (editable/dev installs), else a per-user cache dir keyed by a source
    hash (read-only site-packages installs)."""
    if os.access(_HERE, os.W_OK):
        return os.path.join(_HERE, 'libgradtts_mas.so')
    with open(_SRC, 'rb') as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(
        os.environ.get('XDG_CACHE_HOME',
                       os.path.join(os.path.expanduser('~'), '.cache')),
        'gradtts_tpu')
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f'libgradtts_mas-{tag}.so')


def _build(lib_path: str):
    cmd = ['g++', '-O3', '-march=native', '-fopenmp', '-shared', '-fPIC',
           '-o', lib_path, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib_path = _lib_path()
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(_SRC)):
        _build(lib_path)
    lib = ctypes.CDLL(lib_path)
    lib.gradtts_maximum_path.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.gradtts_maximum_path.restype = None
    _lib = lib
    return lib


def maximum_path_native(value, mask):
    """Batched MAS on CPU via the native library.

    Args:
      value: [B, Tx, Ty] array-like log-prior grid.
      mask: [B, Tx, Ty] array-like attention mask.
    Returns:
      np.ndarray [B, Tx, Ty] float32 binary path.
    """
    lib = _load()
    value = np.ascontiguousarray(np.asarray(value, dtype=np.float32)
                                 * np.asarray(mask, dtype=np.float32))
    b, tx_max, ty_max = value.shape
    path = np.zeros_like(value, dtype=np.int32)
    mask_np = np.asarray(mask)
    t_xs = np.ascontiguousarray((mask_np[:, :, 0] != 0).sum(1).astype(np.int32))
    t_ys = np.ascontiguousarray((mask_np[:, 0, :] != 0).sum(1).astype(np.int32))
    lib.gradtts_maximum_path(
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, tx_max, ty_max)
    return path.astype(np.float32)
