"""Device mesh and sharding rules.

The reference has no multi-device path at all (single .cuda() device,
SURVEY.md §2.5); here distribution is native: a ('data', 'model') mesh,
batches sharded over 'data' (XLA inserts psum for gradients over ICI), and
an optional tensor-parallel 'model' axis that shards the wide channel
dimensions of the U-Net and encoder FFN weights.
"""

import os
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Multi-host bring-up: ``jax.distributed.initialize`` with env-var
    auto-detection (SURVEY.md §5 elastic-recovery plan).

    On TPU pods JAX infers everything from the TPU metadata, so a bare
    call suffices; elsewhere (CPU/GPU or manual setups) the coordinator
    triple comes from the arguments or JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID. Returns True when a multi-process
    runtime was initialized, False for the single-process fallback (so
    single-host runs need no special casing). Safe to call twice.
    """
    coordinator_address = coordinator_address or \
        os.environ.get('JAX_COORDINATOR_ADDRESS')
    if num_processes is None and 'JAX_NUM_PROCESSES' in os.environ:
        num_processes = int(os.environ['JAX_NUM_PROCESSES'])
    if process_id is None and 'JAX_PROCESS_ID' in os.environ:
        process_id = int(os.environ['JAX_PROCESS_ID'])
    if coordinator_address is None and num_processes is None:
        # TPU-pod auto-detection only: off-pod single process, do nothing
        if os.environ.get('TPU_WORKER_HOSTNAMES') is None:
            return False
        jax.distributed.initialize()
        return True
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if 'already' not in str(e):
            raise
    return True


def multihost_barrier(name: str, timeout_s: int = 1200) -> None:
    """Block until every process reaches this barrier (coordination
    service, NOT a device collective).

    Needed because XLA's cross-process communicator bring-up has a short
    hard-coded key-exchange timeout (~30 s in the gloo CPU backend): if one
    process finishes compiling a program and starts executing its first
    collective while a peer is still compiling, the fast process times out.
    A barrier between compile and first execution removes the skew. No-op
    in single-process runs.
    """
    if jax.process_count() <= 1:
        return
    client = None
    try:
        # internal module layout changes across JAX releases; fall back to
        # the public (device-collective) sync if it moves
        from jax._src import distributed
        client = distributed.global_state.client
    except Exception:
        client = None
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_s * 1000)
    else:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh. data == -1 uses all remaining
    devices after the model axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model < 1 or n % model:
        raise ValueError(f'model axis {model} must divide device count {n}')
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f'mesh {data}x{model} != {n} devices')
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ('data', 'model'))


def batch_sharding(mesh: Mesh):
    """Shard the leading batch axis over 'data', replicate the rest."""
    def shard(x):
        spec = P('data', *([None] * (np.ndim(x) - 1))) if np.ndim(x) else P()
        return NamedSharding(mesh, spec)
    return shard


def shard_batch(mesh: Mesh, batch: dict, per_host: bool = False) -> dict:
    """Place a batch dict on the mesh, batch axis sharded over 'data'.

    Single process: plain ``device_put``. Multi-process (``per_host=True``,
    the per-host input pipeline): each process passes only its LOCAL rows
    (``DataLoader(shard=(process_index, process_count))``) and the global
    array is assembled with ``make_array_from_process_local_data`` — no
    host ever materializes the global batch, which is the point of a
    per-host input pipeline on a pod.
    """
    fn = batch_sharding(mesh)
    if not per_host or jax.process_count() == 1:
        return {k: jax.device_put(v, fn(v)) for k, v in batch.items()}
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        sharding = fn(v)
        global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, global_shape)
    return out


# --- parameter sharding rules (tensor parallelism) ------------------------

# Param-path substrings whose kernels are worth sharding when the 'model'
# axis is > 1: the wide FFN/attention projections in the encoder and every
# conv/dense kernel in the U-Net. Sharding is over the OUTPUT channel (last
# axis); XLA all-gathers activations as needed over ICI.
_TP_HINTS = ('ffn_layers', 'conv_q', 'conv_k', 'conv_v', 'conv_o',
             'to_qkv', 'to_out', 'block1', 'block2', 'res_conv',
             'mlp_dense', 'spk_mlp', 'mlp_0', 'mlp_2')


def param_pspec(path, leaf, model_size: int) -> P:
    """PartitionSpec for one parameter leaf."""
    if model_size <= 1:
        return P()
    names = [getattr(k, 'key', str(k)) for k in path]
    joined = '/'.join(names)
    shape = np.shape(leaf)
    if (len(shape) >= 2 and names[-1] == 'kernel'
            and any(h in joined for h in _TP_HINTS)
            and shape[-1] % model_size == 0):
        return P(*([None] * (len(shape) - 1) + ['model']))
    return P()


def param_shardings(mesh: Mesh, params):
    model_size = mesh.shape.get('model', 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_pspec(path, leaf, model_size)),
        params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
