"""True multi-process distributed training test.

Spawns TWO python processes, each with 4 virtual CPU devices, joined via
``jax.distributed.initialize`` into one 8-device ('data','model')=(4,2)
mesh spanning the processes. Validates the full multi-host path the way a
TPU pod would run it: per-host input pipeline (each process loads only its
rows), ``make_array_from_process_local_data`` batch assembly, jit init with
process-spanning out_shardings, XLA collectives across the process
boundary, multihost orbax checkpoint save, and typed resume.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'distributed_worker.py')


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)  # the worker forces cpu itself
    env['JAX_COMPILATION_CACHE_DIR'] = '/tmp/jax_cache'
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')

    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'worker failed:\n{out[-4000:]}'

    losses, resumed = [], []
    for out in outs:
        for line in out.splitlines():
            if line.startswith('LOSS '):
                losses.append(float(line.split()[1]))
            if line.startswith('RESUMED '):
                resumed.append(int(line.split()[1]))
    assert len(losses) == 2 and len(resumed) == 2, outs
    # the psum'd global loss must be identical on both hosts
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    # both resumed from step 2 and took one more step
    assert resumed == [3, 3]

    # epoch-end synthesis previews under multihost: process 0 synthesized
    # from all-gathered params and wrote the reference's visual surfaces
    # (parity: /root/reference/train.py:88-94, 151-172)
    for stem in ('original', 'generated_enc', 'generated_dec', 'alignment'):
        path = os.path.join(str(tmp_path), f'{stem}_0.png')
        assert os.path.exists(path), path
