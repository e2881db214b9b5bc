"""Sanitizer targets for the native C++/OpenMP MAS (SURVEY.md §5).

Builds the library together with a self-checking driver under
AddressSanitizer+UBSan (and ThreadSanitizer when the toolchain supports
it) and runs it as a subprocess — in-process loading would require
LD_PRELOADing the sanitizer runtime into pytest.
"""

import os
import subprocess

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
NATIVE = os.path.join(HERE, '..', 'gradtts_tpu', 'ops', 'native')
SRCS = [os.path.join(NATIVE, 'mas.cc'),
        os.path.join(NATIVE, 'mas_sanitize_main.cc')]


def _build_and_run(tmp_path, san_flags, name):
    exe = str(tmp_path / name)
    cmd = ['g++', '-O1', '-g', '-fopenmp', *san_flags, '-o', exe, *SRCS]
    build = subprocess.run(cmd, capture_output=True, text=True)
    if build.returncode != 0:
        pytest.skip(f'{name} build unavailable: {build.stderr[:200]}')
    env = dict(os.environ)
    env.setdefault('ASAN_OPTIONS', 'detect_leaks=0')
    run = subprocess.run([exe], capture_output=True, text=True, env=env,
                         timeout=120)
    assert run.returncode == 0, \
        f'{name} failed:\n{run.stdout}\n{run.stderr[-2000:]}'
    assert 'clean' in run.stdout


def test_mas_asan_ubsan(tmp_path):
    _build_and_run(tmp_path,
                   ['-fsanitize=address,undefined',
                    '-fno-sanitize-recover=all'],
                   'mas_asan')


def test_mas_tsan(tmp_path):
    # OpenMP under TSan needs a tsan-instrumented runtime; archer/libomp
    # are not always present, so a failed BUILD skips. A successful build
    # that then reports a data race fails the test.
    _build_and_run(tmp_path, ['-fsanitize=thread'], 'mas_tsan')
