"""Test bootstrap: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding paths are validated on CPU exactly as they would run on a
TPU slice; bench.py is the only place that targets the real chip.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

# The axon sitecustomize registers the tunneled-TPU backend at interpreter
# start and force-sets jax_platforms='axon,cpu', overriding JAX_PLATFORMS
# from the environment — override it back before any backend is touched.
import jax

jax.config.update('jax_platforms', 'cpu')

import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO_ROOT, os.path.dirname(os.path.abspath(__file__))):
    if p not in sys.path:
        sys.path.insert(0, p)
