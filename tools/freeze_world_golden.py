"""Regenerate tests/fixtures/world_golden.npz (the regression pin for the
from-scratch WORLD/SPTK backend, tests/test_eval.py::test_world_golden_values).

Run after any DELIBERATE numerics change to eval/worldnp.py:

    JAX_PLATFORMS=cpu python tools/freeze_world_golden.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    from gradtts_tpu.data.dataset import load_wav
    from gradtts_tpu.eval import evaluate_pair
    from gradtts_tpu.eval.world import sptk_mcep, world_extract

    fixtures = os.path.join(REPO, 'tests', 'fixtures')
    a, fs = load_wav(os.path.join(fixtures, 'eval_a.wav'))
    b, _ = load_wav(os.path.join(fixtures, 'eval_b.wav'))
    mc_a, f0_a = world_extract(a, fs, impl='numpy')
    _, f0_b = world_extract(b, fs, impl='numpy')
    sm_a = sptk_mcep(a, fs, impl='numpy')
    m_ab = evaluate_pair(a, b, fs, backend='world')
    names = sorted(m_ab)
    out = os.path.join(fixtures, 'world_golden.npz')
    np.savez(out, f0_a=f0_a, f0_b=f0_b, mcep_f0_a=mc_a, sptk_mcep_a=sm_a,
             metric_names=np.array(names),
             metrics_ab=np.array([m_ab[k] for k in names]))
    print(f'wrote {out}:', {k: round(m_ab[k], 6) for k in names})


if __name__ == '__main__':
    main()
