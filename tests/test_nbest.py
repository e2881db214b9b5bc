"""n-best rescoring subsystem: WER, linear rescoring, TPE sweep, and the
end-to-end batched likelihood scorer (tiny model, CPU)."""

import json
import os

import numpy as np
import pytest

from gradtts_tpu.nbest import (
    NBestList, SCORE_NAMES, edit_counts, make_synthetic_n_best,
    rescoring_wer, select_hypotheses, tpe_minimize, wer, wer_details,
    compile_scores,
)


# --- WER -------------------------------------------------------------------


def test_edit_counts_basic():
    assert edit_counts(['a', 'b', 'c'], ['a', 'b', 'c']) == (0, 0, 0, 3)
    assert edit_counts(['a', 'b', 'c'], ['a', 'x', 'c']) == (1, 0, 0, 2)
    assert edit_counts(['a', 'b', 'c'], ['a', 'c']) == (0, 1, 0, 2)
    assert edit_counts(['a', 'c'], ['a', 'b', 'c']) == (0, 0, 1, 2)
    assert edit_counts([], ['a']) == (0, 0, 1, 0)
    assert edit_counts(['a'], []) == (0, 1, 0, 0)


def test_wer_corpus_level():
    # jiwer semantics: total errors / total reference words across pairs
    refs = ['the cat sat', 'on the mat']
    hyps = ['the cat sat', 'on a mat']
    assert wer(refs, hyps) == pytest.approx(1 / 6)
    d = wer_details(refs, hyps)
    assert d['substitutions'] == 1 and d['ref_words'] == 6
    assert wer('hello world', 'hello world') == 0.0


def test_wer_against_torchaudio_edit_distance():
    """Cross-check our Levenshtein against torchaudio's reference
    implementation on random word sequences."""
    torchaudio = pytest.importorskip('torchaudio')
    rng = np.random.default_rng(0)
    vocab = ['a', 'b', 'c', 'd']
    for _ in range(25):
        r = [vocab[i] for i in rng.integers(0, 4, rng.integers(0, 9))]
        h = [vocab[i] for i in rng.integers(0, 4, rng.integers(0, 9))]
        s, d, i, _hits = edit_counts(r, h)
        assert s + d + i == torchaudio.functional.edit_distance(r, h)


# --- lists + rescoring -----------------------------------------------------


def _toy_list():
    entries = [
        {'target': 'the cat sat', 'hyps': ['the cat sad', 'the cat sat',
                                           'a cat sat']},
        {'target': 'hello world', 'hyps': ['hello world', 'hello word',
                                           'jello world']},
    ]
    return NBestList(make_synthetic_n_best(entries, seed=0))


def test_zero_weights_picks_first_pass():
    n_best = _toy_list()
    weights = {name: 0.0 for name in SCORE_NAMES}
    hyps = select_hypotheses(n_best, weights, N=3)
    # stable argmin at all-zero scores -> rank 0 (first-pass baseline)
    assert hyps == ['the cat sad', 'hello world']
    w = rescoring_wer(n_best, weights, N=3)
    assert w == pytest.approx(1 / 5)  # 1 substitution over 5 ref words


def test_oracle_feature_drives_selection():
    n_best = _toy_list()
    # plant an oracle: diffusion_score = WER of the hypothesis
    for i in range(len(n_best)):
        for n in range(3):
            n_best.beam(i, n)['diffusion_score'] = wer(
                n_best.target(i), n_best.hypothesis(i, n))
    weights = {name: 0.0 for name in SCORE_NAMES}
    weights['diffusion_score'] = 1.0  # minimize -> pick lowest WER
    assert rescoring_wer(n_best, weights, N=3) == 0.0


def test_set_diffusion_scores_and_feature_matrix():
    n_best = _toy_list()
    scores = np.arange(6, dtype=np.float64).reshape(2, 3)
    n_best.set_diffusion_scores(scores, N=3)
    feats = n_best.feature_matrix(3)
    k = SCORE_NAMES.index('diffusion_score')
    np.testing.assert_array_equal(feats[:, :, k], scores)


def test_dict_keyed_beams_normalize():
    raw = [{'targets': ['x y'],
            'beams': [{1: {'text': 'x z'}, 0: {'text': 'x y'}}]}]
    n_best = NBestList(raw)
    assert n_best.hypothesis(0, 0) == 'x y'
    assert n_best.hypothesis(0, 1) == 'x z'


def test_empty_hypothesis_becomes_space():
    raw = [{'targets': ['x'], 'beams': [[{'text': ''}]]}]
    assert NBestList(raw).hypothesis(0, 0) == ' '


# --- TPE sweep -------------------------------------------------------------


def test_tpe_minimize_quadratic():
    space = {'a': (-2.0, 2.0), 'b': (-2.0, 2.0)}

    def objective(p):
        return (p['a'] - 0.5) ** 2 + (p['b'] + 1.0) ** 2

    res = tpe_minimize(objective, space, n_trials=120, seed=0)
    assert res.best_value < 0.1
    assert abs(res.best_params['a'] - 0.5) < 0.5
    assert abs(res.best_params['b'] + 1.0) < 0.5
    # TPE should beat pure random search with the same budget
    rng = np.random.default_rng(0)
    rand_best = min(objective({'a': a, 'b': b}) for a, b in
                    rng.uniform(-2, 2, size=(120, 2)))
    assert res.best_value <= rand_best * 2.0


def test_tpe_improves_toy_rescoring_wer():
    rng = np.random.default_rng(3)
    entries = []
    for i in range(12):
        correct = f'sentence number {i} ok'
        wrongs = [f'sentence number {i} bad', f'sentence numero {i} ok']
        hyps = [wrongs[0], correct, wrongs[1]]
        entries.append({'target': correct, 'hyps': hyps})
    n_best = NBestList(make_synthetic_n_best(entries, seed=3))
    # informative feature: am_score is low for the correct hypothesis
    for i in range(len(n_best)):
        for n in range(3):
            h = n_best.hypothesis(i, n)
            n_best.beam(i, n)['am_score'] = \
                -5.0 + 10.0 * wer(n_best.target(i), h) \
                + 0.1 * rng.standard_normal()
    feats = n_best.feature_matrix(3)
    space = {'am_score': (0.0, 2.0)}
    zero = {name: 0.0 for name in SCORE_NAMES}

    def objective(p):
        w = dict(zero)
        w.update(p)
        return rescoring_wer(n_best, w, 3, features=feats)

    base = objective({})
    res = tpe_minimize(objective, space, n_trials=30, seed=0)
    assert res.best_value < base


# --- scoring engine (tiny model) ------------------------------------------


class _TinyDataset:
    """dataset protocol for score_n_best: real mels + text tokenizer."""

    def __init__(self, n_utts, T=16, F=8, seed=0):
        rng = np.random.default_rng(seed)
        self.mels = [rng.standard_normal((T, F)).astype(np.float32)
                     for _ in range(n_utts)]

    def get_text(self, text):
        ids = [1 + (ord(c) % 40) for c in text.strip() or ' ']
        return np.asarray(ids[:12], np.int32)

    def __getitem__(self, i):
        return {'y': self.mels[i]}

    def __len__(self):
        return len(self.mels)


@pytest.fixture(scope='module')
def tiny_scored(tmp_path_factory):
    import jax
    from gradtts_tpu.models import GradTTS
    from gradtts_tpu.nbest import NBestScorer, score_n_best
    import jax.numpy as jnp

    model = GradTTS(n_vocab=50, n_enc_channels=16, filter_channels=32,
                    filter_channels_dp=16, n_heads=2, n_enc_layers=1,
                    n_feats=8, dec_dim=8)
    ds = _TinyDataset(2)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
        jnp.array([8]), jnp.zeros((1, 8, 8)), jnp.array([8]), None)

    entries = [{'target': 'ab cd', 'hyps': ['ab cd', 'ab ce']},
               {'target': 'ef gh', 'hyps': ['ef gh', 'xf gh']}]
    n_best = NBestList(make_synthetic_n_best(entries))

    out_dir = str(tmp_path_factory.mktemp('scores'))
    scorer = NBestScorer(model, params, n_euler=4, batch_size=4,
                         x_buckets=(16,), y_buckets=(16,))
    n = score_n_best(scorer, ds, n_best, N=2, out_dir=out_dir, seed=1)
    return scorer, ds, n_best, out_dir, n


def test_score_n_best_writes_all_pairs(tiny_scored):
    _scorer, _ds, _n_best, out_dir, n = tiny_scored
    assert n == 4
    files = sorted(f for f in os.listdir(out_dir) if f.endswith('.json'))
    assert files == ['0_0.json', '0_1.json', '1_0.json', '1_1.json']
    payload = json.load(open(os.path.join(out_dir, '0_1.json')))
    assert payload['i'] == 0 and payload['n'] == 1 and payload['N'] == 2
    assert np.isfinite(payload['diffusion_score'])


def test_score_n_best_resume_skips_existing(tiny_scored):
    from gradtts_tpu.nbest import score_n_best
    scorer, ds, n_best, out_dir, _n = tiny_scored
    assert score_n_best(scorer, ds, n_best, N=2, out_dir=out_dir,
                        seed=1) == 0


def test_scores_differ_across_hypotheses_and_compile(tiny_scored):
    _scorer, _ds, _n_best, out_dir, _n = tiny_scored
    mat = compile_scores(out_dir, I=2, N=2)
    assert mat.shape == (2, 2)
    assert np.all(np.isfinite(mat)) and np.any(mat != 0)
    # different hypothesis text for the same audio -> different mu -> score
    assert mat[0, 0] != mat[0, 1]


def test_unconverged_adaptive_scoring_raises(tiny_scored):
    """The adaptive integrator (n_euler=0) must not silently write
    unconverged likelihoods (reference scipy raises, likelihood.py:117)."""
    from unittest import mock
    import gradtts_tpu.nbest.scoring as scoring_mod
    from gradtts_tpu.nbest import NBestScorer
    import jax
    scorer, ds, _n_best, _out, _n = tiny_scored
    orig = scoring_mod.get_likelihood_fn
    strict = NBestScorer(scorer.model, scorer.params, n_euler=0,
                         batch_size=4, x_buckets=(16,), y_buckets=(16,))
    with mock.patch.object(
            scoring_mod, 'get_likelihood_fn',
            lambda sde, fn, **kw: orig(sde, fn, **{**kw, 'rtol': 1e-10,
                                                   'atol': 1e-10,
                                                   'max_steps': 14})):
        items = [{'x': ds.get_text('ab cd'), 'y': ds[0]['y']}]
        with pytest.raises(RuntimeError, match='did not converge'):
            strict.score_items(items, jax.random.PRNGKey(0))


def test_score_n_best_sharding(tiny_scored, tmp_path):
    from gradtts_tpu.nbest import score_n_best
    scorer, ds, n_best, _out, _n = tiny_scored
    d0, d1 = str(tmp_path / 's0'), str(tmp_path / 's1')
    assert score_n_best(scorer, ds, n_best, N=2, out_dir=d0,
                        shard=(0, 2)) == 2
    assert score_n_best(scorer, ds, n_best, N=2, out_dir=d1,
                        shard=(1, 2)) == 2
    m0 = compile_scores(d0, 2, 2)
    m1 = compile_scores(d1, 2, 2)
    assert np.all(m0[1] == 0) and np.all(m1[0] == 0)
    # shards merge into the full matrix
    full = m0 + m1
    assert np.all(full != 0)


# --- interop with the reference's REAL score-dump artifacts ----------------

REF_SCORES = '/root/reference/n_best/diffusion_scores'


def test_reference_score_dump_interop():
    """Our compile/rescore pipeline speaks the reference's on-disk score
    format: [I, N] float64 .npy, row-major, scores[i, n] = hypothesis n of
    utterance i (parity: /root/reference/n_best/compile_scores.py:8-43).
    Verified against the REAL dumps the reference ships (read-only)."""
    import os
    if not os.path.isdir(REF_SCORES):
        pytest.skip('reference score dumps unavailable')
    ref100 = np.load(os.path.join(REF_SCORES, 'e330_euler10_n100.npy'))
    assert ref100.shape == (507, 100) and ref100.dtype == np.float64

    # the reference's own CSV twin is the row-major flattening of the npy —
    # pins down the (i, n) orientation with the reference's real artifacts
    import csv
    ref10 = np.load(os.path.join(REF_SCORES, 'e330_euler10_n10.npy'))
    with open(os.path.join(REF_SCORES, 'e330_euler10_n10.csv')) as f:
        flat = np.array([float(v) for row in csv.reader(f) for v in row])
    np.testing.assert_allclose(flat, ref10.reshape(-1))

    # our compile_scores produces the same shape/dtype/orientation from
    # per-(i, n) shards
    import json
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        for i in range(3):
            for n in range(4):
                with open(os.path.join(d, f's_{i}_{n}.json'), 'w') as f:
                    json.dump({'i': i, 'n': n,
                               'diffusion_score': float(ref100[i, n])}, f)
        out_path = os.path.join(d, 'compiled.npy')
        compile_scores(d, I=3, N=4, out_path=out_path)
        ours = np.load(out_path)
    assert ours.shape == (3, 4) and ours.dtype == ref100.dtype
    np.testing.assert_allclose(ours, ref100[:3, :4])

    # and `rescore` consumes the real dump: a synthetic 507-utterance
    # n-best list takes the reference matrix via set_diffusion_scores and
    # exposes exactly those values in the rescoring feature matrix
    from gradtts_tpu.nbest import SCORE_NAMES, NBestList
    from gradtts_tpu.nbest.lists import make_synthetic_n_best
    n = 10
    entries = [{'target': f'target {i}',
                'hyps': [f'utt {i} hyp {j}' for j in range(n)]}
               for i in range(ref100.shape[0])]
    n_best = NBestList(make_synthetic_n_best(entries))
    n_best.set_diffusion_scores(ref100[:, :n], n)
    feats = n_best.feature_matrix(n)
    col = list(SCORE_NAMES).index('diffusion_score')
    np.testing.assert_allclose(feats[:, :, col], ref100[:, :n])
