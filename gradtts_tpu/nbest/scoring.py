"""Diffusion-likelihood scoring of n-best hypotheses.

Behavioral parity targets: /root/reference/n_best/n_best_list_experiment.py
(:66-171 batch driver) and get_score_parallel.py (:68-157 one-(i,n)-per-job
scorer + SLURM array submit_score.sh).

TPU-first redesign:
- The reference scores ONE hypothesis per step (BATCH_SIZE=1,
  n_best_list_experiment.py:146) and round-trips the ODE state through
  scipy/numpy on every drift evaluation. Here a whole batch of
  (hypothesis text, real mel) pairs is scored by ONE jitted program —
  encoder + MAS + SpeechSDE probability-flow likelihood — that never
  leaves the device.
- Shapes are bucketed so only a handful of programs compile.
- Jobs are idempotent and resumable by (i, n) key: each scored pair is a
  JSON line keyed ``{i, n, N, name, diffusion_score}``; rerunning skips
  existing keys (the reference's crash story is "rerun the SLURM task by
  hand", SURVEY.md §5).
- Sharding for fleet runs is by utterance: ``shard=(k, K)`` scores
  utterances i with i % K == k (replaces submit_score.sh's job array).
"""

import functools
import json
import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from gradtts_tpu.config import fix_len_compatibility
from gradtts_tpu.data.dataset import BatchCollate, bucket_length
from gradtts_tpu.likelihood.ode import get_likelihood_fn
from gradtts_tpu.likelihood.sde import SpeechSDE
from gradtts_tpu.models import GradTTS, get_score_fn
from gradtts_tpu.nbest.lists import NBestList


def score_batch(model: GradTTS, params, key, x, x_lengths, y, y_lengths,
                spk=None, n_euler: int = 10, rtol=1e-3, atol=1e-3):
    """Log-likelihood score of real mels ``y`` under the text-conditional
    score model, one jit-able program (parity: rescore(),
    n_best_list_experiment.py:71-89). Returns the full
    :class:`LikelihoodResult`; ``.score`` is the [B] scores
    (-(prior_logp + delta_logp), the reference's 'bpd' scalar) and
    ``.converged`` must be checked by adaptive-integrator (n_euler=0)
    consumers before trusting them."""
    score_fn, mu_y, _spk_vec, y_mask = get_score_fn(
        model, params, x, x_lengths, y, y_lengths, spk)
    sde = SpeechSDE(beta_min=model.beta_min, beta_max=model.beta_max,
                    N=int(model.pe_scale), mu=mu_y, mask=y_mask)
    likelihood_fn = get_likelihood_fn(sde, score_fn, rtol=rtol, atol=atol,
                                      euler=n_euler)
    return likelihood_fn(key, y)


class NBestScorer:
    """Bucket-batched jitted scorer with per-bucket program cache."""

    def __init__(self, model: GradTTS, params, n_euler: int = 10,
                 x_buckets: Sequence[int] = (64, 128, 192, 256, 384, 512),
                 y_buckets: Sequence[int] = (128, 256, 384, 512, 768, 1024,
                                             1536, 2048),
                 batch_size: int = 8, rtol=1e-3, atol=1e-3):
        self.model = model
        self.params = params
        self.n_euler = n_euler
        self.batch_size = batch_size
        self.collate = BatchCollate(x_buckets=x_buckets, y_buckets=y_buckets)
        self.rtol, self.atol = rtol, atol

    @functools.lru_cache(maxsize=None)
    def _jitted(self, has_spk: bool):
        def fn(params, key, x, x_lengths, y, y_lengths, spk):
            res = score_batch(self.model, params, key, x, x_lengths, y,
                              y_lengths, spk, n_euler=self.n_euler,
                              rtol=self.rtol, atol=self.atol)
            return res.score, res.converged

        def fn_nospk(params, key, x, x_lengths, y, y_lengths):
            res = score_batch(self.model, params, key, x, x_lengths, y,
                              y_lengths, None, n_euler=self.n_euler,
                              rtol=self.rtol, atol=self.atol)
            return res.score, res.converged

        return jax.jit(fn) if has_spk else jax.jit(fn_nospk)

    def score_items(self, items: List[dict], key) -> np.ndarray:
        """items: list of {'x': ids, 'y': mel [T,F] (, 'spk')} -> [B] scores.

        Raises RuntimeError if the adaptive integrator (n_euler=0) did not
        converge within its step budget — unconverged likelihoods must not
        be silently written as scores (the reference's scipy solver raises
        on failure, n_best/likelihood/likelihood.py:117)."""
        batch = self.collate(items)
        args = (self.params, key, jnp.asarray(batch['x']),
                jnp.asarray(batch['x_lengths']), jnp.asarray(batch['y']),
                jnp.asarray(batch['y_lengths']))
        if 'spk' in batch:
            out, converged = self._jitted(True)(*args,
                                               jnp.asarray(batch['spk']))
        else:
            out, converged = self._jitted(False)(*args)
        if not bool(np.asarray(converged)):
            raise RuntimeError(
                'likelihood ODE integration did not converge within '
                'max_steps; scores would be silently wrong — raise rtol/'
                'atol, use a fixed n_euler, or raise max_steps')
        return np.asarray(out)


def _result_path(out_dir: str, i: int, n: int) -> str:
    return os.path.join(out_dir, f'{i}_{n}.json')


def _iter_pairs(n_utts: int, N: int, shard: Optional[Tuple[int, int]]
                ) -> Iterable[Tuple[int, int]]:
    for i in range(n_utts):
        if shard is not None and i % shard[1] != shard[0]:
            continue
        for n in range(N):
            yield i, n


def score_n_best(scorer: NBestScorer, dataset, n_best: NBestList, N: int,
                 out_dir: str, name: str = 'scores', seed: int = 1,
                 shard: Optional[Tuple[int, int]] = None,
                 resume: bool = True, progress: bool = False) -> int:
    """Score every (utterance i, hypothesis n) pair and persist one JSON
    line per pair under ``out_dir``. Returns the number of pairs scored in
    this call (skipped pairs not counted).

    ``dataset`` must expose ``get_text(str)`` and ``__getitem__ -> {'y',
    ('spk')}`` like TextMelDataset; the real mel comes from the dataset,
    the text from the hypothesis (parity: NBestDataset,
    n_best_list_experiment.py:91-116).
    """
    os.makedirs(out_dir, exist_ok=True)
    pairs = [(i, n) for i, n in _iter_pairs(len(n_best), N, shard)
             if not (resume and os.path.exists(_result_path(out_dir, i, n)))]

    # group by bucket shape so each batch hits one compiled program
    mel_cache: Dict[int, dict] = {}

    def item_for(i, n):
        if i not in mel_cache:
            mel_cache[i] = dataset[i]
            if len(mel_cache) > 4 * scorer.batch_size:  # bound host memory
                mel_cache.pop(next(iter(mel_cache)))
        base = mel_cache[i]
        item = {'x': dataset.get_text(n_best.hypothesis(i, n)),
                'y': base['y']}
        if 'spk' in base:
            item['spk'] = base['spk']
        return item

    def bucket_key(item):
        xb = bucket_length(item['x'].shape[-1], scorer.collate.x_buckets)
        yb = bucket_length(fix_len_compatibility(item['y'].shape[0]),
                           scorer.collate.y_buckets)
        return xb, yb

    loaded = [(i, n, item_for(i, n)) for i, n in pairs]
    loaded.sort(key=lambda t: bucket_key(t[2]))

    key = jax.random.PRNGKey(seed)
    n_scored = 0
    it = range(0, len(loaded), scorer.batch_size)
    if progress:
        from tqdm import tqdm
        it = tqdm(list(it), desc='score_n_best')
    for start in it:
        chunk = loaded[start:start + scorer.batch_size]
        key, sub = jax.random.split(key)
        scores = scorer.score_items([c[2] for c in chunk], sub)
        for (i, n, _), s in zip(chunk, scores):
            payload = {'i': i, 'n': n, 'N': N, 'name': name,
                       'diffusion_score': float(s)}
            tmp = _result_path(out_dir, i, n) + '.tmp'
            with open(tmp, 'w') as f:
                json.dump(payload, f)
            os.replace(tmp, _result_path(out_dir, i, n))  # atomic
            n_scored += 1
    return n_scored


def compile_scores(directory: str, I: int, N: int,
                   out_path: Optional[str] = None) -> np.ndarray:
    """Walk a score directory -> [I, N] matrix (parity:
    /root/reference/n_best/compile_scores.py:8-43, which reads hydra YAML
    shards; we read the JSON shards score_n_best writes, plus any .yaml
    shards with the same keys). Missing pairs stay 0 like the reference."""
    scores = np.zeros((I, N))
    for root, _dirs, files in os.walk(directory):
        if '.hydra' in root:
            continue
        for filename in files:
            path = os.path.join(root, filename)
            if filename.endswith('.json'):
                with open(path) as f:
                    data = json.load(f)
            elif filename.endswith(('.yaml', '.yml')):
                import yaml
                with open(path) as f:
                    data = yaml.safe_load(f)
            else:
                continue
            if not isinstance(data, dict) or 'diffusion_score' not in data:
                continue
            scores[data['i'], data['n']] = data['diffusion_score']
    if out_path:
        os.makedirs(os.path.dirname(out_path) or '.', exist_ok=True)
        np.save(out_path, scores)
    return scores
