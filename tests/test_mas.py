import itertools

import numpy as np
import pytest

from gradtts_tpu.ops.mas import maximum_path, maximum_path_numpy, MAX_NEG


def _random_problem(rng, b, tx_max, ty_max):
    value = rng.standard_normal((b, tx_max, ty_max)).astype(np.float32)
    t_xs = rng.integers(1, tx_max + 1, size=b)
    t_ys = np.maximum(rng.integers(1, ty_max + 1, size=b), t_xs)
    mask = np.zeros((b, tx_max, ty_max), np.float32)
    for i in range(b):
        mask[i, :t_xs[i], :t_ys[i]] = 1
    return value, mask


def _brute_force(value, t_x, t_y):
    """Enumerate all monotone complete paths, return the best one."""
    best, best_path = -np.inf, None
    # a path is defined by which frames advance the text index; text index
    # starts at 0, ends at t_x-1, advances exactly t_x-1 times over t_y frames
    for adv in itertools.combinations(range(1, t_y), t_x - 1):
        idx, score, path = 0, 0.0, np.zeros((value.shape[0], value.shape[1]))
        adv = set(adv)
        for y in range(t_y):
            if y in adv:
                idx += 1
            path[idx, y] = 1
            score += value[idx, y]
        if score > best:
            best, best_path = score, path
    return best, best_path


def test_matches_numpy_oracle_random():
    rng = np.random.default_rng(0)
    value, mask = _random_problem(rng, 8, 20, 32)
    got = np.array(maximum_path(value, mask))
    want = maximum_path_numpy(value, mask)
    np.testing.assert_array_equal(got, want)


def test_matches_numpy_oracle_full_lengths():
    rng = np.random.default_rng(1)
    value = rng.standard_normal((4, 16, 16)).astype(np.float32)
    mask = np.ones_like(value)
    np.testing.assert_array_equal(np.array(maximum_path(value, mask)),
                                  maximum_path_numpy(value, mask))


def test_optimal_vs_brute_force():
    rng = np.random.default_rng(2)
    for _ in range(10):
        t_x, t_y = int(rng.integers(1, 5)), int(rng.integers(5, 9))
        value = rng.standard_normal((t_x, t_y)).astype(np.float32)
        mask = np.ones((1, t_x, t_y), np.float32)
        path = np.array(maximum_path(value[None], mask))[0]
        best_score, _ = _brute_force(value, t_x, t_y)
        got_score = float((path * value).sum())
        assert got_score == pytest.approx(best_score, rel=1e-5)


def test_path_properties():
    rng = np.random.default_rng(3)
    value, mask = _random_problem(rng, 6, 12, 24)
    path = np.array(maximum_path(value, mask))
    t_xs = mask[:, :, 0].sum(1).astype(int)
    t_ys = mask[:, 0, :].sum(1).astype(int)
    for i in range(len(path)):
        p = path[i, :t_xs[i], :t_ys[i]]
        # each frame maps to exactly one token
        np.testing.assert_array_equal(p.sum(0), np.ones(t_ys[i]))
        # each token covers at least one frame (complete)
        assert (p.sum(1) >= 1).all()
        # monotone: row index non-decreasing
        idx = p.argmax(0)
        assert (np.diff(idx) >= 0).all()
        assert idx[0] == 0 and idx[-1] == t_xs[i] - 1
        # nothing outside the mask
        assert path[i, t_xs[i]:, :].sum() == 0
        assert path[i, :, t_ys[i]:].sum() == 0


def test_native_cpp_matches():
    pytest.importorskip('ctypes')
    from gradtts_tpu.ops.native import maximum_path_native
    rng = np.random.default_rng(4)
    value, mask = _random_problem(rng, 8, 24, 40)
    want = maximum_path_numpy(value, mask)
    got = maximum_path_native(value, mask)
    np.testing.assert_array_equal(got, want)
    jax_got = np.array(maximum_path(value, mask))
    np.testing.assert_array_equal(jax_got, want)
