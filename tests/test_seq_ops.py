import numpy as np
import jax.numpy as jnp

from gradtts_tpu.ops.seq import (
    sequence_mask, generate_path, duration_loss, fix_len_compatibility,
)


def test_sequence_mask():
    m = np.array(sequence_mask(jnp.array([1, 3, 0]), 4))
    want = np.array([[1, 0, 0, 0], [1, 1, 1, 0], [0, 0, 0, 0]], bool)
    np.testing.assert_array_equal(m, want)


def test_fix_len_compatibility():
    assert fix_len_compatibility(172) == 172
    assert fix_len_compatibility(171) == 172
    assert fix_len_compatibility(1) == 4
    assert fix_len_compatibility(4) == 4
    assert fix_len_compatibility(5, 3) == 8


def test_generate_path():
    dur = jnp.array([[2.0, 1.0, 3.0]])
    mask = jnp.ones((1, 3, 6))
    path = np.array(generate_path(dur, mask))
    want = np.array([[[1, 1, 0, 0, 0, 0],
                      [0, 0, 1, 0, 0, 0],
                      [0, 0, 0, 1, 1, 1]]], np.float32)
    np.testing.assert_array_equal(path, want)


def test_generate_path_matches_torch_reference():
    torch = __import__('pytest').importorskip('torch')
    from ref_oracle import load_reference_model
    ref_generate_path = load_reference_model().utils.generate_path
    rng = np.random.default_rng(0)
    dur = rng.integers(0, 5, size=(4, 7)).astype(np.float32)
    t_y = int(dur.sum(1).max())
    mask = np.ones((4, 7, t_y), np.float32)
    ours = np.array(generate_path(jnp.array(dur), jnp.array(mask)))
    theirs = ref_generate_path(torch.tensor(dur), torch.tensor(mask)).numpy()
    np.testing.assert_allclose(ours, theirs)


def test_duration_loss():
    logw = jnp.array([[1.0, 2.0]])
    logw_hat = jnp.array([[0.0, 0.0]])
    lengths = jnp.array([2])
    assert float(duration_loss(logw, logw_hat, lengths)) == 2.5
