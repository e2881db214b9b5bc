"""End-to-end synthesis and training-loss behavior of the flax GradTTS."""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip('torch')

from test_model_parity import build_pair, HP, B, TX  # noqa: E402

from gradtts_tpu.config import fix_len_compatibility  # noqa: E402
from gradtts_tpu.models import (  # noqa: E402
    GradTTS, synthesize, compute_loss,
)


@pytest.fixture(scope='module')
def pair1():
    return build_pair(n_spks=1)


def test_synthesis_duration_pipeline_matches_reference(pair1):
    """mu_y (pre-noise encoder outputs) and predicted lengths must match the
    reference forward exactly — this covers exp/ceil/length_scale ordering,
    masking, and generate_path."""
    tmodel, jmodel, params, (x, x_lengths, *_rest) = pair1
    with torch.no_grad():
        t_enc, t_dec, t_attn = tmodel(
            torch.tensor(x), torch.tensor(x_lengths), n_timesteps=1)
    y_max = t_enc.shape[-1]
    y_budget = fix_len_compatibility(y_max)

    res = synthesize(jmodel, params, jnp.array(x), jnp.array(x_lengths),
                     n_timesteps=1, y_max_length=y_budget,
                     key=jax.random.PRNGKey(0))
    j_enc = np.array(res.encoder_outputs).transpose(0, 2, 1)[:, :, :y_max]
    np.testing.assert_allclose(j_enc, t_enc.numpy(), atol=2e-5, rtol=1e-4)
    j_attn = np.array(res.attn)[:, :, :y_max]
    np.testing.assert_array_equal(j_attn, t_attn.numpy()[:, 0])


def test_synthesis_jit_and_masking(pair1):
    _, jmodel, params, (x, x_lengths, *_rest) = pair1

    fn = jax.jit(lambda p, xx, xl, k: synthesize(
        jmodel, p, xx, xl, n_timesteps=4, y_max_length=128, key=k),
        donate_argnums=())
    res = fn(params, jnp.array(x), jnp.array(x_lengths), jax.random.PRNGKey(1))
    dec = np.array(res.decoder_outputs)
    yl = np.array(res.y_lengths)
    assert dec.shape == (B, 128, HP['n_feats'])
    assert np.isfinite(dec).all()
    # masked region must be exactly zero
    for b in range(B):
        assert np.abs(dec[b, yl[b]:]).max() == 0
        assert np.abs(dec[b, :yl[b]]).max() > 0


def test_compute_loss_finite_and_jits(pair1):
    _, jmodel, params, (x, x_lengths, y, y_lengths, _spk) = pair1

    fn = jax.jit(lambda p, k, dk: compute_loss(
        jmodel, p, k, jnp.array(x), jnp.array(x_lengths), jnp.array(y),
        jnp.array(y_lengths), out_size=16, dropout_key=dk))
    res = fn(params, jax.random.PRNGKey(0), jax.random.PRNGKey(1))
    for name in ('dur_loss', 'prior_loss', 'diff_loss'):
        v = float(getattr(res, name))
        assert np.isfinite(v), name
    assert res.attn.shape == (B, TX, 16)


def test_compute_loss_grads_flow(pair1):
    """Gradients must flow to encoder + estimator params, and the duration
    predictor must receive gradients ONLY through the duration loss
    (stop-gradient parity with torch .detach(), text_encoder.py:332)."""
    _, jmodel, params, (x, x_lengths, y, y_lengths, _spk) = pair1

    def total(p):
        r = compute_loss(jmodel, p, jax.random.PRNGKey(0), jnp.array(x),
                         jnp.array(x_lengths), jnp.array(y),
                         jnp.array(y_lengths), out_size=None)
        return r.dur_loss + r.prior_loss + r.diff_loss

    g = jax.grad(total)(params)['params']
    gnorm = lambda t: float(
        jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)), t, 0.0))
    assert gnorm(g['encoder']['emb']) > 0
    assert gnorm(g['estimator']) > 0
    assert gnorm(g['encoder']['proj_w']) > 0

    def no_dur(p):
        r = compute_loss(jmodel, p, jax.random.PRNGKey(0), jnp.array(x),
                         jnp.array(x_lengths), jnp.array(y),
                         jnp.array(y_lengths), out_size=None)
        return r.prior_loss + r.diff_loss

    g2 = jax.grad(no_dur)(params)['params']
    assert gnorm(g2['encoder']['proj_w']) == 0  # only dur_loss reaches it
    assert gnorm(g2['encoder']['emb']) > 0


def test_synthesize_fused_attention_matches_jnp(pair1):
    """Full synthesize() with the Pallas fused-attention kernel (interpret
    mode on CPU) agrees with the jnp attention path."""
    _, jmodel, params, (x, x_lengths, *_rest) = pair1

    def run(fused):
        res = synthesize(jmodel, params, jnp.array(x), jnp.array(x_lengths),
                         n_timesteps=3, y_max_length=96,
                         key=jax.random.PRNGKey(2), fused_attention=fused)
        return np.array(res.decoder_outputs)

    np.testing.assert_allclose(run(True), run(False), rtol=1e-4, atol=1e-4)


def test_estimator_fold_freq_matches_unfolded():
    """The frequency-folded top level (freq_fold / ffold_kernel,
    models/diffusion.py) is an exact re-association of the unfolded
    arithmetic: same params, same output, both grads close."""
    from gradtts_tpu.models.diffusion import GradLogPEstimator2d

    for n_feats, dim, n_spks in [(16, 16, 1), (80, 64, 4)]:
        est = GradLogPEstimator2d(dim=dim, n_spks=n_spks, spk_emb_dim=8,
                                  n_feats=n_feats)
        rng = np.random.default_rng(0)
        b, t_len = 2, 32
        xt = jnp.asarray(rng.standard_normal((b, t_len, n_feats)),
                         jnp.float32)
        mu = jnp.asarray(rng.standard_normal((b, t_len, n_feats)),
                         jnp.float32)
        mask = np.ones((b, t_len), np.float32)
        mask[1, -7:] = 0
        mask = jnp.asarray(mask)
        tt = jnp.asarray([0.3, 0.8], jnp.float32)
        spk = (jnp.asarray(rng.standard_normal((b, 8)), jnp.float32)
               if n_spks != 1 else None)
        params = est.init(jax.random.PRNGKey(0), xt, mask, mu, tt, spk)

        def loss(p, fold):
            return jnp.sum(est.apply(p, xt, mask, mu, tt, spk,
                                     fold_freq=fold) ** 2)

        y_fold = est.apply(params, xt, mask, mu, tt, spk, fold_freq=True)
        y_ref = est.apply(params, xt, mask, mu, tt, spk, fold_freq=False)
        np.testing.assert_allclose(np.array(y_fold), np.array(y_ref),
                                   atol=2e-5, rtol=1e-4)
        g_fold = jax.grad(loss)(params, True)
        g_ref = jax.grad(loss)(params, False)
        jax.tree_util.tree_map(
            lambda a, b_: np.testing.assert_allclose(
                np.array(a), np.array(b_), atol=5e-4, rtol=5e-3),
            g_fold, g_ref)
