"""HiFi-GAN generator parity vs the torch reference (with weight-norm
folding) + discriminator/loss smoke tests."""

import sys

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip('torch')

from gradtts_tpu.models.hifigan import (  # noqa: E402
    Generator, HiFiGANConfig, MultiPeriodDiscriminator,
    MultiScaleDiscriminator, discriminator_loss, feature_loss,
    generator_loss, hifigan_torch_to_flax,
)


def _load_ref_models():
    if '/root/reference/hifi-gan' not in sys.path:
        sys.path.insert(0, '/root/reference/hifi-gan')
    import models as ref_models
    return ref_models


class AttrDict(dict):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.__dict__ = self


SMALL = dict(resblock='1', upsample_rates=[8, 8, 2, 2],
             upsample_kernel_sizes=[16, 16, 4, 4],
             upsample_initial_channel=64,
             resblock_kernel_sizes=[3, 7, 11],
             resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]])


def test_generator_parity():
    ref_models = _load_ref_models()
    torch.manual_seed(0)
    tgen = ref_models.Generator(AttrDict(SMALL)).eval()
    cfg = HiFiGANConfig.from_json(dict(SMALL))
    jgen = Generator(cfg)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 20, 80)).astype(np.float32)
    params = hifigan_torch_to_flax(tgen.state_dict(), cfg)
    with torch.no_grad():
        t_wav = tgen(torch.tensor(mel.transpose(0, 2, 1)))
    j_wav = jgen.apply(params, jnp.array(mel))
    assert j_wav.shape == (2, 20 * 256)
    np.testing.assert_allclose(np.array(j_wav), t_wav.numpy()[:, 0, :],
                               atol=2e-5, rtol=1e-4)


def test_generator_parity_phase_packed():
    """phase_packed upsample convs (dense block conv emitting all output
    phases as packed channels, no zero-inserted rows on the MXU) must
    match the reference transposed convs exactly — covers k=16/s=8 and
    k=4/s=2."""
    ref_models = _load_ref_models()
    torch.manual_seed(0)
    tgen = ref_models.Generator(AttrDict(SMALL)).eval()
    cfg = HiFiGANConfig.from_json(dict(SMALL))
    jgen = Generator(cfg, phase_packed=True)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 20, 80)).astype(np.float32)
    params = hifigan_torch_to_flax(tgen.state_dict(), cfg)
    with torch.no_grad():
        t_wav = tgen(torch.tensor(mel.transpose(0, 2, 1)))
    j_wav = jgen.apply(params, jnp.array(mel))
    np.testing.assert_allclose(np.array(j_wav), t_wav.numpy()[:, 0, :],
                               atol=2e-5, rtol=1e-4)


def test_generator_parity_after_remove_weight_norm():
    """Conversion must equal the reference's inference path
    (remove_weight_norm() then forward, models.py:120-127)."""
    ref_models = _load_ref_models()
    torch.manual_seed(1)
    tgen = ref_models.Generator(AttrDict(SMALL)).eval()
    params = hifigan_torch_to_flax(tgen.state_dict(),
                                   HiFiGANConfig.from_json(dict(SMALL)))
    tgen.remove_weight_norm()
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 12, 80)).astype(np.float32)
    with torch.no_grad():
        t_wav = tgen(torch.tensor(mel.transpose(0, 2, 1)))
    jgen = Generator(HiFiGANConfig.from_json(dict(SMALL)))
    j_wav = jgen.apply(params, jnp.array(mel))
    np.testing.assert_allclose(np.array(j_wav), t_wav.numpy()[:, 0, :],
                               atol=2e-5, rtol=1e-4)


def test_config_from_reference_json():
    cfg = HiFiGANConfig.from_json('/root/reference/checkpts/hifigan-config.json')
    assert cfg.upsample_rates == (8, 8, 2, 2)
    assert cfg.upsample_initial_channel == 512
    assert int(np.prod(cfg.upsample_rates)) == 256


def test_discriminators_and_losses_smoke():
    rng = np.random.default_rng(0)
    y = jnp.array(rng.standard_normal((2, 1024)).astype(np.float32))
    y_hat = jnp.array(rng.standard_normal((2, 1024)).astype(np.float32))

    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    p = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    rs, gs, fr, fg = mpd.apply(p, y, y_hat)
    assert len(rs) == 2 and len(fr[0]) == 6

    msd = MultiScaleDiscriminator(n_scales=2)
    p2 = msd.init(jax.random.PRNGKey(0), y, y_hat)
    rs2, gs2, fr2, fg2 = msd.apply(p2, y, y_hat)
    assert len(rs2) == 2

    dl, rl, gl = discriminator_loss(rs, gs)
    fl = feature_loss(fr, fg)
    genl, _ = generator_loss(gs)
    for v in (dl, fl, genl):
        assert np.isfinite(float(v))


def test_discriminator_p_matches_torch():
    ref_models = _load_ref_models()
    torch.manual_seed(2)
    td = ref_models.DiscriminatorP(3).eval()
    from gradtts_tpu.models.hifigan import DiscriminatorP
    jd = DiscriminatorP(3)
    rng = np.random.default_rng(2)
    y = rng.standard_normal((1, 300)).astype(np.float32)
    # convert: conv2d weight-norm folds, (O,I,Kh,Kw)->(Kh,Kw,I,O)
    from gradtts_tpu.models.hifigan import _fold_weight_norm
    sd = td.state_dict()
    params = {}
    for i in range(5):
        w = _fold_weight_norm(sd, f'convs.{i}')
        params[f'convs_{i}'] = {
            'kernel': w.transpose(2, 3, 1, 0).astype(np.float32),
            'bias': sd[f'convs.{i}.bias'].numpy()}
    w = _fold_weight_norm(sd, 'conv_post')
    params['conv_post'] = {'kernel': w.transpose(2, 3, 1, 0).astype(np.float32),
                           'bias': sd['conv_post.bias'].numpy()}
    with torch.no_grad():
        t_out, t_fmap = td(torch.tensor(y)[:, None, :])
    j_out, j_fmap = jd.apply({'params': params}, jnp.array(y))
    np.testing.assert_allclose(np.array(j_out), t_out.numpy(), atol=2e-5,
                               rtol=1e-4)


def test_generator_bf16_close_to_f32():
    """bf16 compute path: float32 params, bf16 convs — waveform stays
    within bf16 rounding of the f32 path (inaudible for a GAN vocoder)."""
    cfg = HiFiGANConfig.from_json(dict(SMALL))
    jgen32 = Generator(cfg)
    jgen16 = Generator(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 20, 80)), jnp.float32)
    params = jgen32.init(jax.random.PRNGKey(0), mel)
    w32 = np.array(jgen32.apply(params, mel))
    w16 = np.array(jgen16.apply(params, mel))
    assert w16.dtype == np.float32  # tanh output is f32 either way
    assert np.max(np.abs(w16 - w32)) < 0.05
    assert np.mean(np.abs(w16 - w32)) < 5e-3
