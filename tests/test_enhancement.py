"""Tests: enhancement models (Fullband/FullSubNet/DCCRN) + cIRM losses."""

import jax
import jax.numpy as jnp
import numpy as np

from sonicsim_tpu.losses import (
    DCCRNLoss,
    FullbandEval,
    FullbandLoss,
    build_cirm,
    cirm_inference,
    compress_cirm,
    decompress_cirm,
)
from sonicsim_tpu.models import DCCRN, FullSubnet, Fullband
from sonicsim_tpu.models.dccrn import conv_istft, conv_stft

SMALL_STFT = dict(n_fft=256, hop_length=128, win_length=256, num_freqs=129)


def test_cirm_compress_roundtrip(rng):
    m = jnp.asarray(rng.uniform(-5, 5, (4, 8)).astype(np.float32))
    back = decompress_cirm(compress_cirm(m))
    np.testing.assert_allclose(np.asarray(back), np.asarray(m), rtol=1e-4, atol=1e-4)


def test_ideal_cirm_reconstructs_clean(rng):
    """Applying the ideal cIRM to the noisy spec must recover clean audio."""
    from sonicsim_tpu.ops import hann_window, stft

    t = 4000
    clean = rng.standard_normal(t).astype(np.float32) * 0.2
    noise = rng.standard_normal(t).astype(np.float32) * 0.1
    noisy = clean + noise
    spec_n = stft(jnp.asarray(noisy[None]), 256, 128, hann_window(256))
    spec_c = stft(jnp.asarray(clean[None]), 256, 128, hann_window(256))
    cirm = build_cirm(spec_n.real, spec_n.imag, spec_c.real, spec_c.imag)
    crm = jnp.transpose(cirm, (0, 3, 1, 2))  # (B, 2, F, T) model layout
    wav = cirm_inference((crm, spec_n.real, spec_n.imag), 256, 128, t)
    # cIRM is tanh-compressed to [-10, 10]; bins where the noisy spec is
    # tiny clip the mask, so reconstruction is near- but not bit-exact.
    np.testing.assert_allclose(np.asarray(wav[0]), clean, atol=1e-2)
    assert float(jnp.mean((wav[0] - clean) ** 2)) < 1e-7


def test_fullband_forward_and_loss(rng):
    model = Fullband(hidden_size=32, **SMALL_STFT)
    params = model.init_params(jax.random.PRNGKey(0), example_len=2000)
    mix = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32))
    clean = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32))
    out = model.apply(params, mix)
    assert out[0].shape[0:2] == (2, 2)
    loss = FullbandLoss(256, 128, 256)(out, clean)
    assert np.isfinite(float(loss))
    eval_loss = FullbandEval(256, 128, 256)(out, clean)
    assert np.isfinite(float(eval_loss))


def test_fullsubnet_forward_grad(rng):
    model = FullSubnet(
        fb_model_hidden_size=16, sb_model_hidden_size=8, sb_num_neighbors=2,
        **SMALL_STFT,
    )
    params = model.init_params(jax.random.PRNGKey(0), example_len=1500)
    mix = jnp.asarray(rng.standard_normal((2, 1500)).astype(np.float32))
    clean = jnp.asarray(rng.standard_normal((2, 1500)).astype(np.float32))
    loss_fn = FullbandLoss(256, 128, 256)
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(model.apply(p, mix), clean)
    )(params)
    assert np.isfinite(float(loss))
    assert max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)) > 0


def test_conv_stft_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32) * 0.3)
    r, i = conv_stft(x, 400, 100, 512)
    y = conv_istft(r, i, 400, 100, 512, 4000)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_dccrn_forward(rng):
    model = DCCRN(rnn_units=32, kernel_num=(8, 16, 32), rnn_layers=1)
    params = model.init_params(jax.random.PRNGKey(0), example_len=2000)
    mix = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32) * 0.3)
    out = model.apply(params, mix)
    assert out.shape == (2, 2000)
    assert np.abs(np.asarray(out)).max() <= 1.0
    clean = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32) * 0.3)
    loss = DCCRNLoss()(out, clean)
    assert np.isfinite(float(loss))


def test_taylorsenet_forward_and_loss(rng):
    from sonicsim_tpu.losses import TaylorSENetEval, TaylorSENetLoss
    from sonicsim_tpu.models import TaylorSENet

    model = TaylorSENet()
    params = model.init_params(jax.random.PRNGKey(0), example_len=3200)
    mix = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32) * 0.3)
    clean = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32) * 0.3)
    out = model.apply(params, mix)
    assert out.shape[0:2] == (1, 2)  # (B, 2, T, F)
    assert np.isfinite(float(TaylorSENetLoss()(out, clean)))
    assert np.isfinite(float(TaylorSENetEval()(out, clean)))


def test_gagnet_forward_and_loss(rng):
    from sonicsim_tpu.losses import GaGNetEval, GaGNetLoss
    from sonicsim_tpu.models import GaGNet

    model = GaGNet()
    params = model.init_params(jax.random.PRNGKey(0), example_len=3200)
    mix = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32) * 0.3)
    clean = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32) * 0.3)
    outs = model.apply(params, mix)
    assert len(outs) == 3 and outs[-1].shape[0:2] == (1, 2)
    assert np.isfinite(float(GaGNetLoss()(outs, clean)))
    assert np.isfinite(float(GaGNetEval()(outs, clean)))


def test_frcrn_forward_and_loss(rng):
    from sonicsim_tpu.losses import FRCRNEval, FRCRNLoss
    from sonicsim_tpu.models import FRCRN

    model = FRCRN()
    params = model.init_params(jax.random.PRNGKey(0), example_len=3200)
    mix = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32) * 0.3)
    clean = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32) * 0.3)
    out = model.apply(params, mix)
    assert out[1][1].shape == (1, 3200)  # stage-1 waveform
    assert out[1][4].shape == (1, 3200)  # stage-2 waveform
    assert np.isfinite(float(FRCRNLoss()(out, clean)))
    assert np.isfinite(float(FRCRNEval()(out, clean)))


def test_remaining_enhancement_models_forward(rng):
    """Inter_SubNet / FullSubNet+ / FastFullSubNet (cIRM contract) and
    G2Net (stage-list contract) and BSRNN-ESPnet (waveform contract)."""
    import jax as _jax

    from sonicsim_tpu.losses import BSRNNESPNetLoss, FullbandLoss, GaGNetLoss
    from sonicsim_tpu.models import (
        BSRNNESPNet,
        FastFullSubnet,
        FullSubNet_Plus,
        G2Net,
        Inter_SubNet,
    )

    x = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32) * 0.3)
    clean = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32) * 0.3)
    cirm_loss = FullbandLoss(512, 256, 512)

    for model in (
        Inter_SubNet(sb_model_hidden_size=48),
        FullSubNet_Plus(sb_model_hidden_size=32, fb_model_hidden_size=64),
        FastFullSubnet(bottleneck_hidden_size=48),
    ):
        params = model.init_params(_jax.random.PRNGKey(0), example_len=3200)
        out = model.apply(params, x)
        assert out[0].shape[0:2] == (1, 2)
        assert np.isfinite(float(cirm_loss(out, clean)))

    g2 = G2Net()
    params = g2.init_params(_jax.random.PRNGKey(0), example_len=3200)
    outs = g2.apply(params, x)
    assert len(outs) == 3
    assert np.isfinite(float(GaGNetLoss()(outs, clean)))

    bs = BSRNNESPNet(num_channels=16, num_layers=1)
    params = bs.init_params(_jax.random.PRNGKey(0), example_len=3200)
    y = bs.apply(params, x)
    assert y.shape == (1, 3200)
    assert np.isfinite(float(BSRNNESPNetLoss()(y, clean)))
