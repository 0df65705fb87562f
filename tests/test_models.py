"""Tests: ConvTasNet shape/jit/grad, registry, serialization round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from sonicsim_tpu.losses import PairwiseNegSDR, PITLossWrapper
from sonicsim_tpu.models import ConvTasNet, from_pretrain, get, save_model

SMALL = dict(N=32, L=16, B=16, H=32, P=3, X=2, R=1, num_spks=2)


def test_registry_case_insensitive():
    assert get("convtasnet") is ConvTasNet
    assert get("ConvTasNet") is ConvTasNet


def test_convtasnet_forward_shapes(rng):
    model = ConvTasNet(**SMALL)
    params = model.init_params(jax.random.PRNGKey(0), example_len=4000)
    x = jnp.asarray(rng.standard_normal((3, 4000)).astype(np.float32))
    y = model.apply(params, x)
    assert y.shape == (3, 2, 4000)
    y1 = model.apply(params, x[0])  # 1-D input path
    assert y1.shape == (1, 2, 4000)


def test_convtasnet_jit_and_grad(rng):
    model = ConvTasNet(**SMALL)
    params = model.init_params(jax.random.PRNGKey(0), example_len=2000)
    x = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((2, 2, 2000)).astype(np.float32))
    pit = PITLossWrapper(PairwiseNegSDR("snr"), threshold_byloss=False)

    @jax.jit
    def loss_fn(p):
        return pit(model.apply(p, x), t)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    norms = jax.tree.map(lambda g: float(jnp.abs(g).max()), grads)
    flat = jax.tree.leaves(norms)
    assert all(np.isfinite(v) for v in flat)
    assert max(flat) > 0  # gradient actually flows


def test_serialize_roundtrip(tmp_path, rng):
    model = ConvTasNet(**SMALL)
    params = model.init_params(jax.random.PRNGKey(1), example_len=1000)
    x = jnp.asarray(rng.standard_normal((1, 1000)).astype(np.float32))
    y0 = model.apply(params, x)
    save_model(model, params, tmp_path / "m.pkl")
    model2, params2 = from_pretrain(tmp_path / "m.pkl")
    assert model2.model_args() == model.model_args()
    y1 = model2.apply(params2, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
