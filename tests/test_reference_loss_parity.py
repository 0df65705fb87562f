"""Loss parity against the REFERENCE'S OWN loss code.

Loads /root/reference/separation/look2hear/losses/{matrix,pit_wrapper}.py
by file path (they import only torch/scipy — no package machinery needed)
and compares our JAX losses against them directly, replacing the
hand-written torch replica in tests/test_losses.py as the ground truth:

  - PairwiseNegSDR for snr/sisdr/sdsdr × zero_mean × take_log
  - SingleSrc / MultiSrc variants
  - PITLossWrapper end-to-end: best-perm loss value AND reordered
    estimates, on the einsum path (n_src ≤ 3) and the Hungarian path
    (n_src = 4), with and without the −30 dB threshold_byloss gate
    (pit_wrapper.py:52-54).
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

REF_LOSSES = Path("/root/reference/separation/look2hear/losses")

pytestmark = pytest.mark.skipif(
    not REF_LOSSES.exists(), reason="reference checkout not present"
)


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", REF_LOSSES / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    matrix = _load("matrix")
    pit = _load("pit_wrapper")
    return matrix, pit


def test_pairwise_neg_sdr_vs_reference(ref, rng):
    from sonicsim_tpu.losses import pairwise_neg_sdr

    matrix, _ = ref
    ests = rng.standard_normal((4, 3, 800)).astype(np.float32)
    tgts = rng.standard_normal((4, 3, 800)).astype(np.float32)
    for sdr_type in ("snr", "sisdr", "sdsdr"):
        for zero_mean in (True, False):
            for take_log in (True, False):
                theirs = matrix.PairwiseNegSDR(
                    sdr_type, zero_mean=zero_mean, take_log=take_log
                )(torch.from_numpy(ests), torch.from_numpy(tgts)).numpy()
                ours = np.asarray(
                    pairwise_neg_sdr(
                        jnp.asarray(ests), jnp.asarray(tgts), sdr_type,
                        zero_mean=zero_mean, take_log=take_log,
                    )
                )
                np.testing.assert_allclose(
                    ours, theirs, rtol=2e-3, atol=2e-4,
                    err_msg=f"{sdr_type} zm={zero_mean} log={take_log}",
                )


def test_single_and_multi_src_vs_reference(ref, rng):
    from sonicsim_tpu.losses import multisrc_neg_sdr, singlesrc_neg_sdr

    matrix, _ = ref
    ests = rng.standard_normal((5, 2, 600)).astype(np.float32)
    tgts = rng.standard_normal((5, 2, 600)).astype(np.float32)
    for sdr_type in ("snr", "sisdr", "sdsdr"):
        theirs = matrix.SingleSrcNegSDR(sdr_type)(
            torch.from_numpy(ests[:, 0]), torch.from_numpy(tgts[:, 0])
        ).numpy()
        ours = np.asarray(
            singlesrc_neg_sdr(jnp.asarray(ests[:, 0]), jnp.asarray(tgts[:, 0]), sdr_type)
        )
        np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)

        theirs_m = matrix.MultiSrcNegSDR(sdr_type)(
            torch.from_numpy(ests), torch.from_numpy(tgts)
        ).numpy()
        ours_m = np.asarray(
            multisrc_neg_sdr(jnp.asarray(ests), jnp.asarray(tgts), sdr_type)
        )
        np.testing.assert_allclose(ours_m, theirs_m, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("n_src", [2, 3, 4])
def test_pit_wrapper_vs_reference(ref, rng, n_src):
    """Loss value and reordered estimates must match the reference's
    einsum path (n_src ≤ 3) and Hungarian path (n_src > 3)."""
    from sonicsim_tpu.losses import PairwiseNegSDR, PITLossWrapper

    matrix, pit_mod = ref
    tgts = rng.standard_normal((3, n_src, 500)).astype(np.float32)
    perm = rng.permutation(n_src)
    ests = (tgts[:, perm] + 0.05 * rng.standard_normal((3, n_src, 500))).astype(
        np.float32
    )

    theirs_pit = pit_mod.PITLossWrapper(
        matrix.PairwiseNegSDR("sisdr"), threshold_byloss=False
    )
    t_loss, t_reord = theirs_pit(
        torch.from_numpy(ests), torch.from_numpy(tgts), return_ests=True
    )

    ours_pit = PITLossWrapper(PairwiseNegSDR("sisdr"), threshold_byloss=False)
    o_loss, o_reord = ours_pit(
        jnp.asarray(ests), jnp.asarray(tgts), return_ests=True
    )
    np.testing.assert_allclose(float(o_loss), float(t_loss), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(o_reord), t_reord.numpy(), rtol=1e-4, atol=1e-5
    )


def test_pit_threshold_gate_vs_reference(ref, rng):
    """threshold_byloss keeps only pair losses > -30 in the mean
    (pit_wrapper.py:52-54)."""
    from sonicsim_tpu.losses import PairwiseNegSDR, PITLossWrapper

    matrix, pit_mod = ref
    tgts = rng.standard_normal((4, 2, 400)).astype(np.float32)
    # half the batch near-perfect (loss << -30), half noisy
    ests = tgts.copy()
    ests[2:] += 0.5 * rng.standard_normal((2, 2, 400)).astype(np.float32)
    ests[:2] += 1e-5 * rng.standard_normal((2, 2, 400)).astype(np.float32)

    t_loss = pit_mod.PITLossWrapper(
        matrix.PairwiseNegSDR("sisdr"), threshold_byloss=True
    )(torch.from_numpy(ests), torch.from_numpy(tgts))
    o_loss = PITLossWrapper(PairwiseNegSDR("sisdr"), threshold_byloss=True)(
        jnp.asarray(ests), jnp.asarray(tgts)
    )
    np.testing.assert_allclose(float(o_loss), float(t_loss), rtol=2e-3)
