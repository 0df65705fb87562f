"""Golden tests: SDR losses and PIT wrapper vs torch reference math."""

import jax.numpy as jnp
import numpy as np
import torch

from sonicsim_tpu.losses import (
    PairwiseNegSDR,
    PITLossWrapper,
    find_best_perm,
    multisrc_neg_sdr,
    pairwise_neg_sdr,
    reorder_sources,
    singlesrc_neg_sdr,
)


def _torch_pairwise_neg_sdr(ests, targets, sdr_type, eps=1e-8):
    """Independent torch reimplementation of losses/matrix.py:14-49 math."""
    targets = targets - targets.mean(dim=2, keepdim=True)
    ests = ests - ests.mean(dim=2, keepdim=True)
    s_t = targets.unsqueeze(1)
    s_e = ests.unsqueeze(2)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = (s_e * s_t).sum(3, keepdim=True)
        energy = (s_t**2).sum(3, keepdim=True) + eps
        proj = dot * s_t / energy
    else:
        proj = s_t.expand(-1, ests.shape[1], -1, -1)
    e = s_e - s_t if sdr_type in ("sdsdr", "snr") else s_e - proj
    sdr = (proj**2).sum(3) / ((e**2).sum(3) + eps)
    return -10 * torch.log10(sdr + eps)


def test_pairwise_neg_sdr_matches_torch(rng):
    ests = rng.standard_normal((4, 2, 1000)).astype(np.float32)
    tgts = rng.standard_normal((4, 2, 1000)).astype(np.float32)
    for sdr_type in ("sisdr", "snr", "sdsdr"):
        ours = np.asarray(pairwise_neg_sdr(jnp.asarray(ests), jnp.asarray(tgts), sdr_type))
        ref = _torch_pairwise_neg_sdr(
            torch.from_numpy(ests), torch.from_numpy(tgts), sdr_type
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_singlesrc_consistent_with_pairwise(rng):
    ests = rng.standard_normal((3, 2, 500)).astype(np.float32)
    tgts = rng.standard_normal((3, 2, 500)).astype(np.float32)
    pw = np.asarray(pairwise_neg_sdr(jnp.asarray(ests), jnp.asarray(tgts), "sisdr"))
    single = np.asarray(
        singlesrc_neg_sdr(jnp.asarray(ests[:, 0]), jnp.asarray(tgts[:, 1]), "sisdr")
    )
    np.testing.assert_allclose(pw[:, 0, 1], single, rtol=1e-4)
    multi = np.asarray(multisrc_neg_sdr(jnp.asarray(ests), jnp.asarray(tgts), "sisdr"))
    np.testing.assert_allclose(multi, (pw[:, 0, 0] + pw[:, 1, 1]) / 2, rtol=1e-4)


def test_find_best_perm_picks_identity_when_aligned(rng):
    tgts = rng.standard_normal((5, 3, 800)).astype(np.float32)
    ests = tgts + 0.01 * rng.standard_normal((5, 3, 800)).astype(np.float32)
    pw = pairwise_neg_sdr(jnp.asarray(ests), jnp.asarray(tgts), "sisdr")
    _, idx = find_best_perm(pw)
    np.testing.assert_array_equal(np.asarray(idx), np.tile(np.arange(3), (5, 1)))


def test_pit_recovers_permutation(rng):
    tgts = rng.standard_normal((4, 2, 600)).astype(np.float32)
    ests = tgts[:, ::-1, :].copy()  # swapped estimates
    pit = PITLossWrapper(PairwiseNegSDR("sisdr"), threshold_byloss=False)
    loss, reordered = pit(jnp.asarray(ests), jnp.asarray(tgts), return_ests=True)
    assert float(loss) < -50  # perfect alignment → very negative SI-SDR loss
    np.testing.assert_allclose(np.asarray(reordered), tgts, atol=1e-6)


def test_pit_loss_value_matches_manual_min(rng):
    ests = rng.standard_normal((6, 2, 400)).astype(np.float32)
    tgts = rng.standard_normal((6, 2, 400)).astype(np.float32)
    pw = np.asarray(pairwise_neg_sdr(jnp.asarray(ests), jnp.asarray(tgts), "snr"))
    manual = np.minimum(
        (pw[:, 0, 0] + pw[:, 1, 1]) / 2, (pw[:, 0, 1] + pw[:, 1, 0]) / 2
    ).mean()
    pit = PITLossWrapper(PairwiseNegSDR("snr"), threshold_byloss=False)
    ours = float(pit(jnp.asarray(ests), jnp.asarray(tgts)))
    np.testing.assert_allclose(ours, manual, rtol=1e-4)


def test_pit_threshold_byloss(rng):
    # One easy (perfect) item and one hard item: threshold drops the
    # below--30 losses from the mean (pit_wrapper.py:52-54).
    tgts = rng.standard_normal((2, 2, 300)).astype(np.float32)
    ests = tgts.copy()
    ests[1] = rng.standard_normal((2, 300))  # hard item ~0 dB
    pit_thr = PITLossWrapper(PairwiseNegSDR("sisdr"), threshold_byloss=True)
    pit_raw = PITLossWrapper(PairwiseNegSDR("sisdr"), threshold_byloss=False)
    thr = float(pit_thr(jnp.asarray(ests), jnp.asarray(tgts)))
    raw = float(pit_raw(jnp.asarray(ests), jnp.asarray(tgts)))
    assert thr > raw  # the -80ish perfect loss was excluded


def test_hungarian_path_large_nsrc(rng):
    tgts = rng.standard_normal((2, 7, 200)).astype(np.float32)
    perm = rng.permutation(7)
    ests = tgts[:, perm, :]
    pw = pairwise_neg_sdr(jnp.asarray(ests), jnp.asarray(tgts), "sisdr")
    _, idx = find_best_perm(pw)
    # est index assigned to target t must invert the permutation
    expected = np.argsort(perm)
    for b in range(2):
        reordered = np.asarray(reorder_sources(jnp.asarray(ests), idx))
        np.testing.assert_allclose(reordered[b], tgts[b], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx)[b], expected)


def test_mixit_recovers_assignment(rng):
    from sonicsim_tpu.losses import MixITLossWrapper, multisrc_neg_sdr

    # 4 true sources; mixtures are (s0+s1, s2+s3); ests = the true sources.
    srcs = rng.standard_normal((3, 4, 500)).astype(np.float32)
    mixes = np.stack([srcs[:, 0] + srcs[:, 1], srcs[:, 2] + srcs[:, 3]], axis=1)
    mixit = MixITLossWrapper(
        lambda est, mix: multisrc_neg_sdr(est, mix, "snr")
    )
    loss, best = mixit(jnp.asarray(srcs), jnp.asarray(mixes), return_est=True)
    assert float(loss) < -50  # perfect assignment exists
    np.testing.assert_allclose(np.asarray(best), mixes, atol=1e-5)
    # Random ests score far worse.
    bad = jnp.asarray(rng.standard_normal((3, 4, 500)).astype(np.float32))
    assert float(mixit(bad, jnp.asarray(mixes))) > -5


def test_sisnri_loss_matches_torch_reference_math():
    import jax.numpy as jnp
    import numpy as np
    import torch

    from sonicsim_tpu.losses import SISNRi

    rng = np.random.default_rng(7)
    refs = rng.standard_normal((3, 2, 1600)).astype(np.float32)
    ests = refs + 0.3 * rng.standard_normal((3, 2, 1600)).astype(np.float32)
    mix = refs.sum(axis=1)

    got = float(SISNRi()(jnp.asarray(mix), jnp.asarray(ests), jnp.asarray(refs)))

    def tsisnr(m, e, r, eps=1e-8):
        e = e - e.mean(-1, keepdim=True)
        r = r - r.mean(-1, keepdim=True)
        m = m - m.mean(-1, keepdim=True)
        ep = (torch.sum(e * r, -1, keepdim=True) * r) / torch.sum(r * r, -1, keepdim=True)
        ev = e - ep
        mp = (torch.sum(m * r, -1, keepdim=True) * r) / torch.sum(r * r, -1, keepdim=True)
        mv = m - mp
        a = 10 * torch.log10((torch.sum(ep * ep, -1) + eps) / (torch.sum(ev * ev, -1) + eps))
        b = 10 * torch.log10((torch.sum(mp * mp, -1) + eps) / (torch.sum(mv * mv, -1) + eps))
        return a - b

    from itertools import permutations
    tm, te, tr = map(torch.from_numpy, (mix, ests, refs))
    mats = []
    for perm in permutations(range(2)):
        mats.append(torch.stack(
            [tsisnr(tm, te[:, s], tr[:, t]) for s, t in enumerate(perm)]
        ).mean(0))
    ref_val = float(-torch.max(torch.stack(mats), dim=0)[0].mean())
    np.testing.assert_allclose(got, ref_val, atol=1e-4)


def test_pad_mask_and_pad_x_to_y():
    import numpy as np

    from sonicsim_tpu.utils import make_pad_mask, pad_x_to_y

    m = make_pad_mask([2, 4], max_len=5)
    assert m.tolist() == [[False, False, True, True, True],
                          [False, False, False, False, True]]
    x = np.ones((2, 3))
    y = np.zeros((2, 5))
    assert pad_x_to_y(x, y).shape == (2, 5)
    assert pad_x_to_y(y, x).shape == (2, 3)
