"""Batched RIR-bank rendering vs the serial per-pair oracle loop.

The batched path (sim/bank_render.py) is the TPU-native replacement for the
reference's render_rir_parallel process pool (SonicSim_rir.py:724-791); it
must be numerically equivalent to looping SyntheticRirOracle.render over
(source, receiver) pairs.
"""

import numpy as np
import pytest

from sonicsim_tpu.sim.bank_render import render_bank_batched
from sonicsim_tpu.sim.channels import ChannelModel
from sonicsim_tpu.sim.image_source import ShoeboxRoom
from sonicsim_tpu.sim.oracle import SyntheticRirOracle, render_rir_bank


def _serial_bank(oracle, srcs, recvs, channel, rotations=None):
    rotations = rotations or [90.0] * len(recvs)
    rows = [
        [oracle.render(s, r, channel, rot) for r, rot in zip(recvs, rotations)]
        for s in srcs
    ]
    min_len = min(x.shape[-1] for row in rows for x in row)
    bank = np.stack(
        [np.stack([x[..., :min_len] for x in row]) for row in rows]
    ).astype(np.float32)
    peak = np.abs(bank).max()
    return bank / peak if peak > 0 else bank


@pytest.mark.parametrize(
    "channel",
    [
        ChannelModel("Mono"),
        ChannelModel("Binaural"),
        ChannelModel("Ambisonics", channel_order=1),
    ],
    ids=["mono", "binaural", "ambisonics"],
)
def test_batched_matches_serial(channel, rng):
    room = ShoeboxRoom((7.0, 3.0, 5.0), absorption=0.35)
    oracle = SyntheticRirOracle(room, n_bands=8, max_order=2, seed=3)
    srcs = [rng.uniform([1, 1, 1], [6, 2.5, 4]) for _ in range(3)]
    recvs = [np.array([3.5, 1.5, 2.5]), np.array([5.0, 1.2, 3.0])]

    expected = _serial_bank(oracle, srcs, recvs, channel)
    got = render_bank_batched(oracle, srcs, recvs, channel)
    assert got.shape == expected.shape == (3, 2, channel.count, expected.shape[-1])
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, atol=5e-5 * scale, rtol=1e-3)


def test_render_rir_bank_dispatches_to_batched(rng):
    """The public bank entry point uses the batched path for multiband
    synthetic oracles and stays equivalent to the serial loop."""
    room = ShoeboxRoom((6.0, 3.0, 5.0), absorption=0.3)
    oracle = SyntheticRirOracle(room, n_bands=8, max_order=2, seed=5)
    srcs = [np.array([1.5, 1.4, 1.5]), np.array([4.0, 1.4, 3.0])]
    recvs = [np.array([3.0, 1.5, 2.5])]
    channel = ChannelModel("Mono")

    got = render_rir_bank(oracle, srcs, recvs, channel)
    expected = _serial_bank(oracle, srcs, recvs, channel)
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, atol=5e-5 * scale, rtol=1e-3)


def test_device_geometry_matches_numpy_lattice(rng):
    """The on-device image lattice (sorted) reproduces the NumPy
    image_sources enumeration: same positions multiset, same hit counts,
    same distances."""
    import jax.numpy as jnp

    from sonicsim_tpu.sim.bank_render import _device_geometry
    from sonicsim_tpu.sim.image_source import SPEED_OF_SOUND, image_sources

    room = ShoeboxRoom((6.0, 3.0, 5.0), absorption=0.3)
    src = np.array([1.5, 1.4, 1.5])
    recv = np.array([3.0, 1.5, 2.5])
    imgs, hits = image_sources(room, src, 2)
    dist = np.linalg.norm(imgs - recv[None], axis=1)
    expected = np.sort(dist / SPEED_OF_SOUND)

    delays, hits_d, dirs, valid = _device_geometry(
        jnp.asarray(np.asarray(room.dims, np.float32)),
        jnp.asarray(src, jnp.float32)[None],
        jnp.asarray(recv, jnp.float32)[None],
        2,
        10.0,
    )
    got = np.sort(np.asarray(delays[0]))
    assert delays.shape[1] == len(imgs)
    assert np.asarray(valid).all()
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)
    # hit-count histogram matches the NumPy lattice
    np.testing.assert_array_equal(
        np.bincount(np.asarray(hits_d[0])), np.bincount(hits.astype(int))
    )
    # dirs are unit receiver→source vectors (returned as separable
    # (ux, uy, uz) components, each (P, N))
    ux, uy, uz = (np.asarray(c[0]) for c in dirs)
    np.testing.assert_allclose(
        np.sqrt(ux**2 + uy**2 + uz**2), 1.0, atol=1e-5
    )


def test_bank_out_device_and_multi_bank(rng):
    """out_device returns a device-resident bank equal to the NumPy one;
    render_rir_banks fuses several banks into one dispatch with per-bank
    normalization."""
    from sonicsim_tpu.sim.bank_render import render_rir_banks

    room = ShoeboxRoom((6.0, 3.0, 5.0), absorption=0.3)
    oracle = SyntheticRirOracle(room, n_bands=8, max_order=2, seed=5)
    srcs_a = [np.array([1.5, 1.4, 1.5]), np.array([2.5, 1.2, 3.0])]
    srcs_b = [np.array([4.0, 1.6, 2.0])]
    recvs = [np.array([3.0, 1.5, 2.5])]
    channel = ChannelModel("Binaural")

    host = render_bank_batched(oracle, srcs_a, recvs, channel)
    dev = render_bank_batched(oracle, srcs_a, recvs, channel, out_device=True)
    assert not isinstance(dev, np.ndarray)
    np.testing.assert_allclose(np.asarray(dev), host, atol=1e-6)

    banks = render_rir_banks(oracle, [srcs_a, srcs_b], recvs, channel)
    expected_b = render_bank_batched(oracle, srcs_b, recvs, channel)
    np.testing.assert_allclose(banks[0], host, atol=1e-6)
    np.testing.assert_allclose(banks[1], expected_b, atol=1e-6)


def test_batched_rotations_and_custom_array(rng):
    """Receiver rotations reach both offsets and gains in the batched path."""
    room = ShoeboxRoom((7.0, 3.0, 5.0), absorption=0.4)
    oracle = SyntheticRirOracle(room, n_bands=8, max_order=2, seed=11)
    channel = ChannelModel(
        "CustomArrayIR", mic_array=[[0, 0, -0.05], [0.05, 0, 0], [0, 0, 0.05]]
    )
    srcs = [np.array([2.0, 1.3, 2.0])]
    recvs = [np.array([5.0, 1.5, 3.0])]
    rotations = [37.0]

    expected = _serial_bank(oracle, srcs, recvs, channel, rotations)
    got = render_bank_batched(oracle, srcs, recvs, channel, rotations)
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, atol=5e-5 * scale, rtol=1e-3)
    # Rotation must change the result (offsets rotate with the receiver).
    other = render_bank_batched(oracle, srcs, recvs, channel, [90.0])
    assert np.abs(other - got).max() > 1e-4 * scale


def test_mesh_sharded_matches_single_device(rng):
    """The shard_map bank path (multi-chip fan-out) is numerically
    identical to the single-device fused dispatch, per-bank peak
    normalization (pmax across shards) included."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from sonicsim_tpu.parallel import make_mesh
    from sonicsim_tpu.sim.bank_render import render_rir_banks

    room = ShoeboxRoom((6.0, 3.0, 5.0), absorption=0.3)
    oracle = SyntheticRirOracle(room, n_bands=8, max_order=2, seed=5)
    srcs_a = [rng.uniform([1, 1, 1], [5, 2.5, 4]) for _ in range(3)]
    srcs_b = [rng.uniform([1, 1, 1], [5, 2.5, 4]) for _ in range(2)]
    recvs = [np.array([3.0, 1.5, 2.5])]
    channel = ChannelModel("Binaural")

    single = render_rir_banks(oracle, [srcs_a, srcs_b], recvs, channel)
    mesh = make_mesh(8)
    sharded = render_rir_banks(
        oracle, [srcs_a, srcs_b], recvs, channel, mesh=mesh,
        out_device=True,
    )
    assert len(sharded) == 2
    # Lives distributed on the mesh (pre-slice parent is sharded).
    for got, want in zip(sharded, single):
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_varying_item_counts_share_one_executable(rng):
    """Mixture geometries whose item counts land in the same _CHUNK
    bucket must reuse ONE compiled renderer: the exact item count used
    to be a static jit arg, retracing per mixture (profiled ~1 s of
    host time per 60 s mixture in generation)."""
    from sonicsim_tpu.sim.bank_render import (
        _render_items_device,
        render_rir_banks,
    )

    room = ShoeboxRoom((6.0, 3.0, 5.0), absorption=0.3)
    oracle = SyntheticRirOracle(room, n_bands=8, max_order=2, seed=5)
    recvs = [np.array([3.0, 1.5, 2.5])]
    channel = ChannelModel("Binaural")
    _render_items_device._clear_cache()
    for counts in ((5, 4), (4, 6), (6, 6)):  # items 2*(5+4)=18..24, bucket 64
        lists = [
            [rng.uniform([1, 1, 1], [5, 2.5, 4]) for _ in range(c)]
            for c in counts
        ]
        render_rir_banks(oracle, lists, recvs, channel, out_device=True)
    assert _render_items_device._cache_size() == 1


def test_amplitude_profile_factorization():
    """amp ≈ U @ V with tiny rank: EXACTLY rank 1 for a uniform room (the
    factor column folds into the per-item gains — no padding waste);
    ≤ n_bands for banded per-wall materials; reconstruction error ≤ 1e-6
    relative either way (the placement contraction, the accumulator, and
    the early rfft all scale with r)."""
    from sonicsim_tpu.sim.bank_render import (
        _amplitude_profile_np,
        _factor_amplitude_profile,
    )

    # uniform: every band shares one beta -> identical columns -> rank 1
    beta_u = np.full((32, 6), np.sqrt(1.0 - 0.3))
    u, v = _factor_amplitude_profile(beta_u, max_order=4)
    assert u.shape[1] == v.shape[0] == 1  # exact rank, own bucket
    a = _amplitude_profile_np(beta_u, 4)
    np.testing.assert_allclose(
        np.asarray(u) @ np.asarray(v), a, rtol=2e-6, atol=2e-6 * a.max()
    )

    # six distinct banded material curves (absorption rising with freq)
    f = np.linspace(0, 1, 32)
    absorp = np.clip(
        np.stack(
            [0.05 + 0.5 * f ** (0.5 + w * 0.3) + 0.05 * np.sin(3 * f + w)
             for w in range(6)], axis=1,
        ),
        0.01, 0.95,
    )
    beta_b = np.sqrt(1.0 - absorp)
    u2, v2 = _factor_amplitude_profile(beta_b, max_order=4)
    r = u2.shape[1]
    assert r % 8 == 0 and r <= 32
    a2 = _amplitude_profile_np(beta_b, 4)
    err = np.abs(np.asarray(u2) @ np.asarray(v2) - a2).max() / a2.max()
    assert err < 1e-6, err


def test_tail_envelope_factorization():
    """D[b,t] = exp(-k_b t) ≈ U @ V: rank 1 EXACT for a uniform room
    (every band one RT60) and low-rank for banded decays — the tail then
    runs Q FFTs per item instead of n_bands (bank_render._assemble_core)."""
    from sonicsim_tpu.sim.bank_render import _factor_tail_envelopes

    sr, ir_len = 16000, 6355
    # uniform: one decay rate
    u, v = _factor_tail_envelopes(np.full(32, 0.36, np.float32), ir_len, sr)
    assert u.shape == (32, 1) and v.shape == (1, ir_len)
    t = np.arange(ir_len) / sr
    d = np.exp(-6.908 * t / 0.36)
    np.testing.assert_allclose((u @ v)[0], d, rtol=1e-5, atol=1e-7)

    # banded: RT60 spanning 3x across bands stays numerically low-rank
    rt60 = np.geomspace(0.15, 0.5, 32).astype(np.float32)
    u2, v2 = _factor_tail_envelopes(rt60, ir_len, sr)
    q = u2.shape[1]
    assert 1 < q <= 16, q
    d2 = np.exp(-6.908 / rt60[:, None] * t[None, :])
    err = np.abs(u2 @ v2 - d2).max()
    assert err < 1e-6, err
