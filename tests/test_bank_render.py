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


def test_batched_python_fallback_matches_native(monkeypatch, rng):
    """Without the native library the pure-NumPy enumeration produces the
    same geometry (same images kept, same delays/hits)."""
    room = ShoeboxRoom((6.0, 3.0, 5.0), absorption=0.3)
    oracle = SyntheticRirOracle(room, n_bands=8, max_order=2, seed=5)
    srcs = [np.array([1.5, 1.4, 1.5])]
    recvs = [np.array([3.0, 1.5, 2.5])]
    channel = ChannelModel("Binaural")

    native_bank = render_bank_batched(oracle, srcs, recvs, channel)

    import sonicsim_tpu.sim.bank_render as br

    monkeypatch.setattr(br.native, "image_sources_batch", lambda *a, **k: None)
    fallback_bank = render_bank_batched(oracle, srcs, recvs, channel)
    scale = np.abs(native_bank).max()
    np.testing.assert_allclose(
        fallback_bank, native_bank, atol=5e-5 * scale, rtol=1e-3
    )


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
