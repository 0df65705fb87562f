"""Parity of the DSP hot loop against the REFERENCE'S OWN code.

Imports /root/reference/SonicSim-SonicSet/SonicSim_moving.py (pure
NumPy/SciPy/torch — no habitat dependency beyond type imports, which are
stubbed) and checks our kernels against it directly, not against a
hand-written replica:

  - setup_dynamic_interp  vs ops.interp.dynamic_interp_plan  (EXACT,
    including the np.random.choice rounding-error redistribution)
  - convolve_fixed_receiver  vs ops.fftconv.convolve_fixed_receiver
  - convolve_moving_receiver vs ops.fftconv.convolve_moving_segmented
  - interpolate_moving_audio vs dataset.assemble.render_moving_source

The model zoos already get this treatment (tests/
test_reference_source_parity.py); this closes the same gap for the
moving-source DSP (SonicSim_moving.py:15-125, the generation hot loop).
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF_DIR = Path("/root/reference/SonicSim-SonicSet")

pytestmark = pytest.mark.skipif(
    not (REF_DIR / "SonicSim_moving.py").exists(),
    reason="reference checkout not present",
)


@pytest.fixture(scope="module")
def ref_moving():
    """Import the reference module with its habitat-typed import stubbed
    (SonicSim_moving.py only uses Receiver/Source/Scene as annotations)."""
    stub = types.ModuleType("SonicSim_rir")
    stub.Receiver = type("Receiver", (), {})
    stub.Source = type("Source", (), {})
    stub.Scene = type("Scene", (), {})
    saved = sys.modules.get("SonicSim_rir")
    sys.modules["SonicSim_rir"] = stub
    sys.path.insert(0, str(REF_DIR))
    try:
        import SonicSim_moving as m

        yield m
    finally:
        sys.path.remove(str(REF_DIR))
        if saved is None:
            sys.modules.pop("SonicSim_rir", None)
        else:
            sys.modules["SonicSim_rir"] = saved
        sys.modules.pop("SonicSim_moving", None)


def _trajectory(rng, p=7):
    return np.cumsum(rng.uniform(0.2, 0.9, size=(p, 3)), axis=0)


def test_setup_dynamic_interp_exact(ref_moving):
    """Same waypoints, same legacy-np.random seed → bit-identical
    (index, weight) plans, including the random rounding redistribution
    (SonicSim_moving.py:34-39)."""
    from sonicsim_tpu.ops import dynamic_interp_plan

    pos = _trajectory(np.random.default_rng(1))
    for total, seed in ((16000, 0), (16001, 3), (12345, 7)):
        np.random.seed(seed)
        ref_idx, ref_w = ref_moving.setup_dynamic_interp(pos, total)
        np.random.seed(seed)
        # Passing the legacy np.random module reproduces the reference's
        # np.random.choice draw exactly.
        idx, w = dynamic_interp_plan(pos, total, rng=np.random)
        assert np.array_equal(np.asarray(idx, np.int64), np.asarray(ref_idx, np.int64))
        np.testing.assert_array_equal(w, ref_w)
        assert len(idx) == total


def test_convolve_fixed_receiver_matches(ref_moving):
    from sonicsim_tpu.ops import convolve_fixed_receiver

    rng = np.random.default_rng(2)
    audio = rng.standard_normal(8000).astype(np.float32) * 0.1
    rirs = (rng.standard_normal((2, 900)) * np.exp(-np.linspace(0, 6, 900))).astype(
        np.float32
    )
    ref = ref_moving.convolve_fixed_receiver(audio, rirs)
    ours = np.asarray(convolve_fixed_receiver(audio, rirs))
    assert ours.shape == ref.shape == (2, 8000)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_convolve_moving_receiver_matches(ref_moving):
    """The segmented/blocked kernel must reproduce the reference's
    oaconvolve-everything + per-sample-lerp (SonicSim_moving.py:63-96)."""
    import jax.numpy as jnp

    from sonicsim_tpu.ops import (
        convolve_moving_segmented,
        dynamic_interp_plan,
        segment_plan,
    )

    rng = np.random.default_rng(3)
    pos = _trajectory(rng, p=6)
    total = 9000
    audio = rng.standard_normal(total).astype(np.float32) * 0.1
    rirs = (
        rng.standard_normal((len(pos), 2, 700))
        * np.exp(-np.linspace(0, 7, 700))
        * 0.2
    ).astype(np.float32)

    np.random.seed(11)
    idx, w = dynamic_interp_plan(pos, total, rng=np.random)
    np.random.seed(11)
    ref_idx, ref_w = ref_moving.setup_dynamic_interp(pos, total)
    assert np.array_equal(np.asarray(idx, np.int64), np.asarray(ref_idx, np.int64))

    ref = ref_moving.convolve_moving_receiver(audio, rirs, ref_idx, ref_w)
    offsets, lengths, max_seg = segment_plan(idx)
    ours = np.asarray(
        convolve_moving_segmented(
            jnp.asarray(audio), jnp.asarray(rirs), jnp.asarray(w),
            jnp.asarray(offsets), jnp.asarray(lengths), max_seg,
        )
    )
    assert ours.shape == ref.shape == (2, total)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_interpolate_moving_audio_matches(ref_moving):
    """End-to-end moving render: reference interpolate_moving_audio
    (SonicSim_moving.py:98-125) vs our render_moving_source, same seed."""
    import torch

    from sonicsim_tpu.dataset.assemble import render_moving_source

    rng = np.random.default_rng(4)
    pos = _trajectory(rng, p=5)
    total = 8000
    audio = (rng.standard_normal(total) * 0.1).astype(np.float32)
    # reference takes a list of (1, C, L) IRs (one per waypoint)
    bank = (
        rng.standard_normal((len(pos), 2, 600))
        * np.exp(-np.linspace(0, 6, 600))
        * 0.2
    ).astype(np.float32)

    np.random.seed(5)
    ref = ref_moving.interpolate_moving_audio(
        torch.from_numpy(audio[None]), list(bank[:, None]), pos
    ).numpy()

    np.random.seed(5)
    ours = render_moving_source(audio, bank, pos, rng=np.random)
    assert ours.shape == ref.shape == (2, total)
    np.testing.assert_allclose(ours, ref, atol=5e-5)
