"""Chunked long-audio inference parity vs the reference's own
wav_chunk_inference (separation/look2hear/utils/separator.py:72-131).

A linear 'separator' (track k = fixed gain_k × input) makes the expected
output exact, so the overlap-add bookkeeping (lead/tail padding, hop
grid, overlap-ratio normalization) of both implementations can be
compared sample-for-sample on the same mixture.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference/separation/look2hear/utils/separator.py")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference absent")


@pytest.fixture(scope="module")
def ref_sep():
    # separator.py imports soundfile only for its save helpers; stub it.
    saved = sys.modules.get("soundfile")
    sys.modules["soundfile"] = types.ModuleType("soundfile")
    try:
        spec = importlib.util.spec_from_file_location("ref_separator", REF)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        yield mod
    finally:
        if saved is None:
            sys.modules.pop("soundfile", None)
        else:
            sys.modules["soundfile"] = saved


GAINS = np.array([0.5, -1.25], np.float32)


def test_wav_chunk_inference_matches_reference(ref_sep, rng):
    from sonicsim_tpu.infer import wav_chunk_inference

    sr = 1600  # scaled-down rates keep the test fast; ratios match prod
    x = (rng.standard_normal(int(7.3 * sr)) * 0.2).astype(np.float32)

    class LinearSep(torch.nn.Module):
        def forward(self, mix):  # (B, nch, T) → (B, n_tracks, nch, T)
            return torch.stack([g * mix for g in GAINS.tolist()], dim=1)

    theirs = ref_sep.wav_chunk_inference(
        LinearSep(), torch.from_numpy(x)[None, None], sr=sr,
        target_length=3.0, hop_length=1.0, batch_size=4, n_tracks=2,
    ).numpy()  # (n_tracks, nch, T) after squeeze(0)

    ours = wav_chunk_inference(
        lambda b: np.stack([g * b for g in GAINS], axis=1),
        x, sample_rate=sr, target_length=3.0, hop_length=1.0,
        batch_size=4, n_tracks=2,
    )  # (n_tracks, T)

    assert theirs.shape == (2, 1, len(x))
    assert ours.shape == (2, len(x))
    np.testing.assert_allclose(ours, theirs[:, 0], atol=1e-5)
    # and both equal the analytically exact answer
    np.testing.assert_allclose(ours, GAINS[:, None] * x[None], atol=1e-5)
