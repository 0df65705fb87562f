"""Audio-assembly helper parity vs the reference's own SonicSim_audio.py.

The module's heavy deps (torchaudio, pyloudnorm) are stubbed — the
functions under test (fft_conv, normalize, all_pairs, clip_all/clip_two;
SonicSim_audio.py:17-151) use only torch/numpy/itertools. LUFS itself is
parity-tested separately against BS.1770 behavior
(tests/test_levels_loudness.py).
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

REF = Path("/root/reference/SonicSim-SonicSet/SonicSim_audio.py")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference absent")


@pytest.fixture(scope="module")
def ref_audio():
    stubs = {}
    for name in ("torchaudio", "pyloudnorm", "SonicSim_rir"):
        stubs[name] = sys.modules.get(name)
        mod = types.ModuleType(name)
        if name == "pyloudnorm":
            mod.Meter = object
            mod.normalize = types.SimpleNamespace(loudness=None)
        if name == "SonicSim_rir":
            mod.render_rir_parallel = None
        sys.modules[name] = mod
    try:
        spec = importlib.util.spec_from_file_location("ref_sonicsim_audio", REF)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for name, saved in stubs.items():
            if saved is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = saved
        sys.modules.pop("ref_sonicsim_audio", None)


def test_fft_conv_matches(ref_audio, rng):
    """Even-total-length regime: exact agreement with the reference's
    torch-rfft full conv. (For ODD len(sig)+len(ker)-1 the reference's
    irfftn-without-n assumes an even signal and corrupts the result
    globally — our fft_convolve passes the length explicitly and matches
    np.convolve in both regimes, asserted below.)"""
    from sonicsim_tpu.ops.fftconv import fft_convolve

    sig = (rng.standard_normal(5000) * 0.3).astype(np.float32)
    ker = (rng.standard_normal(701) * np.exp(-np.linspace(0, 5, 701))).astype(
        np.float32
    )
    theirs = ref_audio.fft_conv(
        torch.from_numpy(sig), torch.from_numpy(ker)
    ).numpy()
    ours = np.asarray(fft_convolve(jnp.asarray(sig), jnp.asarray(ker)))
    n = len(sig) + len(ker) - 1
    assert n % 2 == 0 and len(theirs) == len(ours) == n
    np.testing.assert_allclose(ours, theirs, atol=2e-5)

    # Odd-total regime: we stay correct where the reference drifts.
    ker_odd = ker[:-1]
    full = np.convolve(sig, ker_odd).astype(np.float32)
    ours_odd = np.asarray(fft_convolve(jnp.asarray(sig), jnp.asarray(ker_odd)))
    np.testing.assert_allclose(ours_odd, full, atol=2e-5)


def test_normalize_matches(ref_audio, rng):
    from sonicsim_tpu.utils.audio import normalize

    x = (rng.standard_normal(4000) * 0.7).astype(np.float32)
    x[-100:] = 0.0  # rms mode trims trailing zeros before measuring
    for norm in ("peak", "rms"):
        theirs = ref_audio.normalize(torch.from_numpy(x.copy()), norm=norm)
        theirs = theirs.numpy() if torch.is_tensor(theirs) else np.asarray(theirs)
        ours = normalize(x.copy(), norm=norm)
        np.testing.assert_allclose(ours, theirs, atol=1e-6, err_msg=norm)
    np.testing.assert_array_equal(
        normalize(np.zeros(8, np.float32)),
        ref_audio.normalize(torch.zeros(8)).numpy(),
    )


def test_all_pairs_and_clip_match(ref_audio, rng):
    from sonicsim_tpu.utils.audio import all_pairs, clip_all, clip_two

    a1, b1 = all_pairs([1, 2, 3], ["x", "y"])
    a2, b2 = ref_audio.all_pairs([1, 2, 3], ["x", "y"])
    assert a1 == a2 and b1 == b2

    sigs = [
        (rng.standard_normal(n) * 0.1).astype(np.float32) for n in (50, 30, 40)
    ]
    theirs = ref_audio.clip_all([torch.from_numpy(s) for s in sigs])
    ours = clip_all(sigs)
    for o, t in zip(ours, theirs):
        np.testing.assert_array_equal(o, t.numpy())

    o1, o2 = clip_two(sigs[0], sigs[1])
    t1, t2 = ref_audio.clip_two(
        torch.from_numpy(sigs[0]), torch.from_numpy(sigs[1])
    )
    np.testing.assert_array_equal(o1, t1.numpy())
    np.testing.assert_array_equal(o2, t2.numpy())
