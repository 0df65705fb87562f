"""overlap_audio parity vs the reference's own enhancement datamodule
(enhancement/look2hear/datas/movingdatamodule.py:34-48) — the noise
densifier the enhancement eval remix applies before mixing. Heavy deps
(librosa, soundfile, torchaudio, pytorch_lightning) are stubbed; the
function itself is pure torch."""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference/enhancement/look2hear/datas/movingdatamodule.py")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference absent")


@pytest.fixture(scope="module")
def ref_dm():
    stubs = {}
    names = [
        "librosa", "soundfile", "torchaudio",
        "pytorch_lightning", "pytorch_lightning.utilities",
    ]
    for name in names:
        stubs[name] = sys.modules.get(name)
        mod = types.ModuleType(name)
        if name == "pytorch_lightning":
            mod.LightningDataModule = object
        if name == "pytorch_lightning.utilities":
            mod.rank_zero_only = lambda f: f
        sys.modules[name] = mod
    sys.modules["pytorch_lightning"].utilities = sys.modules[
        "pytorch_lightning.utilities"
    ]
    try:
        spec = importlib.util.spec_from_file_location("ref_enh_dm", REF)
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
        sys.modules.pop("ref_enh_dm", None)


def test_overlap_audio_matches(ref_dm, rng):
    from sonicsim_tpu.dataset import overlap_audio

    for seconds, delay in ((20.0, 6), (8.0, 3)):
        x = (rng.standard_normal((1, int(seconds * 16000))) * 0.2).astype(
            np.float32
        )
        theirs = ref_dm.overlap_audio(
            torch.from_numpy(x), 16000, delay=delay
        ).numpy()
        ours = overlap_audio(x, 16000, delay=delay)
        # ours is (T,) (mono API); the reference keeps the channel dim
        np.testing.assert_allclose(np.asarray(ours), theirs[0], atol=1e-7)
