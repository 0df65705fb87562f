"""Transcript-tool parity vs the reference's own tool_utils.py: the CSV a
reference user already generated must load identically here, and our
process_librispeech must produce a CSV the reference's loader reads back
to the same dict (tool_utils.py:14-35)."""

import importlib.util
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")
pd = pytest.importorskip("pandas")

REF = Path("/root/reference/SonicSim-SonicSet/tool_utils.py")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference absent")


@pytest.fixture(scope="module")
def ref_tools():
    spec = importlib.util.spec_from_file_location("ref_tool_utils", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def _librispeech_tree(root: Path):
    d = root / "103" / "1240"
    d.mkdir(parents=True)
    (d / "103-1240.trans.txt").write_text(
        "103-1240-0000 CHAPTER ONE MISSUS RACHEL\n"
        "103-1240-0001 THAT HAD ITS SOURCE AWAY BACK\n"
    )
    d2 = root / "103" / "1241"
    d2.mkdir()
    (d2 / "103-1241.trans.txt").write_text("103-1241-0000 SECOND SPEAKER LINE\n")
    return root


def test_csv_cross_loading(ref_tools, tmp_path):
    from sonicsim_tpu.utils.transcripts import load_transcripts, process_librispeech

    tree = _librispeech_tree(tmp_path / "ls")
    ref_csv = tmp_path / "ref.csv"
    our_csv = tmp_path / "ours.csv"
    ref_tools.process_librispeech(str(tree), str(ref_csv))
    process_librispeech(tree, our_csv)

    ref_from_ref = ref_tools.load_transcripts(str(ref_csv))
    ref_from_ours = ref_tools.load_transcripts(str(our_csv))  # cross-load
    ours_from_ref = load_transcripts(ref_csv)  # cross-load
    ours_from_ours = load_transcripts(our_csv)

    assert ref_from_ref == ref_from_ours == ours_from_ref == ours_from_ours
    assert ref_from_ref["103-1240-0001.flac"] == "THAT HAD ITS SOURCE AWAY BACK"
    assert len(ref_from_ref) == 3
