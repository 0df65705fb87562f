"""LibriSpeech transcript tooling (tool_utils.py:6-35 parity)."""

from __future__ import annotations

import csv
from pathlib import Path


def process_librispeech(librispeech_root: str | Path, out_csv: str | Path) -> int:
    """Walk LibriSpeech .trans.txt files → CSV (name, words)
    (tool_utils.py:14-30)."""
    rows = []
    for txt in sorted(Path(librispeech_root).rglob("*.trans.txt")):
        with open(txt) as f:
            for line in f:
                parts = line.strip().split(" ", 1)
                if len(parts) == 2:
                    rows.append((parts[0] + ".flac", parts[1]))
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "words"])
        w.writerows(rows)
    return len(rows)


def load_transcripts(csv_path: str | Path) -> dict[str, str]:
    """CSV → {audio_name: words} (tool_utils.py:32-35), loading exactly the
    reference loader's dict. Extension-blind lookup (reference CSVs key by
    '<id>.flac' while WAV corpora place '<id>.wav') is the CONSUMER's job —
    dataset/generate.py falls back name → stem — so the returned mapping
    stays equal to the reference's (tests/test_reference_transcripts_parity)."""
    out: dict[str, str] = {}
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            out[row["name"]] = row["words"]
    return out


def find_matching_indices(list_a: list, list_b: list) -> list[int]:
    """Indices of items of ``list_a`` present in ``list_b``
    (tool_utils.py:6-12)."""
    lookup = set(list_b)
    return [i for i, v in enumerate(list_a) if v in lookup]
