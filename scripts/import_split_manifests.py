"""Import SonicSet split manifests from a reference checkout.

The reference ships its data splits as six text files + four length JSONs
(SonicSim-SonicSet/data/{train,val,test}_{scene,speech}.txt and
*_{noise,music}.json — SURVEY.md §2.1 "Split manifests": 61/19/9 mp3d scene
ids, LibriSpeech speaker-dir lists, and {path: num_samples} maps for the
DnR noise/music corpora). This importer normalizes them into ONE framework
manifest (data/sonicset_splits.json) with machine-local absolute prefixes
stripped, so the committed file is portable: at generation time the paths
are re-rooted onto the user's corpus locations.

Usage:
  python scripts/import_split_manifests.py \
      --reference /path/to/SonicSim/SonicSim-SonicSet/data \
      --out data/sonicset_splits.json
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

SPLITS = ("train", "val", "test")

# Machine-local roots seen in the published manifests; anything up to and
# including these markers is stripped (the remainder is corpus-relative).
_PREFIX_RE = re.compile(r"^.*?/(LibriSpeech|dnr|DnR[^/]*)/")


def relativize(path: str) -> str:
    m = _PREFIX_RE.match(path)
    return path[m.start(1):] if m else path.lstrip("/")


def import_split(data_dir: Path, split: str) -> dict:
    scenes = [
        ln.strip()
        for ln in (data_dir / f"{split}_scene.txt").read_text().splitlines()
        if ln.strip()
    ]
    speech = [
        relativize(ln.strip())
        for ln in (data_dir / f"{split}_speech.txt").read_text().splitlines()
        if ln.strip()
    ]
    out = {"scenes": scenes, "speech": speech}
    for kind in ("noise", "music"):
        with open(data_dir / f"{split}_{kind}.json") as f:
            raw = json.load(f)
        out[kind] = {relativize(k): int(v) for k, v in raw.items()}
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True,
                    help="reference SonicSim-SonicSet/data directory")
    ap.add_argument("--out", default="data/sonicset_splits.json")
    args = ap.parse_args()

    data_dir = Path(args.reference)
    manifest = {
        "format": "sonicsim_tpu.splits.v1",
        "provenance": "imported from the published SonicSet split manifests "
                      "(scene ids, speaker dirs, corpus lengths); paths "
                      "re-rooted at load time",
        "splits": {s: import_split(data_dir, s) for s in SPLITS},
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(manifest, f, indent=0, sort_keys=True)
    for s in SPLITS:
        sp = manifest["splits"][s]
        print(f"{s}: {len(sp['scenes'])} scenes, {len(sp['speech'])} "
              f"speakers, {len(sp['noise'])} noise, {len(sp['music'])} music")
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
