"""Process-stable seeding (utils/seeding.py).

Regression for a real bug: generation seeds were derived with Python's
``hash()`` of scene/triple name strings, which PYTHONHASHSEED randomizes
per process — the same (scene, triple) produced different mixture content
on every run/resume. ``stable_seed`` must be identical across processes
regardless of hash randomization.
"""

import subprocess
import sys

from sonicsim_tpu.utils import stable_seed

SNIPPET = (
    "from sonicsim_tpu.utils import stable_seed;"
    "print(stable_seed(0, 'scene000', 'spk01-spk02-spk03'))"
)


def test_stable_seed_golden():
    # pinned: changing the digest scheme silently re-seeds every dataset
    assert stable_seed(0, "scene000", "spk01-spk02-spk03") == 548416179
    assert stable_seed("name", 0) != stable_seed("name", 1)
    assert 0 <= stable_seed("x") < 2**31


def test_stable_seed_across_hash_randomization():
    values = set()
    for hash_seed in ("1", "2"):
        out = subprocess.run(
            [sys.executable, "-c", SNIPPET],
            capture_output=True, text=True, timeout=120,
            env={"PYTHONHASHSEED": hash_seed, "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": "."},
            cwd=".",
        )
        assert out.returncode == 0, out.stderr[-500:]
        values.add(int(out.stdout.strip()))
    assert values == {548416179}
