"""Process-stable seeding.

Python's ``hash()`` of str/bytes is randomized per process
(PYTHONHASHSEED), so seeds derived from scene/mixture names with it are
NOT reproducible across runs — ``stable_seed`` derives seeds from a keyed
cryptographic digest instead, keeping generation resume/replay
deterministic (SURVEY §7.4: "bit-faithful given the same banks and
plans"; the reference gets this implicitly from in-file constants,
SonicSet_train.py:153-178).
"""

from __future__ import annotations

import hashlib


def stable_seed(*parts) -> int:
    """Deterministic 31-bit seed from arbitrary repr-able parts."""
    digest = hashlib.blake2s(repr(parts).encode("utf-8")).digest()
    return int.from_bytes(digest[:4], "little") % (2**31)
