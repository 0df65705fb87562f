"""Acoustic material definitions and mp3d material-config loading.

The reference maps Matterport3D semantic labels to frequency-dependent
absorption/scattering/transmission/damping curves via a habitat material
JSON (SonicSet/material/mp3d_material_config.json, applied at
SonicSim_rir.py:189-193,307). This module reads that JSON format and reduces
curves to the band-averaged coefficients the shoebox oracle consumes; a
small built-in table covers hermetic use.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class Material:
    name: str
    absorption: list[float] = field(default_factory=lambda: [0.3])
    scattering: list[float] = field(default_factory=lambda: [0.1])
    transmission: list[float] = field(default_factory=lambda: [0.0])
    damping: list[float] = field(default_factory=lambda: [0.0])
    labels: list[str] = field(default_factory=list)

    def mean_absorption(self) -> float:
        return sum(self.absorption) / max(len(self.absorption), 1)

    def mean_scattering(self) -> float:
        return sum(self.scattering) / max(len(self.scattering), 1)


# Generic broadband values for hermetic scenes (typical published ranges).
DEFAULT_MATERIALS = {
    "default": Material("default", [0.30], [0.10]),
    "carpet": Material("carpet", [0.45], [0.15], labels=["rug", "carpet", "floor"]),
    "concrete": Material("concrete", [0.05], [0.05], labels=["wall", "ceiling"]),
    "wood": Material("wood", [0.12], [0.10], labels=["door", "furniture", "table"]),
    "glass": Material("glass", [0.04], [0.02], labels=["window", "mirror"]),
    "fabric": Material("fabric", [0.55], [0.20], labels=["curtain", "sofa", "bed"]),
}


def _curve_values(entry) -> list[float]:
    """Accept either a plain list or habitat's [{frequency, value}, ...]."""
    if not entry:
        return []
    if isinstance(entry[0], dict):
        return [float(p.get("value", 0.0)) for p in entry]
    return [float(v) for v in entry]


def load_material_config(path: str | Path) -> dict[str, Material]:
    """Parse a habitat/mp3d material config JSON into Material objects."""
    with open(path) as f:
        cfg = json.load(f)
    out: dict[str, Material] = {}
    for entry in cfg.get("materials", []):
        name = entry.get("name", f"material_{len(out)}")
        out[name] = Material(
            name=name,
            absorption=_curve_values(entry.get("absorption", [])) or [0.3],
            scattering=_curve_values(entry.get("scattering", [])) or [0.1],
            transmission=_curve_values(entry.get("transmission", [])) or [0.0],
            damping=_curve_values(entry.get("damping", [])) or [0.0],
            labels=list(entry.get("labels", [])),
        )
    return out


def material_for_label(
    label: str, materials: dict[str, Material] | None = None
) -> Material:
    materials = materials or DEFAULT_MATERIALS
    for mat in materials.values():
        if label in mat.labels or label == mat.name:
            return mat
    return materials.get("default", Material("default"))


def room_mean_absorption(
    label_areas: dict[str, float], materials: dict[str, Material] | None = None
) -> float:
    """Area-weighted mean absorption for a room's surface composition.

    Coarsest reduction — collapses material diversity to one scalar. The
    shoebox oracle's faithful path is :func:`wall_absorption_from_labels`,
    which keeps per-wall frequency curves (the reference applies materials
    per semantic surface, SonicSim_rir.py:189-193,307)."""
    total = sum(label_areas.values())
    if total <= 0:
        return 0.3
    acc = sum(
        material_for_label(lbl, materials).mean_absorption() * area
        for lbl, area in label_areas.items()
    )
    return acc / total


# Semantic aliases accepted by wall_absorption_from_labels, mapped onto the
# shoebox wall order shared with the native kernel and the bank renderer
# (image_source.WALLS: x0, xL, y0, yL, z0, zL; y up → y0 floor, yL ceiling).
WALL_ALIASES = {
    "x0": "x0", "xl": "xL", "y0": "y0", "yl": "yL", "z0": "z0", "zl": "zL",
    "floor": "y0", "ceiling": "yL",
    "west": "x0", "east": "xL", "north": "z0", "south": "zL",
}


def wall_absorption_from_labels(
    wall_labels: dict[str, str] | list[str],
    materials: dict[str, Material] | None = None,
) -> tuple[tuple[float, ...], ...]:
    """Per-wall absorption curves for ``ShoeboxRoom.wall_absorption_bands``.

    ``wall_labels`` is either a 6-list of material labels in WALLS order
    (x0, xL, y0, yL, z0, zL) or a dict keyed by wall name / alias
    (``floor``, ``ceiling``, ``north``/``south``/``east``/``west``, or the
    raw wall names) with a ``"walls"`` (or ``"default"``) entry covering
    the unnamed rest. Each label resolves through
    :func:`material_for_label` (so mp3d config labels and the built-in
    table both work) and keeps its FULL frequency curve — no banding
    collapse; the renderers resample to their band count.

    Example::

        room = ShoeboxRoom(dims, wall_absorption_bands=
            wall_absorption_from_labels(
                {"floor": "carpet", "ceiling": "concrete",
                 "walls": "concrete"}, load_material_config(cfg)))
    """
    from .image_source import WALLS

    if isinstance(wall_labels, dict):
        resolved: dict[str, str] = {}
        fallback = None
        for key, label in wall_labels.items():
            alias = WALL_ALIASES.get(key.lower())
            if alias is not None:
                resolved[alias] = label
            elif key.lower() in ("walls", "default"):
                fallback = label
            else:
                raise ValueError(
                    f"unknown wall name {key!r}; use one of "
                    f"{sorted(set(WALL_ALIASES))} or 'walls'/'default'"
                )
        labels = [resolved.get(wname, fallback) for wname in WALLS]
        missing = [w for w, lbl in zip(WALLS, labels) if lbl is None]
        if missing:
            raise ValueError(
                f"walls {missing} have no material; add them or a "
                "'walls'/'default' entry"
            )
    else:
        if len(wall_labels) != 6:
            raise ValueError(
                f"need 6 wall labels in WALLS order {WALLS}, got "
                f"{len(wall_labels)}"
            )
        labels = list(wall_labels)
    return tuple(
        tuple(material_for_label(lbl, materials).absorption) for lbl in labels
    )
