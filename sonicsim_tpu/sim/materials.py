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
    """Area-weighted mean absorption for a room's surface composition."""
    total = sum(label_areas.values())
    if total <= 0:
        return 0.3
    acc = sum(
        material_for_label(lbl, materials).mean_absorption() * area
        for lbl, area in label_areas.items()
    )
    return acc / total
