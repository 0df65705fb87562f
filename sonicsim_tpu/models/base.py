"""Model base, registry and portable serialization.

Parity targets:
* registry + case-insensitive ``get`` — separation/look2hear/models/__init__.py:28-60
* ``BaseModel.serialize``/``from_pretrain`` portable checkpoints —
  separation/look2hear/models/base_model.py:29-88 (torch .pth there; a
  pickled numpy pytree here, plus a torch-.pth import shim for the released
  reference checkpoints).

Models are flax.linen Modules taking waveforms (B, T) → (B, n_spk, T)
(separation) or task-specific spectra (enhancement). Parameters live in a
separate pytree (functional JAX style); (model, params) pairs travel
together through save/load.
"""

from __future__ import annotations

import pickle
from dataclasses import fields
from pathlib import Path
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import __version__
from ..utils.registry import Registry

MODELS = Registry("model")
register_model = MODELS.register


def get(identifier: str) -> type:
    return MODELS.get(identifier)


class BaseModel(nn.Module):
    """Common base: every model carries its sample_rate and a wave API."""

    def init_params(self, rng: jax.Array, example_len: int = 16000) -> Any:
        x = jnp.zeros((1, example_len), jnp.float32)
        return self.init(rng, x)

    def model_args(self) -> dict:
        return {f.name: getattr(self, f.name) for f in fields(self) if f.name not in ("parent", "name")}


def serialize(model: BaseModel, params: Any) -> dict:
    """Portable checkpoint dict (mirrors base_model.py:66-80)."""
    host_params = jax.tree.map(lambda a: np.asarray(a), params)
    return {
        "model_name": type(model).__name__,
        "model_args": model.model_args(),
        "state_dict": host_params,
        "framework": "sonicsim_tpu",
        "version": __version__,
    }


def save_model(model: BaseModel, params: Any, path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(serialize(model, params), f)


def from_pretrain(path_or_pack: str | Path | dict) -> tuple[BaseModel, Any]:
    """Re-instantiate (model, params) from a serialized pack or file.

    Mirrors base_model.py:52-64's registry round-trip. Also accepts reference
    torch checkpoints (dict with torch tensors) when a torch-import converter
    is registered for the model (see ``torch_import.py``).
    """
    if isinstance(path_or_pack, (str, Path)):
        with open(path_or_pack, "rb") as f:
            head = f.read(2)
        if head == b"PK":  # torch zip serialization → reference .pth
            from .torch_import import import_torch_checkpoint

            return import_torch_checkpoint(path_or_pack)
        with open(path_or_pack, "rb") as f:
            pack = pickle.load(f)
    else:
        pack = path_or_pack
    if pack.get("framework") != "sonicsim_tpu":
        from .torch_import import import_torch_checkpoint

        return import_torch_checkpoint(pack)
    cls = MODELS.get(pack["model_name"])
    model = cls(**pack["model_args"])
    params = jax.tree.map(jnp.asarray, pack["state_dict"])
    return model, params
