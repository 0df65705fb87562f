"""Convert a reference torch checkpoint (.pth) to a native best_model.pkl.

All 23 zoo models have registered converters (models/torch_import.py), each
verified for forward parity against a torch replica of the reference
architecture. Usage:

    python scripts/import_checkpoint.py --in best_model.pth \
        --out Exps/Conv-TasNet/best_model.pkl [--model ConvTasNet]
        [--arg N=512 --arg L=16 ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _parse_val(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            continue
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    return v


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True, help="torch .pth pack")
    ap.add_argument("--out", required=True, help="output best_model.pkl")
    ap.add_argument("--model", default=None,
                    help="model class name override (else from the pack)")
    ap.add_argument("--arg", action="append", default=[],
                    help="model kwarg override, e.g. --arg num_spks=2")
    args = ap.parse_args()

    from sonicsim_tpu.models.base import MODELS, save_model
    from sonicsim_tpu.models.torch_import import (
        import_torch_checkpoint,
        load_torch_pack,
    )

    model = None
    if args.model or args.arg:
        name, margs, _ = load_torch_pack(args.inp)
        name = args.model or name
        kwargs = {k: v for k, v in (margs or {}).items() if k != "n_src"}
        for kv in args.arg:
            k, v = kv.split("=", 1)
            kwargs[k] = _parse_val(v)
        if name.lower() in ("tdanet", "dccrn", "frcrn"):
            kwargs.setdefault("torch_compat", True)
        model = MODELS.get(name)(**kwargs)

    model, params = import_torch_checkpoint(args.inp, model=model)
    save_model(model, params, args.out)
    print(f"imported {type(model).__name__} -> {args.out}")


if __name__ == "__main__":
    main()
