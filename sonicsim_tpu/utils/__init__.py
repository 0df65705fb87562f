from .profiling import StageTimer, annotate, trace
from .config import import_target, instantiate, load_config, save_config
from .registry import Registry
from .audio import (
    all_pairs,
    make_pad_mask,
    pad_x_to_y,
    clip_all,
    clip_two,
    normalize,
    pcm16_quantize,
    sum_arrays_with_different_length,
)
from .seeding import stable_seed
from .wavio import read_wav, resample, write_wav

__all__ = [
    "all_pairs",
    "make_pad_mask",
    "pad_x_to_y",
    "clip_all",
    "clip_two",
    "normalize",
    "sum_arrays_with_different_length",
    "Registry",
    "StageTimer",
    "annotate",
    "trace",
    "import_target",
    "instantiate",
    "load_config",
    "read_wav",
    "resample",
    "save_config",
    "stable_seed",
    "pcm16_quantize",
    "write_wav",
]
