from .assemble import (
    assemble_long_audio,
    loudness_normalize_to,
    render_moving_source,
    render_static_source,
)
from .datamodule import MovingDataModule
from .device_assembly import UtteranceCache, assemble_plans_on_device
from .generate import (
    generate_split,
    plan_mixture,
    remove_existing_speakers,
    render_mixture,
)
from .remix import RemixTrainDataset, build_segment_manifest
from .plan import (
    LongAudioPlan,
    MixturePlan,
    Placement,
    load_length_manifest,
    load_split_manifest,
    plan_background_audio,
    plan_long_audio,
    scan_audio_lengths,
    select_files_to_fill,
)
from .sampler import (
    MovingTestDataset,
    MovingTestEvalDataset,
    MovingTrainDataset,
    apply_sir,
    apply_snr,
    find_bottom_directories,
    overlap_audio,
)

__all__ = [
    "LongAudioPlan",
    "RemixTrainDataset",
    "build_segment_manifest",
    "MixturePlan",
    "MovingDataModule",
    "MovingTestDataset",
    "MovingTestEvalDataset",
    "MovingTrainDataset",
    "Placement",
    "apply_sir",
    "apply_snr",
    "assemble_long_audio",
    "assemble_plans_on_device",
    "UtteranceCache",
    "find_bottom_directories",
    "generate_split",
    "load_length_manifest",
    "load_split_manifest",
    "loudness_normalize_to",
    "overlap_audio",
    "plan_background_audio",
    "plan_long_audio",
    "plan_mixture",
    "remove_existing_speakers",
    "render_mixture",
    "render_moving_source",
    "render_static_source",
    "scan_audio_lengths",
    "select_files_to_fill",
]
