from .chunked import wav_chunk_inference
from .postprocess import to_waveform
from .precision import bf16_forward, cast_floating
from .vad import energy_vad, segment_mixture
from .stitch import concatenate_tracks, spectral_embedding, stitch_segments

__all__ = [
    "bf16_forward",
    "cast_floating",
    "to_waveform",
    "energy_vad",
    "segment_mixture",
    "concatenate_tracks",
    "spectral_embedding",
    "stitch_segments",
    "wav_chunk_inference",
]
