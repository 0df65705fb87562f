from .chunked import wav_chunk_inference
from .stitch import concatenate_tracks, spectral_embedding, stitch_segments

__all__ = [
    "concatenate_tracks",
    "spectral_embedding",
    "stitch_segments",
    "wav_chunk_inference",
]
