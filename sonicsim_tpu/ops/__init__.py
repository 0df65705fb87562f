from .fftconv import (
    block_plan_sizes,
    convolve_fixed_receiver,
    convolve_moving_blocked,
    convolve_moving_receiver,
    convolve_moving_segmented,
    fft_convolve,
    moving_block_plan,
    overlap_add_chunks,
    segment_plan,
)
from .interp import dynamic_interp_plan, interpolate_positions
from .levels import (
    gain_db_to_lin,
    mix_sources_sir,
    peak_normalize,
    rms_db,
    rms_normalize,
    scale_noise_snr,
)
from .loudness import (
    biquad,
    integrated_loudness,
    k_weight,
    k_weighting_coeffs,
    loudness_normalize,
    lufs_norm,
)
from .stft import hann_window, istft, sqrt_hann_window, stft

__all__ = [
    "biquad",
    "block_plan_sizes",
    "convolve_fixed_receiver",
    "convolve_moving_blocked",
    "convolve_moving_receiver",
    "convolve_moving_segmented",
    "dynamic_interp_plan",
    "fft_convolve",
    "gain_db_to_lin",
    "hann_window",
    "integrated_loudness",
    "interpolate_positions",
    "istft",
    "k_weight",
    "k_weighting_coeffs",
    "loudness_normalize",
    "lufs_norm",
    "moving_block_plan",
    "mix_sources_sir",
    "overlap_add_chunks",
    "peak_normalize",
    "rms_db",
    "rms_normalize",
    "scale_noise_snr",
    "segment_plan",
    "sqrt_hann_window",
    "stft",
]
