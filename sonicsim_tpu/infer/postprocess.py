"""Model-output → waveform postprocessing dispatch.

The enhancement zoo returns heterogeneous outputs (cIRM tuples, compressed
spectra, stage lists, waveforms); the reference's eval scripts dispatch
per model family (enhancement/test.py:41-77,128-135). This registry maps a
model instance to a waveform converter so the eval drivers stay generic.

``to_waveform(model, output, length)`` → (B, n_src, T).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_waveform(model, output, length: int) -> jax.Array:
    from ..losses.cirm import cirm_inference
    from ..losses.gagnet import gagnet_wav
    from ..losses.taylorsenet import taylor_wav

    name = type(model).__name__.lower()

    if name in ("fullband", "fullsubnet", "fullsubnet_plus", "inter_subnet",
                "fastfullsubnet"):
        wav = cirm_inference(
            output, model.n_fft, model.hop_length, length
        )
        return wav[:, None, :]
    if name in ("gagnet", "g2net"):
        wav = gagnet_wav(output, model.n_fft, model.hop_length, length)
        return wav[:, None, :]
    if name == "taylorsenet":
        wav = taylor_wav(output, model.n_fft, model.hop_length, length)
        return wav[:, None, :]
    if name == "frcrn":
        return output[1][4][:, None, :]  # refined-stage waveform
    if name in ("dccrn", "bsrnnespnet"):
        out = jnp.asarray(output)
        return out[:, None, :] if out.ndim == 2 else out
    # Separation models and SuDORMRF already emit (B, n_src, T).
    out = jnp.asarray(output)
    if out.ndim == 2:
        out = out[:, None, :]
    return out[..., :length]
