"""Level measurement and gain math for mixing (SNR/SIR), jitted.

Parity targets:
* ``rms_db``  — separation/look2hear/datas/movingdatamodule.py:29-32
  (10*log10(mean square), floored at 1e-20).
* ``sir_gains`` / ``snr_gain`` — the train-time mixing rules at
  movingdatamodule.py:106-124 (gain capped at +40 dB).
* ``normalize`` — SonicSim-SonicSet/SonicSim_audio.py:49-66 (peak / rms*100).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_db(wav: jax.Array) -> jax.Array:
    """Active-region RMS in dB over all axes (reference floors at 1e-20)."""
    mean_square = jnp.maximum(1e-20, jnp.mean(wav.astype(jnp.float32) ** 2))
    return 10.0 * jnp.log10(mean_square)


def gain_db_to_lin(gain_db: jax.Array) -> jax.Array:
    return 10.0 ** (gain_db / 20.0)


def mix_sources_sir(speakers: jax.Array, sirs_db: jax.Array) -> jax.Array:
    """Scale interferers to target SIRs relative to speaker 0.

    speakers: (n_spk, T); sirs_db: (n_spk-1,). Returns scaled (n_spk, T).
    Gain is capped at +40 dB like the reference (movingdatamodule.py:112).
    """
    target_db = rms_db(speakers[0])

    def scale_one(spk, sir):
        gain = jnp.minimum(target_db - rms_db(spk) - sir, 40.0)
        return spk * gain_db_to_lin(gain)

    scaled_interf = jax.vmap(scale_one)(speakers[1:], sirs_db)
    return jnp.concatenate([speakers[:1], scaled_interf], axis=0)


def scale_noise_snr(speech: jax.Array, noise: jax.Array, snr_db: jax.Array) -> jax.Array:
    """Scale ``noise`` so that speech/noise RMS ratio hits ``snr_db`` (cap +40 dB)."""
    gain = jnp.minimum(rms_db(speech) - rms_db(noise) - snr_db, 40.0)
    return noise * gain_db_to_lin(gain)


def peak_normalize(audio: jax.Array) -> jax.Array:
    peak = jnp.max(jnp.abs(audio))
    return jnp.where(peak > 0, audio / peak, audio)


def rms_normalize(audio: jax.Array) -> jax.Array:
    """Reference 'rms' norm: divide by (rms * 100), ignoring trailing zeros.

    The trailing-zero trim is data-dependent; we reproduce it with a mask up
    to the last nonzero sample (SonicSim_audio.py:56-64).
    """
    x = audio.astype(jnp.float32)
    nonzero = x != 0
    idx = jnp.arange(x.shape[-1])
    last = jnp.max(jnp.where(nonzero, idx, -1))
    mask = idx <= last
    n = jnp.maximum(jnp.sum(mask), 1)
    rms = jnp.sqrt(jnp.sum(jnp.where(mask, x * x, 0.0)) / n) * 100.0
    return jnp.where(rms > 0, x / rms, x)
