"""Golden tests: STFT/iSTFT vs torch.stft (torch CPU is available)."""

import jax.numpy as jnp
import numpy as np
import torch

from sonicsim_tpu.ops import hann_window, istft, stft


def test_stft_matches_torch(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    n_fft, hop = 512, 128
    win = hann_window(n_fft)
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop, win))
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        return_complex=True,
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours.real, ref.real, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ours.imag, ref.imag, rtol=1e-3, atol=1e-4)


def test_stft_batched_matches_torch(rng):
    x = rng.standard_normal((3, 2048)).astype(np.float32)
    n_fft, hop = 256, 64
    win = hann_window(n_fft)
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop, win))
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        return_complex=True,
    ).numpy()
    np.testing.assert_allclose(ours.real, ref.real, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ours.imag, ref.imag, rtol=1e-3, atol=1e-4)


def test_istft_roundtrip(rng):
    x = rng.standard_normal(3000).astype(np.float32)
    n_fft, hop = 512, 128
    win = hann_window(n_fft)
    spec = stft(jnp.asarray(x), n_fft, hop, win)
    y = np.asarray(istft(spec, n_fft, hop, win, length=3000))
    np.testing.assert_allclose(y, x, rtol=1e-3, atol=1e-4)


def test_istft_matches_torch(rng):
    x = rng.standard_normal(2048).astype(np.float32)
    n_fft, hop = 256, 128
    win = hann_window(n_fft)
    spec_t = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        return_complex=True,
    )
    ref = torch.istft(
        spec_t,
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        length=2048,
    ).numpy()
    ours = np.asarray(
        istft(jnp.asarray(spec_t.numpy()), n_fft, hop, win, length=2048)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
