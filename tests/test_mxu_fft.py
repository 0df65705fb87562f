"""Matmul-FFT (ops/mxu_fft.py) numerics vs numpy/XLA references.

The grid-layout rfft/irfft replace XLA's VPU FFT in the hot convolution
loop on TPU (2x end-to-end measured); these tests pin the math on CPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sonicsim_tpu.ops.fftconv import (
    convolve_moving_receiver,
    convolve_moving_segmented,
    segment_plan,
)
from sonicsim_tpu.ops.interp import dynamic_interp_plan
from sonicsim_tpu.ops.mxu_fft import grid_shape, irfft_grid, pick_split, rfft_grid


@pytest.mark.parametrize(
    "n1,n2", [(2, 8), (4, 8), (6, 10), (8, 16), (12, 5), (32, 64)]
)
def test_rfft_grid_matches_numpy(n1, n2, rng):
    n = n1 * n2
    x = rng.standard_normal((3, n)).astype(np.float32)
    g = np.asarray(rfft_grid(jnp.asarray(x), n1, n2))
    assert g.shape == (3,) + grid_shape(n1, n2)
    # Grid flattens to k = k2 + n2*k1; the first n//2+1 bins are the rfft.
    flat = g.reshape(3, -1)[:, : n // 2 + 1]
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(flat, ref, atol=2e-5 * np.abs(ref).max())


@pytest.mark.parametrize("n1,n2", [(2, 8), (4, 8), (6, 10), (16, 32)])
def test_irfft_grid_roundtrip(n1, n2, rng):
    n = n1 * n2
    x = rng.standard_normal((2, 5, n)).astype(np.float32)
    back = np.asarray(irfft_grid(rfft_grid(jnp.asarray(x), n1, n2), n1, n2))
    np.testing.assert_allclose(back, x, atol=3e-6 * max(np.abs(x).max(), 1))


def test_grid_product_is_circular_convolution(rng):
    n1, n2 = 8, 16
    n = n1 * n2
    x = rng.standard_normal((4, n)).astype(np.float32)
    k = rng.standard_normal((4, n // 4)).astype(np.float32)
    got = np.asarray(
        irfft_grid(
            rfft_grid(jnp.asarray(x), n1, n2) * rfft_grid(jnp.asarray(k), n1, n2),
            n1,
            n2,
        )
    )
    ref = np.stack(
        [
            np.real(np.fft.ifft(np.fft.fft(x[i], n) * np.fft.fft(k[i], n)))
            for i in range(4)
        ]
    )
    np.testing.assert_allclose(got, ref, atol=2e-5 * np.abs(ref).max())


def test_rfft_grid_zero_pads_like_jnp(rng):
    n1, n2 = 6, 10
    n = n1 * n2
    x = rng.standard_normal((2, n - 7)).astype(np.float32)
    flat = np.asarray(rfft_grid(jnp.asarray(x), n1, n2)).reshape(2, -1)[
        :, : n // 2 + 1
    ]
    ref = np.fft.rfft(x.astype(np.float64), n, axis=-1)
    np.testing.assert_allclose(flat, ref, atol=2e-5 * max(np.abs(ref).max(), 1))


def test_pick_split_tightness():
    for want in (100, 4097, 48857, 130000):
        n1, n2 = pick_split(want)
        assert n1 % 2 == 0 and n1 * n2 >= want
        assert n1 * n2 - want < 2 * n2  # padding waste under two rows


def test_segmented_conv_mxu_matches_dense(rng):
    """Full moving-source conv with the matmul FFT == dense strategy."""
    t, p, c, l = 3000, 5, 2, 200
    positions = np.cumsum(rng.uniform(0.5, 1.0, (p, 3)), axis=0)
    idx, w = dynamic_interp_plan(positions, t, rng=rng)
    offsets, lengths, max_seg = segment_plan(idx)
    audio = jnp.asarray(rng.standard_normal(t).astype(np.float32))
    rirs = jnp.asarray(rng.standard_normal((p, c, l)).astype(np.float32) * 0.1)

    dense = convolve_moving_receiver(audio, rirs, jnp.asarray(idx), jnp.asarray(w))
    seg = convolve_moving_segmented(
        audio,
        rirs,
        jnp.asarray(w),
        jnp.asarray(offsets),
        jnp.asarray(lengths),
        max_seg,
        use_mxu_fft=True,
    )
    np.testing.assert_allclose(
        np.asarray(seg), np.asarray(dense), atol=5e-5 * np.abs(dense).max()
    )
