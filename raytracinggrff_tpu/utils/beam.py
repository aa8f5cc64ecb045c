"""Gaussian beam convolution for emission maps.

The reference convolves with scipy.ndimage.gaussian_filter using
sigma = beam_fwhm / (x span) * N_pix pixels (a FWHM-as-sigma simplification,
script/resample_with_ray_tracing.py:618-624). We reproduce that contract with
an FFT-based separable Gaussian in JAX (device-resident, differentiable).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _gaussian_kernel_1d(sigma, n):
    if sigma <= 0:
        k = np.zeros(n)
        k[0] = 1.0
        return jnp.asarray(k)
    # scipy's default truncation: radius = int(4*sigma + 0.5)
    radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    pad = np.zeros(n)
    pad[:radius + 1] = k[radius:]
    pad[n - radius:] = k[:radius]
    return jnp.asarray(pad)


def gaussian_beam_convolve(img, sigma_pix):
    """Separable periodic Gaussian blur (sigma in pixels).

    Matches scipy.ndimage.gaussian_filter to ~1e-3 away from edges
    (scipy uses reflect boundaries; emission maps are ~zero at edges).
    NaNs are treated as zero, as scipy would propagate them instead.
    """
    img = jnp.asarray(img)
    img = jnp.where(jnp.isfinite(img), img, 0.0)
    ny, nx = img.shape
    ky = _gaussian_kernel_1d(float(sigma_pix), ny)
    kx = _gaussian_kernel_1d(float(sigma_pix), nx)
    f = jnp.fft.rfft2(img)
    # separable: multiply row/col transfer functions
    fy = jnp.fft.fft(ky)          # full FFT along axis 0
    fx = jnp.fft.rfft(kx)         # real FFT along axis 1
    out = jnp.fft.irfft2(f * fy[:, None] * fx[None, :], s=(ny, nx))
    return out
