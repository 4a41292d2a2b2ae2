"""IQ -> spectrogram preprocessing, on-device (jit; Pallas-ready shapes).

The north-star extension (BASELINE.json): the reference consumes offline-
rendered spectrogram images (no IQ->STFT code exists in the repo — SURVEY
preamble); here the whole front-end is a fused jitted pipeline that turns raw
complex IQ into detector-ready (B, H, W, 3) images on the TPU:

    frame -> Hann window -> FFT -> |.|^2 -> log10 -> per-capture min/max
    normalize -> fftshift -> (optional viridis colormap) -> resize

Framing is a reshape when hop == n_fft (no overlap) or a gather otherwise;
both are static-shaped. The FFT runs as one batched jnp.fft.fft over
(B, frames, n_fft) — XLA lowers this to the TPU FFT HLO.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def frame_signal(iq: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(B, N) complex -> (B, frames, n_fft) overlapping frames (static shapes)."""
    b, n = iq.shape
    frames = 1 + (n - n_fft) // hop
    if hop == n_fft:
        return iq[:, : frames * n_fft].reshape(b, frames, n_fft)
    starts = jnp.arange(frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return iq[:, idx]


def _dft_matrices(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT matrices W[j, k] = exp(-2*pi*i*j*k/N)."""
    jk = np.outer(np.arange(n_fft), np.arange(n_fft)).astype(np.float64)
    ang = -2.0 * np.pi * jk / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def iq_to_spectrogram(
    iq,  # (B, N) complex64 or (B, N, 2) float
    n_fft: int = 512,
    hop: int = 256,
    out_hw: Optional[Tuple[int, int]] = (640, 640),
    colormap: bool = False,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Raw IQ -> (B, H, W, 3) float32 image in [0, 1]. Complex input is split
    to (B, N, 2) float32 ON HOST — complex dtypes never reach the device
    (this TPU backend supports neither complex transfer nor complex FFT)."""
    if getattr(iq, "ndim", 0) == 2 and np.iscomplexobj(iq):
        iq = np.stack([np.real(iq), np.imag(iq)], axis=-1).astype(np.float32)
    return _iq_to_spectrogram_jit(jnp.asarray(iq), n_fft, hop, out_hw, colormap, eps)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "out_hw", "colormap", "eps"))
def _iq_to_spectrogram_jit(
    iq: jnp.ndarray,  # (B, N, 2) float
    n_fft: int = 512,
    hop: int = 256,
    out_hw: Optional[Tuple[int, int]] = (640, 640),
    colormap: bool = False,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Device half of the IQ front-end.

    Axis convention (matches typical waterfall rendering and our synthetic
    dataset): rows = frequency (fftshifted, low->high), cols = time frames.

    The DFT runs as two real (T, N) @ (N, N) matmuls on the MXU instead of a
    complex FFT: at spectrogram sizes (N <= 1024) the systolic array is the
    right unit, the pipeline stays free of complex dtypes, and the IQ can
    ship as (B, N, 2) float32 — or int16 from an SDR — instead of complex64.
    """
    re_sig, im_sig = iq[..., 0].astype(jnp.float32), iq[..., 1].astype(jnp.float32)
    fr = frame_signal(re_sig, n_fft, hop)  # (B, T, N)
    fi = frame_signal(im_sig, n_fft, hop)
    win = jnp.hanning(n_fft).astype(jnp.float32)
    fr = fr * win
    fi = fi * win
    w_re, w_im = (jnp.asarray(m) for m in _dft_matrices(n_fft))
    spec_re = fr @ w_re - fi @ w_im
    spec_im = fr @ w_im + fi @ w_re
    power = jnp.log10(spec_re**2 + spec_im**2 + eps)  # (B, T, F)
    power = jnp.roll(power, n_fft // 2, axis=-1)  # fftshift
    img = power.transpose(0, 2, 1)  # (B, F, T): freq rows, time cols
    lo = img.min(axis=(1, 2), keepdims=True)
    hi = img.max(axis=(1, 2), keepdims=True)
    img = (img - lo) / (hi - lo + 1e-6)
    if out_hw is not None:
        b = img.shape[0]
        img = jax.image.resize(img, (b, out_hw[0], out_hw[1]), method="linear")
    if colormap:
        rgb = _viridis(img)
    else:
        rgb = jnp.repeat(img[..., None], 3, axis=-1)
    return rgb.astype(jnp.float32)


# 16-stop viridis control points; linear interp on device
_VIRIDIS = np.array(
    [
        [0.267, 0.005, 0.329], [0.283, 0.100, 0.422], [0.277, 0.185, 0.490], [0.254, 0.265, 0.530],
        [0.222, 0.339, 0.549], [0.191, 0.407, 0.556], [0.164, 0.471, 0.558], [0.139, 0.534, 0.555],
        [0.121, 0.596, 0.544], [0.135, 0.659, 0.518], [0.208, 0.719, 0.473], [0.328, 0.774, 0.407],
        [0.478, 0.821, 0.318], [0.647, 0.858, 0.210], [0.825, 0.885, 0.106], [0.993, 0.906, 0.144],
    ],
    np.float32,
)


def _viridis(x: jnp.ndarray) -> jnp.ndarray:
    """Map [0,1] scalar field -> RGB via piecewise-linear viridis."""
    stops = jnp.asarray(_VIRIDIS)
    n = stops.shape[0] - 1
    xi = jnp.clip(x, 0.0, 1.0) * n
    lo = jnp.floor(xi).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, n)
    t = (xi - lo)[..., None]
    return stops[lo] * (1 - t) + stops[hi] * t


def spectrogram_numpy(iq: np.ndarray, n_fft: int = 512, hop: int = 256) -> np.ndarray:
    """Host mirror of the device pipeline (used by the synthetic dataset
    generator and as a numerics cross-check in tests). (N,) complex -> (F, T)."""
    n = len(iq)
    frames = 1 + (n - n_fft) // hop
    idx = np.arange(frames)[:, None] * hop + np.arange(n_fft)[None, :]
    win = np.hanning(n_fft).astype(np.float32)
    spec = np.fft.fft(iq[idx] * win, axis=-1)
    power = np.log10(np.abs(spec) ** 2 + 1e-10)
    power = np.fft.fftshift(power, axes=-1)
    img = power.T
    img = (img - img.min()) / (img.max() - img.min() + 1e-6)
    return img.astype(np.float32)
