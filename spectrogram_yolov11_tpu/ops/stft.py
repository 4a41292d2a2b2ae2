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


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "out_hw", "colormap", "eps"))
def iq_to_spectrogram(
    iq: jnp.ndarray,  # (B, N) complex64 or (B, N, 2) float
    n_fft: int = 512,
    hop: int = 256,
    out_hw: Optional[Tuple[int, int]] = (640, 640),
    colormap: bool = False,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Raw IQ -> (B, H, W, 3) float32 image in [0, 1].

    Axis convention (matches typical waterfall rendering and our synthetic
    dataset): rows = frequency (fftshifted, low->high), cols = time frames.
    """
    if iq.ndim == 3:
        iq = jax.lax.complex(iq[..., 0], iq[..., 1])
    frames = frame_signal(iq, n_fft, hop)  # (B, T, F)
    win = jnp.hanning(n_fft).astype(jnp.float32)
    spec = jnp.fft.fft(frames * win, axis=-1)
    power = jnp.log10(jnp.abs(spec) ** 2 + eps)  # (B, T, F)
    power = jnp.fft.fftshift(power, axes=-1)
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
        [0.267, 0.005, 0.329], [0.283, 0.131, 0.449], [0.262, 0.242, 0.521], [0.220, 0.343, 0.549],
        [0.177, 0.438, 0.558], [0.143, 0.523, 0.556], [0.120, 0.607, 0.540], [0.166, 0.691, 0.497],
        [0.320, 0.771, 0.411], [0.526, 0.833, 0.288], [0.762, 0.876, 0.137], [0.993, 0.906, 0.144],
        [0.993, 0.906, 0.144], [0.993, 0.906, 0.144], [0.993, 0.906, 0.144], [0.993, 0.906, 0.144],
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
