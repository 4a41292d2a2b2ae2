"""Fused-bottleneck pallas kernel (ops/pallas_fused_conv.py — the measured
negative result on VMEM-resident conv fusion) matches the XLA lowering in
interpret mode."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from spectrogram_yolov11_tpu.ops.pallas_fused_conv import fused_bottleneck, xla_bottleneck  # noqa: E402


def test_fused_bottleneck_matches_xla_interpret():
    rng = np.random.default_rng(0)
    c = 128
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, c)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32))
    ref = np.asarray(xla_bottleneck(x, w1, b1, w2, b2))
    got = np.asarray(fused_bottleneck(x, w1, b1, w2, b2, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)
