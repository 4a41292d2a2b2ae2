"""AutoBatch: pick the largest train batch that fits device memory.

TPU-native redesign of the reference's CUDA-memory polyfit search
(utils/autobatch.py:38): instead of running probe forwards and fitting a
curve, we ask XLA's compile-time memory analysis for the exact peak HBM of
the jitted train step at candidate batch sizes — no device execution at all.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from spectrogram_yolov11_tpu.utils import LOGGER


def device_memory_bytes() -> int:
    d = jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    return 16 * 1024**3  # v5e default HBM


def estimate_step_memory(step_lowerable: Callable[[int], "jax.stages.Lowered"], batch: int) -> Optional[int]:
    """Peak HBM bytes of the compiled step at `batch`, via memory_analysis()."""
    try:
        compiled = step_lowerable(batch).compile()
        ma = compiled.memory_analysis()
        if ma is None:
            return None
        total = (
            getattr(ma, "temp_size_in_bytes", 0)
            + getattr(ma, "argument_size_in_bytes", 0)
            + getattr(ma, "output_size_in_bytes", 0)
        )
        return int(total) or None
    except Exception as e:  # lowering OOM-at-compile etc.
        LOGGER.warning(f"autobatch: probe at batch={batch} failed: {e}")
        return None


def autobatch(step_lowerable, fraction: float = 0.60, start: int = 16, max_batch: int = 256) -> int:
    """Largest power-of-two batch whose compiled step fits `fraction` of HBM
    (reference targets 60% CUDA memory, autobatch.py:14)."""
    limit = device_memory_bytes() * fraction
    best = start
    b = start
    while b <= max_batch:
        mem = estimate_step_memory(step_lowerable, b)
        if mem is None:
            break
        if mem > limit:
            break
        best = b
        b *= 2
    LOGGER.info(f"AutoBatch: selected batch={best} (target {fraction:.0%} of {device_memory_bytes() / 1e9:.1f} GB HBM)")
    return best


def check_train_batch_size(model, imgsz: int = 640, nc: int = 80, fraction: float = 0.60) -> int:
    """Convenience wrapper building a forward+backward lowerable for `model`."""
    from spectrogram_yolov11_tpu.ops.losses import detection_loss

    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    strides = tuple(float(s) for s in model.stride)

    def lower(batch: int):
        def loss_fn(params, bs, img, cls, boxes, mask):
            feats, mut = model.graph.apply({"params": params, "batch_stats": bs}, img, train=True,
                                           mutable=["batch_stats"])
            total, _ = detection_loss(feats, cls, boxes, mask, nc=nc, imgsz=imgsz, strides=strides)
            return total

        g = jax.grad(loss_fn)
        return jax.jit(g).lower(
            variables["params"], variables["batch_stats"],
            jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32),
            jnp.zeros((batch, 128), jnp.int32),
            jnp.zeros((batch, 128, 4), jnp.float32),
            jnp.zeros((batch, 128), bool),
        )

    return autobatch(lower, fraction=fraction)
