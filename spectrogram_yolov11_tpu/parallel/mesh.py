"""Device mesh + sharding helpers (SPMD data parallelism).

The TPU-native replacement for the reference's DDP machinery
(engine/trainer.py:184-228 subprocess fork + NCCL process group + gradient
allreduce; SURVEY 2.12): one process, one jitted train step over a
Mesh(('data',)). Batches are sharded on the leading axis, state is
replicated; XLA inserts the gradient psum over ICI automatically — there is
no explicit collective in user code, no launcher, no rendezvous.

Multi-host (multi-slice) extension: jax.distributed.initialize() +
per-host input sharding via make_array_from_process_local_data — the mesh
abstraction below is already global-device-ordered for that case.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def select_devices(spec: Any) -> Optional[list]:
    """cfg `device:` -> device subset (reference select_device semantics,
    torch_utils.py:129, re-read for SPMD: indices pick mesh members instead of
    a CUDA ordinal). None/''/'auto' -> all devices (returns None); 'cpu'/'tpu'
    -> all devices of that platform; 0 / '0' / '0,1' / [0, 1] / 'tpu:1' ->
    devices at those indices."""
    if spec is None or spec == "" or spec == "auto":
        return None
    devs = jax.devices()
    if isinstance(spec, str):
        s = spec.strip().lower()
        if s in ("auto", ""):
            return None
        if ":" in s:  # 'tpu:1'
            s = s.split(":", 1)[1]
        elif not s.replace(",", "").replace(" ", "").isdigit():
            plat = [d for d in devs if d.platform == s]
            if not plat:
                raise ValueError(f"device='{spec}': no {s} devices in {devs}")
            return plat
        spec = [int(x) for x in s.split(",") if x.strip() != ""]
    if isinstance(spec, int):
        spec = [spec]
    try:
        return [devs[int(i)] for i in spec]
    except IndexError:
        raise ValueError(f"device={spec!r} out of range: {len(devs)} device(s) visible") from None


def get_mesh(devices: Optional[list] = None, axis_name: str = "data", batch_size: Optional[int] = None) -> Mesh:
    """Data mesh over all devices; if batch_size is given, restrict to the
    largest device count that divides it (small-batch debugging runs)."""
    devices = list(devices if devices is not None else jax.devices())
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n != 0:
            n -= 1
        devices = devices[:n]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put each batch array sharded along axis 0 ('data').

    Multi-host: each process holds only its local slice of the global batch
    (the DataLoader shards the index space by process); the global array is
    assembled with make_array_from_process_local_data — the TPU-native
    equivalent of DistributedSampler + per-rank batches (reference
    data/build.py:139-158)."""
    sh = batch_sharded(mesh)
    if jax.process_count() > 1:
        out = {}
        for k, v in batch.items():
            if getattr(v, "ndim", 0) >= 1:
                gshape = (v.shape[0] * jax.process_count(), *v.shape[1:])
                out[k] = jax.make_array_from_process_local_data(sh, np.asarray(v), gshape)
            else:
                out[k] = v
        return out
    return {k: jax.device_put(v, sh) if getattr(v, "ndim", 0) >= 1 else v for k, v in batch.items()}


def replicate_state(state: Any, mesh: Mesh) -> Any:
    return jax.device_put(state, replicated(mesh))


def get_mesh_2d(devices: Optional[list] = None, model_parallel: int = 1,
                axis_names: tuple = ("data", "model")) -> Mesh:
    """2-D data × model mesh. The model axis is the fast (inner) dimension so
    model-parallel collectives ride neighboring ICI links; data-parallel
    gradient psums cross the slower outer dimension once per step."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def _model_spec_for(shape: tuple, mp: int, min_dim: int) -> P:
    """PartitionSpec sharding the LAST dim divisible by the model-axis size
    and >= min_dim (conv kernels' C_out / linear out-features — the weight
    dims that grow with model scale); fully replicated otherwise."""
    for i in range(len(shape) - 1, -1, -1):
        if shape[i] >= min_dim and shape[i] % mp == 0:
            return P(*([None] * i), "model")
    return P()


def shard_state_over_model_axis(state: Any, mesh: Mesh, min_dim: int = 256) -> Any:
    """Weight-sharded (FSDP/TP-style) placement over a 2-D data×model mesh.

    Every array leaf whose trailing channel dim is large enough is partitioned
    over the 'model' axis; small leaves (biases, BN stats, scalars) replicate.
    Under jit, XLA GSPMD propagates these shardings through the whole train
    step and inserts the all-gathers / reduce-scatters itself — the per-leaf
    spec here is the ONLY parallelism annotation needed. The reference has no
    counterpart (DDP replicates everything); this is what lets a model larger
    than one chip's HBM train/serve on a slice."""
    mp = mesh.shape["model"]

    def put(x):
        if getattr(x, "ndim", 0) == 0 or not hasattr(x, "shape"):
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, _model_spec_for(x.shape, mp, min_dim)))

    return jax.tree_util.tree_map(put, state)


def pad_batch_to_devices(batch: dict, n_devices: int) -> dict:
    """Pad the batch dim to a multiple of the mesh size (tail val batches)."""
    b = batch["img"].shape[0]
    rem = (-b) % n_devices
    if rem == 0:
        return batch
    out = {}
    for k, v in batch.items():
        if getattr(v, "ndim", 0) >= 1 and v.shape[0] == b:
            pad = [(0, rem)] + [(0, 0)] * (v.ndim - 1)
            out[k] = np.pad(v, pad)
        else:
            out[k] = v
    return out
