"""Trainer: functional SPMD training loop.

Counterpart of the reference BaseTrainer/DetectionTrainer
(/root/reference/ultralytics/engine/trainer.py:58, _do_train:318;
models/yolo/detect/train.py:19) redesigned TPU-first:

- ONE jitted train step: normalize -> forward (mutable BN) -> TAL+loss ->
  grad -> grad-accumulation buffer -> (every `accumulate` iters) clipped
  SGD/AdamW update + EMA — all inside the same XLA program; the Python loop
  only feeds batches and reads scalars.
- data parallelism = batch sharded over Mesh(('data',)); XLA inserts the
  gradient allreduce (no DDP fork/NCCL, reference trainer.py:184-228).
- bf16 compute is the AMP equivalent (no GradScaler needed on TPU).
- EMA (decay ramp 0.9999*(1-exp(-t/2000)), torch_utils.py:495), warmup
  (trainer.py:364), early stopping (torch_utils.py:713), close_mosaic
  (trainer.py:337), checkpoint schema (trainer.py:512) all reproduced.

Known deviations (documented): multi_scale (detect task) draws from the static ladder
{0.5, 0.75, 1.0, 1.25, 1.5} x imgsz snapped to /32 — one XLA program per size —
instead of the reference's any-multiple-of-32 uniform draw (train.py:19
preprocess_batch), which would compile tens of programs for no accuracy gain.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectrogram_yolov11_tpu.cfg import get_cfg, get_save_dir
from spectrogram_yolov11_tpu.data import DataLoader, YOLODataset, check_det_dataset
from spectrogram_yolov11_tpu.engine.checkpoint import load_checkpoint, save_checkpoint, strip_optimizer
from spectrogram_yolov11_tpu.engine.optim import (
    apply_updates_flat,
    choose_optimizer,
    ema_decay,
    ema_update,
    flat_opt_state,
    flatten_tree,
    init_opt_state_flat,
    make_flat_spec,
    param_groups,
    unflatten_tree,
)
from spectrogram_yolov11_tpu.engine.validator import DetectionValidator
from spectrogram_yolov11_tpu.nn.tasks import build_model
from spectrogram_yolov11_tpu.ops.losses import detection_loss
from spectrogram_yolov11_tpu.parallel.mesh import get_mesh, replicate_state, shard_batch
from spectrogram_yolov11_tpu.utils import DEFAULT_CFG, LOGGER, TQDM, colorstr, init_seeds
from spectrogram_yolov11_tpu.utils.callbacks import default_callbacks, run_callbacks


def _intersect_variables(new: dict, old: dict) -> dict:
    """Copy every leaf from `old` whose path AND shape match into `new`
    (reference torch_utils.py:454 intersect_dicts): transfers backbone/neck
    weights across an nc-rebuild while freshly-initialized head branches keep
    their new shapes."""
    import jax

    flat_old = {tuple(str(k.key) for k in path): leaf
                for path, leaf in jax.tree_util.tree_flatten_with_path(old)[0]}

    def graft(path, leaf):
        key = tuple(str(k.key) for k in path)
        o = flat_old.get(key)
        return o if o is not None and getattr(o, "shape", None) == leaf.shape else leaf

    return jax.tree_util.tree_map_with_path(graft, new)


def batch_images(batch, separable: bool = False) -> jnp.ndarray:
    """Normalized (B, S, S, 3) f32 images for the jitted step.

    Host-augmented batches carry uint8 "img"; device-augment batches
    (cfg device_augment=True) carry mosaic tiles + warp params instead and
    the image is assembled ON the TPU here — the augmentation fuses into
    the training program (ops/device_augment.py). `separable` is the static
    warp-structure flag (True when degrees = shear = perspective = 0,
    see BaseTrainer._aug_separable) selecting the TPU-fast sampler."""
    if "img" in batch:
        return batch["img"].astype(jnp.float32) / 255.0
    from spectrogram_yolov11_tpu.ops.device_augment import augment_batch

    img = augment_batch(batch["aug_src"], batch["aug_regions"], batch["aug_pads"],
                        batch["aug_inv"], batch["aug_hsv"], separable=separable)
    return img / 255.0


def batch_imgsz(batch) -> int:
    """Static square image size of a train batch (either augmentation mode)."""
    return batch["img"].shape[1] if "img" in batch else batch["aug_src"].shape[2]


def _resize_uint8_batch(imgs: np.ndarray, size: int) -> np.ndarray:
    """Host-side bilinear resize of a (B, S, S, 3) uint8 batch to (B, size, size, 3).

    Multi-scale counterpart of the reference's on-GPU F.interpolate
    (models/yolo/detect/train.py:19 preprocess_batch); labels are normalized
    xywh so only the pixels move."""
    import cv2

    out = np.empty((imgs.shape[0], size, size, imgs.shape[3]), np.uint8)
    for i, im in enumerate(imgs):
        cv2.resize(im, (size, size), dst=out[i], interpolation=cv2.INTER_LINEAR)
    return out


class EarlyStopping:
    """Patience on fitness (reference: torch_utils.py:713)."""

    def __init__(self, patience: int = 100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: Optional[float]) -> bool:
        if fitness is None:
            return False
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        stop = (epoch - self.best_epoch) >= self.patience
        if stop:
            LOGGER.info(f"EarlyStopping: no improvement in last {self.patience} epochs; stopping at epoch {epoch}.")
        return stop


class BaseTrainer:
    """Detection trainer (task subclasses override loss/validator wiring)."""

    task = "detect"
    # batch keys shipped to the device program (subclasses may extend)
    train_batch_keys = frozenset({
        "img", "cls", "bboxes", "mask_gt", "masks", "keypoints",
        # device-augment mode (ops/device_augment.py): mosaic tiles + warp
        # params replace "img"; the image is assembled on-TPU inside the step
        "aug_src", "aug_regions", "aug_pads", "aug_inv", "aug_hsv",
    })

    def __init__(self, cfg=DEFAULT_CFG, overrides: Optional[dict] = None, model=None, variables=None):
        self.args = get_cfg(cfg, overrides or {})
        # static warp structure for device_augment (ops/device_augment.py):
        # axis-aligned (separable, TPU-fast) iff degrees/shear/perspective are 0
        self._aug_separable = not (
            float(getattr(self.args, "degrees", 0) or 0)
            or float(getattr(self.args, "shear", 0) or 0)
            or float(getattr(self.args, "perspective", 0) or 0)
        )
        self.callbacks = default_callbacks()
        init_seeds(self.args.seed)
        self.save_dir = get_save_dir(self.args)
        self.wdir = self.save_dir / "weights"
        self.last, self.best = self.wdir / "last.ckpt", self.wdir / "best.ckpt"
        self.batch_size = 16 if self.args.batch in (-1, None) else int(self.args.batch)
        self.epochs = int(self.args.epochs)
        self.imgsz = int(self.args.imgsz if isinstance(self.args.imgsz, int) else self.args.imgsz[0])
        self.data = check_det_dataset(self.args.data)
        self.model = model
        self.variables = variables
        self.start_epoch = 0
        self.best_fitness = 0.0
        self.metrics: Dict[str, float] = {}
        self.csv = self.save_dir / "results.csv"

    # -- model/dataset wiring ---------------------------------------------
    @property
    def compute_dtype(self):
        """bf16 mixed precision (reference AMP, trainer.py:264-273): amp=True
        selects bfloat16 compute while flax keeps params/EMA/optimizer f32
        (SURVEY §7.7) — no grad scaler needed on TPU."""
        return jnp.bfloat16 if getattr(self.args, "amp", True) else None

    def setup_model(self):
        if self.model is not None:
            # facade-built models arrive at whatever dtype predict used;
            # retrace the graph at the training precision (params unchanged)
            self.model.set_dtype(self.compute_dtype)
        if (
            self.model is not None
            and self.task == "pose"
            and self.data.get("kpt_shape")
            and tuple(getattr(self.model, "kpt_shape", ())) != tuple(self.data["kpt_shape"])
        ):
            LOGGER.info(f"Rebuilding pose head for dataset kpt_shape={self.data['kpt_shape']}")
            self.model = None
            self.variables = None
        if self.model is not None and getattr(self.model, "nc", None) != self.data["nc"]:
            # a facade-built model whose head doesn't match the dataset: rebuild
            # with the data's nc and graft every shape-compatible leaf across
            # (reference trainer get_model + intersect_dicts semantics) —
            # without this the loss silently trains the wrong class count
            LOGGER.info(f"Overriding model nc={self.model.nc} with dataset nc={self.data['nc']}")
            old_vars = self.variables
            cfg = {k: v for k, v in self.model.yaml.items() if k != "yaml_file"}
            self.model = build_model(cfg, nc=self.data["nc"], verbose=False, task=self.task,
                                     dtype=self.compute_dtype)
            self.variables = self.model.init(jax.random.PRNGKey(self.args.seed), imgsz=64)
            if old_vars is not None:
                self.variables = _intersect_variables(self.variables, old_vars)
        if self.model is None:
            cfg = str(self.args.model or "yolo11n.yaml")
            if self.task == "pose" and self.data.get("kpt_shape"):
                from spectrogram_yolov11_tpu.nn.tasks import yaml_model_load

                d = yaml_model_load(cfg)
                d["kpt_shape"] = list(self.data["kpt_shape"])
                cfg = d
            self.model = build_model(cfg, nc=self.data["nc"], verbose=False, task=self.task,
                                     dtype=self.compute_dtype)
        self.model.names = self.data["names"]
        if self.variables is None:
            self.variables = self.model.init(jax.random.PRNGKey(self.args.seed), imgsz=64)

    def _resolve_device_augment(self) -> bool:
        """device_augment=auto -> on iff the warp is separable (degrees/shear/
        perspective all 0 — the reference's default hyps) and multi_scale is
        off; the dataset still falls back cleanly if mixup/copy_paste/
        albumentations force host mode (data/augment.py)."""
        da = getattr(self.args, "device_augment", False)
        if isinstance(da, str) and da.lower() == "auto":
            h = self.args
            separable = not (float(h.degrees or 0) or float(h.shear or 0) or float(h.perspective or 0))
            da = separable and not bool(getattr(h, "multi_scale", False))
            if da:
                LOGGER.info("device_augment=auto -> on (separable warp); image augmentation runs on-device in the train step")
        return bool(da)

    def build_dataset(self, split: str, augment: bool) -> YOLODataset:
        return YOLODataset(
            self.data[split],
            imgsz=self.imgsz,
            augment=augment,
            device_augment=self._resolve_device_augment() and augment and split == "train",
            hyp=self.args,
            nc=self.data["nc"],
            max_gt=0,  # auto-sized from the dataset's labels (dataset.py)
            single_cls=self.args.single_cls,
            fraction=self.args.fraction if split == "train" else 1.0,
            cache=self.args.cache,
            task=self.task,
            kpt_shape=self.data.get("kpt_shape", (17, 3)),
            flip_idx=self.data.get("flip_idx"),
            mask_ratio=int(self.args.mask_ratio),
        )

    # -- task hook: forward + criterion over one batch dict ------------------
    def compute_loss(self, feats, batch):
        """Task criterion over raw head output (overridden per task)."""
        kw = dict(
            # imgsz from the (static) batch shape, not self.imgsz: multi-scale
            # batches arrive at ladder sizes and each size is its own program
            nc=self.data["nc"], imgsz=batch_imgsz(batch),
            strides=tuple(float(s) for s in self.model.stride),
            hyp_box=float(self.args.box), hyp_cls=float(self.args.cls), hyp_dfl=float(self.args.dfl),
        )
        if isinstance(feats, dict):  # end2end (v10) head: dual one2many/one2one
            from spectrogram_yolov11_tpu.ops.losses import e2e_detection_loss

            return e2e_detection_loss(feats, batch["cls"], batch["bboxes"], batch["mask_gt"], **kw)
        return detection_loss(feats, batch["cls"], batch["bboxes"], batch["mask_gt"], **kw)

    @property
    def loss_names(self):
        return ["box_loss", "cls_loss", "dfl_loss"]

    # -- task hook: training forward (overridable, e.g. RT-DETR dn queries) --
    def forward_train(self, params, batch_stats, batch, ni):
        """Forward in train mode; returns (head_output, new_batch_stats)."""
        x = batch_images(batch, self._aug_separable)
        out, mut = self.model.graph.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True, mutable=["batch_stats"]
        )
        return out, mut["batch_stats"]

    # -- jitted step --------------------------------------------------------
    def _make_train_step(self, opt_cfg, groups, wd_scaled: float):
        compute_loss = self.compute_loss
        forward_train = self.forward_train

        def loss_fn(params, batch_stats, batch, ni):
            out, new_bs = forward_train(params, batch_stats, batch, ni)
            total, items = compute_loss(out, batch)
            return total, (items, new_bs)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        spec = make_flat_spec(self.variables["params"], groups)

        def train_step(state, batch, ni, do_step):
            # do_step is computed on host per-iteration (warmup-ramped
            # accumulate, reference trainer.py:368,391) and passed as a traced
            # scalar so the ramp changes no graph shapes.
            (loss, (items, new_bs)), grads = grad_fn(state["params"], state["batch_stats"], batch, ni)
            # grad accumulation + optimizer run on FLAT vectors: the per-leaf
            # tree_map form costs ~3 tiny kernels per leaf (~0.29 ms/img of a
            # 0.97 ms/img bs128 step, round-5 A/B in engine/optim.py); flat
            # packing turns it into a few large fused kernels
            buf = state["grad_buf"] + flatten_tree(grads)

            def apply_branch(operand):
                params, opt_state, buf, ema, ema_updates = operand
                new_p_flat, new_opt = apply_updates_flat(
                    flatten_tree(params), buf, opt_state, opt_cfg, spec, wd_scaled, lr_step=ni
                )
                new_params = unflatten_tree(new_p_flat, spec)
                upd = ema_updates + 1
                d = ema_decay(upd)
                new_ema = {
                    "params": ema_update(ema["params"], new_params, d),
                    "batch_stats": ema_update(ema["batch_stats"], new_bs, d),
                }
                return new_params, new_opt, jnp.zeros_like(buf), new_ema, upd

            def skip_branch(operand):
                params, opt_state, buf, ema, ema_updates = operand
                return params, opt_state, buf, ema, ema_updates

            new_params, new_opt, new_buf, new_ema, new_upd = jax.lax.cond(
                do_step, apply_branch, skip_branch,
                (state["params"], state["opt"], buf, state["ema"], state["ema_updates"]),
            )
            new_state = {
                "params": new_params,
                "batch_stats": new_bs,
                "opt": new_opt,
                "grad_buf": new_buf,
                "ema": new_ema,
                "ema_updates": new_upd,
            }
            return new_state, loss, items

        return jax.jit(train_step, donate_argnums=(0,))

    # -- the loop ------------------------------------------------------------
    def train(self) -> Dict[str, float]:
        self.setup_model()
        if self.args.resume:
            self._resume()
        if self.args.batch in (-1, None):
            # AutoBatch: XLA memory_analysis-driven batch-size search
            # (reference autobatch.py:38 targets 60% of device memory)
            from spectrogram_yolov11_tpu.utils.autobatch import check_train_batch_size

            self.batch_size = check_train_batch_size(self.model, imgsz=self.imgsz, nc=self.data["nc"])
            LOGGER.info(f"{colorstr('AutoBatch:')} using batch={self.batch_size}")
        (self.wdir).mkdir(parents=True, exist_ok=True)
        train_ds = self.build_dataset("train", augment=True)
        if self.args.close_mosaic and self.start_epoch > max(self.epochs - self.args.close_mosaic, 0):
            # resumed past the close_mosaic boundary (reference trainer.py:750-756)
            LOGGER.info("Closing dataloader mosaic (resumed past close_mosaic boundary)")
            train_ds.close_mosaic()
        # multi-host: each process loads 1/Nth of every global batch; the
        # global array is assembled in shard_batch (reference DDP equivalent:
        # DistributedSampler + per-rank batch split, trainer.py:285)
        n_proc, proc_id = jax.process_count(), jax.process_index()
        if self.batch_size % n_proc:
            raise ValueError(f"batch={self.batch_size} must be divisible by process_count={n_proc}")
        loader = DataLoader(
            train_ds, self.batch_size // n_proc, shuffle=True, seed=self.args.seed,
            workers=self.args.workers, drop_last=True,
            process_index=proc_id, process_count=n_proc,
        )
        nb = len(loader)
        if nb == 0:
            raise ValueError(f"training set too small for batch={self.batch_size}")
        accumulate = max(round(self.args.nbs / self.batch_size), 1)
        wd_scaled = float(self.args.weight_decay) * self.batch_size * accumulate / self.args.nbs
        opt_cfg = choose_optimizer(self.args, self.data["nc"], nb)
        LOGGER.info(
            f"{colorstr('optimizer:')} {opt_cfg.kind} lr0={opt_cfg.lr0} momentum={opt_cfg.momentum} "
            f"wd={wd_scaled:.6f} accumulate={accumulate} warmup_iters={opt_cfg.warmup_iters}"
        )
        groups = param_groups(self.variables["params"])

        from spectrogram_yolov11_tpu.parallel.mesh import select_devices

        mesh = get_mesh(devices=select_devices(self.args.device), batch_size=self.batch_size)
        resumed = getattr(self, "_resumed", None) or {}
        spec0 = make_flat_spec(self.variables["params"], groups)
        opt0 = init_opt_state_flat(spec0)
        if resumed.get("opt_state") is not None:
            r = resumed["opt_state"]  # saved as the OptState NamedTuple's dict
            opt0 = type(opt0)(**{k: jax.tree_util.tree_map(jnp.asarray, r[k]) for k in opt0._fields})
            # round-4-era checkpoints carry tree-form mu/nu; migrate to flat
            opt0 = flat_opt_state(opt0, spec0)
        ema0 = resumed.get("ema")
        if ema0 is None:
            # NB: explicit copy — astype(f32) on f32 aliases the buffer, and
            # aliased leaves break donate_argnums ("donate the same buffer twice")
            ema0 = {
                "params": jax.tree_util.tree_map(lambda x: jnp.array(x, jnp.float32, copy=True), self.variables["params"]),
                "batch_stats": jax.tree_util.tree_map(lambda x: jnp.array(x, jnp.float32, copy=True), self.variables["batch_stats"]),
            }
        state = {
            "params": self.variables["params"],
            "batch_stats": self.variables["batch_stats"],
            "opt": opt0,
            "grad_buf": jnp.zeros((spec0.n,), jnp.float32),
            "ema": ema0,
            "ema_updates": jnp.asarray(resumed.get("updates", 0), jnp.int32),
        }
        state = replicate_state(state, mesh)
        step_fn = self._make_train_step(opt_cfg, groups, wd_scaled)

        stopper = EarlyStopping(self.args.patience)
        if self.args.profile:
            # TPU equivalent of the reference's profiling hooks (SURVEY §5):
            # an xplane trace viewable in TensorBoard / xprof
            trace_dir = str(self.save_dir / "profile")
            LOGGER.info(f"jax.profiler trace -> {trace_dir}")
            jax.profiler.start_trace(trace_dir)
        run_callbacks(self.callbacks, "on_train_start", self)
        ms_sizes, ms_rng = None, None
        if self.args.multi_scale and getattr(train_ds, "augment", False) and \
                getattr(getattr(train_ds, "transform", None), "device_mode", False):
            LOGGER.warning("multi_scale is not supported with device_augment; ignoring multi_scale")
        elif self.args.multi_scale and self.task == "detect":
            ms_sizes = sorted({max(32, int(round(self.imgsz * f / 32)) * 32) for f in (0.5, 0.75, 1.0, 1.25, 1.5)})
            ms_rng = np.random.default_rng(self.args.seed + 1234)
            LOGGER.info(f"Multi-scale training over {ms_sizes} (one XLA program per size)")
        t_start = time.time()
        stop = False
        last_opt_step = -1
        LOGGER.info(
            f"Starting training for {self.epochs} epochs on {len(mesh.devices.flat)} device(s): "
            f"{nb} iters/epoch, batch {self.batch_size}, imgsz {self.imgsz}"
        )
        for epoch in range(self.start_epoch, self.epochs):
            self.epoch = epoch
            run_callbacks(self.callbacks, "on_train_epoch_start", self)
            if epoch == max(self.epochs - self.args.close_mosaic, 0) and self.args.close_mosaic:
                LOGGER.info("Closing dataloader mosaic")
                train_ds.close_mosaic()
            loader.set_epoch(epoch)
            names = self.loss_names
            mloss = np.zeros(len(names))
            train_keys = self.train_batch_keys
            pbar = TQDM(enumerate(loader), total=nb, desc=f"epoch {epoch + 1}/{self.epochs}")
            for i, batch in pbar:
                ni = i + nb * epoch
                if self.args.plots and ni < 3:
                    self._plot_train_batch(batch, ni)
                if ms_sizes is not None:
                    sz = int(ms_rng.choice(ms_sizes))
                    if sz != batch["img"].shape[1]:
                        batch = {**batch, "img": _resize_uint8_batch(batch["img"], sz)}
                batch_dev = shard_batch({k: v for k, v in batch.items() if k in train_keys}, mesh)
                # warmup-ramped accumulate 1 -> nbs/batch (reference
                # trainer.py:366-368): more optimizer steps early in training
                acc = accumulate
                if opt_cfg.warmup_iters > 0 and ni <= opt_cfg.warmup_iters:
                    acc = max(1, int(np.interp(
                        ni, [0, opt_cfg.warmup_iters], [1, self.args.nbs / self.batch_size]).round()))
                do_step = ni - last_opt_step >= acc
                if do_step:
                    last_opt_step = ni
                state, loss, items = step_fn(
                    state, batch_dev, jnp.asarray(ni, jnp.int32), jnp.asarray(do_step))
                mloss = (mloss * i + np.asarray(items)) / (i + 1)
                if hasattr(pbar, "set_postfix"):
                    pbar.set_postfix(**{n.split("_")[0]: f"{v:.3f}" for n, v in zip(names, mloss)})
                run_callbacks(self.callbacks, "on_train_batch_end", self)
            self.label_loss = {f"train/{n}": v for n, v in zip(names, mloss)}

            # -- validation with EMA weights (reference validator.py:118);
            # multi-host: host 0 validates (reference rank-0-only val,
            # trainer.py:287-297) and the fitness broadcasts so every host
            # takes the same early-stop decision (reference stop-flag
            # broadcast, trainer.py:457-460)
            fitness = None
            if self.args.val or epoch == self.epochs - 1:
                if proc_id == 0:
                    ema_vars = {"params": state["ema"]["params"], "batch_stats": state["ema"]["batch_stats"]}
                    if n_proc > 1:  # pull fully-replicated globals to local host arrays
                        ema_vars = jax.tree_util.tree_map(np.asarray, ema_vars)
                    self.metrics = self.validate(ema_vars)
                    fitness = self.metrics.get("fitness", 0.0)
                if n_proc > 1:
                    from jax.experimental import multihost_utils

                    fitness = float(multihost_utils.broadcast_one_to_all(
                        jnp.asarray(fitness if proc_id == 0 else 0.0, jnp.float32)))
                if fitness is not None and fitness >= self.best_fitness:
                    self.best_fitness = fitness
            if proc_id == 0:
                self._write_csv(epoch, mloss, self.metrics)
                run_callbacks(self.callbacks, "on_fit_epoch_end", self)

            # -- checkpoints (host 0 only; state is fully replicated) --
            if self.args.save and proc_id == 0:
                self._save_ckpt(state, epoch, fitness)
            stop = stopper(epoch, fitness)
            if self.args.time and (time.time() - t_start) / 3600 > self.args.time:
                LOGGER.info("Time budget reached; stopping.")
                stop = True
            if stop:
                break

        if self.args.profile:
            jax.profiler.stop_trace()
        if self.args.plots:
            # training-artifact plots (reference plotting.py:1176 plot_results)
            try:
                from spectrogram_yolov11_tpu.utils.plotting import plot_results

                if self.csv.exists():
                    plot_results(self.csv, self.save_dir)
            except Exception as e:
                LOGGER.warning(f"plot_results failed: {e}")
        # finalize: best.ckpt EMA-only (reference final_eval + strip_optimizer)
        if self.args.save and self.best.exists():
            strip_optimizer(self.best)
        seconds = time.time() - t_start
        LOGGER.info(f"Training complete in {seconds / 3600:.3f} hours.")
        run_callbacks(self.callbacks, "on_train_end", self)
        # leave final weights on the model for chained .val()/.predict()
        self.variables = {"params": state["ema"]["params"], "batch_stats": state["ema"]["batch_stats"]}
        return self.metrics

    def get_validator(self, ema_vars):
        return DetectionValidator(
            self.model, ema_vars,
            overrides={"data": self.args.data, "imgsz": self.imgsz, "batch": self.batch_size,
                       "workers": self.args.workers, "plots": False, "single_cls": self.args.single_cls,
                       "mask_ratio": self.args.mask_ratio},
        )

    def validate(self, ema_vars) -> Dict[str, float]:
        # one validator for the whole run — rebuilding would re-jit every epoch
        if getattr(self, "_validator", None) is None:
            self._validator = self.get_validator(ema_vars)
        self._validator.variables = ema_vars
        return self._validator()

    def _save_ckpt(self, state, epoch: int, fitness: Optional[float]):
        from spectrogram_yolov11_tpu.engine.checkpoint import _to_numpy

        # pull the device state ONCE (batched async D2H) so last/best/period
        # saves don't each re-ship ~600 leaves over the dispatch path
        host = _to_numpy({
            "variables": {"params": state["params"], "batch_stats": state["batch_stats"]},
            "ema": state["ema"],
            "opt": state["opt"]._asdict() if hasattr(state["opt"], "_asdict") else state["opt"],
        })
        kw = dict(
            variables=host["variables"],
            ema_variables=host["ema"],
            opt_state=host["opt"],
            epoch=epoch,
            best_fitness=self.best_fitness,
            updates=int(state["ema_updates"]),
            train_args=vars(self.args),
            model_yaml={k: v for k, v in self.model.yaml.items() if k != "yaml_file"},
            names=self.model.names,
            nc=self.model.nc,
        )
        save_checkpoint(self.last, **kw)
        if fitness is not None and fitness >= self.best_fitness:
            save_checkpoint(self.best, **kw)
        if self.args.save_period > 0 and (epoch + 1) % self.args.save_period == 0:
            save_checkpoint(self.wdir / f"epoch{epoch}.ckpt", **kw)

    def _resume(self):
        path = self.last if self.last.exists() else Path(str(self.args.resume))
        if not path.exists() and str(self.args.resume).lower() in {"true", "1"}:
            # bare resume=True: pick up the newest run like the reference's
            # get_latest_run (check_resume, trainer.py:691-721)
            from spectrogram_yolov11_tpu.utils import get_latest_run

            latest = get_latest_run(Path(self.args.project) if self.args.project else None)
            if latest:
                path = Path(latest)
        if not path.exists():
            LOGGER.warning(f"resume checkpoint not found at {path}; training from scratch")
            return
        tree, meta = load_checkpoint(path)
        self.variables = tree["variables"]
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.best_fitness = float(meta.get("best_fitness", 0.0))
        # Full training-state continuity (reference trainer.py:723-748
        # resume_training restores optimizer + EMA + updates): stash the
        # optimizer moments, EMA tree, and EMA update counter so `train()`
        # seeds the jitted state with them instead of zeros.
        self._resumed = {
            "opt_state": tree.get("opt_state"),
            "ema": tree.get("ema"),
            "updates": int(meta.get("updates", 0)),
        }
        LOGGER.info(f"Resuming from {path} at epoch {self.start_epoch} (optimizer+EMA state restored)")

    def _plot_train_batch(self, batch: dict, ni: int) -> None:
        """Annotated train-batch mosaic (reference plotting.py:1008)."""
        try:
            from spectrogram_yolov11_tpu.utils.plotting import plot_images

            if "img" not in batch:  # device-augment: materialize the images once for the plot
                from spectrogram_yolov11_tpu.ops.device_augment import augment_batch

                img = np.asarray(augment_batch(batch["aug_src"], batch["aug_regions"], batch["aug_pads"],
                                               batch["aug_inv"], batch["aug_hsv"],
                                               separable=self._aug_separable)).astype(np.uint8)
                batch = {**batch, "img": img}
            plot_images(batch, self.model.names, self.save_dir / f"train_batch{ni}.jpg")
        except Exception as e:
            LOGGER.warning(f"train batch plot failed: {e}")

    def _write_csv(self, epoch: int, mloss, metrics: Dict[str, float]):
        import csv

        row = {"epoch": epoch, **{f"train/{n}": float(v) for n, v in zip(self.loss_names, mloss)},
               **{k: float(v) for k, v in metrics.items()}}
        write_header = not self.csv.exists()
        self.csv.parent.mkdir(parents=True, exist_ok=True)
        with open(self.csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            if write_header:
                w.writeheader()
            w.writerow(row)


class DetectionTrainer(BaseTrainer):
    task = "detect"


class SegmentationTrainer(BaseTrainer):
    """(reference: models/yolo/segment/train.py:11)"""

    task = "segment"

    def compute_loss(self, out, batch):
        from spectrogram_yolov11_tpu.ops.losses import segmentation_loss

        feats, mc, proto = out
        return segmentation_loss(
            feats, mc, proto, batch["cls"], batch["bboxes"], batch["mask_gt"], batch["masks"],
            nc=self.data["nc"], imgsz=self.imgsz, strides=tuple(float(s) for s in self.model.stride),
            hyp_box=float(self.args.box), hyp_cls=float(self.args.cls), hyp_dfl=float(self.args.dfl),
            overlap=bool(self.args.overlap_mask),
        )

    @property
    def loss_names(self):
        return ["box_loss", "seg_loss", "cls_loss", "dfl_loss"]

    def get_validator(self, ema_vars):
        from spectrogram_yolov11_tpu.engine.validator import SegmentationValidator

        return SegmentationValidator(
            self.model, ema_vars,
            overrides={"data": self.args.data, "imgsz": self.imgsz, "batch": self.batch_size,
                       "workers": self.args.workers, "plots": False, "mask_ratio": self.args.mask_ratio},
        )


class PoseTrainer(BaseTrainer):
    """(reference: models/yolo/pose/train.py:11)"""

    task = "pose"

    def compute_loss(self, out, batch):
        from spectrogram_yolov11_tpu.ops.losses import pose_loss

        feats, kpt_raw = out
        return pose_loss(
            feats, kpt_raw, batch["cls"], batch["bboxes"], batch["mask_gt"], batch["keypoints"],
            nc=self.data["nc"], kpt_shape=tuple(self.data.get("kpt_shape", (17, 3))),
            imgsz=self.imgsz, strides=tuple(float(s) for s in self.model.stride),
            hyp_box=float(self.args.box), hyp_cls=float(self.args.cls), hyp_dfl=float(self.args.dfl),
            hyp_pose=float(self.args.pose), hyp_kobj=float(self.args.kobj),
        )

    @property
    def loss_names(self):
        return ["box_loss", "pose_loss", "kobj_loss", "cls_loss", "dfl_loss"]

    def get_validator(self, ema_vars):
        from spectrogram_yolov11_tpu.engine.validator import PoseValidator

        return PoseValidator(
            self.model, ema_vars,
            overrides={"data": self.args.data, "imgsz": self.imgsz, "batch": self.batch_size,
                       "workers": self.args.workers, "plots": False},
        )


class OBBTrainer(BaseTrainer):
    """(reference: models/yolo/obb/train.py:10)"""

    task = "obb"

    def compute_loss(self, out, batch):
        from spectrogram_yolov11_tpu.ops.losses import obb_loss

        feats, angle_raw = out
        return obb_loss(
            feats, angle_raw, batch["cls"], batch["bboxes"], batch["mask_gt"],
            nc=self.data["nc"], imgsz=self.imgsz, strides=tuple(float(s) for s in self.model.stride),
            hyp_box=float(self.args.box), hyp_cls=float(self.args.cls), hyp_dfl=float(self.args.dfl),
        )

    def get_validator(self, ema_vars):
        from spectrogram_yolov11_tpu.engine.validator import OBBValidator

        return OBBValidator(
            self.model, ema_vars,
            overrides={"data": self.args.data, "imgsz": self.imgsz, "batch": self.batch_size,
                       "workers": self.args.workers, "plots": False},
        )


class WorldTrainer(BaseTrainer):
    """YOLO-World trainer (reference: models/yolo/world/train.py:24).

    The criterion is the standard v8 detection loss — the contrastive head
    already produced (4*reg_max + nc) logits per level. Text features come
    from the model's offline embedding stub (WorldModel.text_embeddings);
    the reference encodes dataset class names with CLIP per batch.
    """

    task = "world"

    def setup_model(self):
        super().setup_model()
        if self.data.get("names"):
            self.model.set_classes([self.data["names"][i] for i in sorted(self.data["names"])])

    def forward_train(self, params, batch_stats, batch, ni):
        x = batch_images(batch, self._aug_separable)
        out, mut = self.model.graph.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            txt_feats=self.model._txt(x.shape[0]), mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]


class GroundingTrainer(WorldTrainer):
    """Phrase-grounded world training over caption/token-span annotations
    (reference: models/yolo/world/train_world.py WorldTrainerFromScratch).

    Classes are per-image phrase slots: each batch ships per-image text
    embeddings (B, K, ct) to the contrastive head, and GT cls indexes the
    sample's own phrase list. Mosaic/mixup stay off (they would merge
    incompatible per-image phrase spaces — the reference's text-aware mix
    transforms are the remaining delta, documented here).

    Overrides: img_path=..., json_file=..., max_phrases=K (static slot count).
    """

    train_batch_keys = DetectionTrainer.train_batch_keys | {"txt_feats"}

    def __init__(self, cfg=DEFAULT_CFG, overrides: Optional[dict] = None, model=None, variables=None):
        overrides = dict(overrides or {})
        self.img_path = overrides.pop("img_path")
        self.json_file = overrides.pop("json_file")
        self.max_phrases = int(overrides.pop("max_phrases", 8))
        # phrase-slot mAP protocol (GroundingValidator) scores every epoch
        overrides.setdefault("val", True)
        overrides.setdefault("mosaic", 0.0)
        overrides["data"] = {
            "path": str(Path(self.img_path).parent),
            "train": str(self.img_path), "val": str(self.img_path),
            "names": {i: f"phrase_{i}" for i in range(self.max_phrases)},
        }
        super().__init__(cfg, overrides, model=model, variables=variables)

    def build_dataset(self, split: str, augment: bool):
        from spectrogram_yolov11_tpu.data.dataset import GroundingDataset

        return GroundingDataset(self.img_path, json_file=self.json_file, imgsz=self.imgsz,
                                nc=self.max_phrases, max_gt=128, embed_phrases=self.max_phrases)

    def get_validator(self, ema_vars):
        from spectrogram_yolov11_tpu.engine.validator import GroundingValidator

        return GroundingValidator(
            self.model, ema_vars, img_path=self.img_path, json_file=self.json_file,
            max_phrases=self.max_phrases,
            overrides={"imgsz": self.imgsz, "batch": self.batch_size,
                       "workers": self.args.workers, "plots": False},
        )

    def forward_train(self, params, batch_stats, batch, ni):
        x = batch_images(batch, self._aug_separable)
        out, mut = self.model.graph.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            txt_feats=batch["txt_feats"], mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]


TASK2TRAINER = {
    "detect": DetectionTrainer,
    "segment": SegmentationTrainer,
    "pose": PoseTrainer,
    "obb": OBBTrainer,
    "world": WorldTrainer,
}
