"""Classification trainer (reference: models/yolo/classify/train.py:16).

Simple supervised CE loop sharing the optimizer/EMA machinery of the
detection trainer but over folder datasets."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from spectrogram_yolov11_tpu.cfg import get_cfg, get_save_dir
from spectrogram_yolov11_tpu.data.build import DataLoader
from spectrogram_yolov11_tpu.data.dataset import ClassificationDataset
from spectrogram_yolov11_tpu.engine.optim import (
    apply_updates, choose_optimizer, ema_decay, ema_update, init_opt_state, param_groups,
)
from spectrogram_yolov11_tpu.engine.validator import ClassificationValidator
from spectrogram_yolov11_tpu.nn.tasks import build_model
from spectrogram_yolov11_tpu.ops.losses import classification_loss
from spectrogram_yolov11_tpu.parallel.mesh import get_mesh, replicate_state, shard_batch
from spectrogram_yolov11_tpu.utils import DEFAULT_CFG, LOGGER, TQDM


class ClassificationTrainer:
    task = "classify"

    def __init__(self, cfg=DEFAULT_CFG, overrides: Optional[dict] = None, model=None, variables=None):
        self.args = get_cfg(cfg, overrides or {})
        self.imgsz = int(self.args.imgsz if isinstance(self.args.imgsz, int) else self.args.imgsz[0])
        if self.imgsz == 640:
            self.imgsz = 224  # classify default (reference task convention)
        self.batch_size = 16 if self.args.batch in (-1, None) else int(self.args.batch)
        self.epochs = int(self.args.epochs)
        self.model = model
        self.variables = variables
        self.save_dir = get_save_dir(self.args)

    def train(self) -> Dict[str, float]:
        root = Path(self.args.data)
        if (root / "train").exists():
            train_dir = root / "train"
        elif root.exists() and any(d.is_dir() for d in root.iterdir()):
            train_dir = root  # bare folder-per-class layout
        else:  # name under datasets_dir; synthesized when absent
            from spectrogram_yolov11_tpu.data.dataset import check_cls_dataset

            info = check_cls_dataset(self.args.data)
            root = Path(info["train"]).parent
            train_dir = Path(info["train"])
        ds = ClassificationDataset(train_dir, imgsz=self.imgsz, augment=True)
        nc = len(ds.names)
        if self.model is None:
            self.model = build_model(str(self.args.model or "yolo11n-cls.yaml"), nc=nc, verbose=False, task="classify")
            self.model.names = ds.names
        if self.variables is None:
            self.variables = self.model.init(jax.random.PRNGKey(self.args.seed), imgsz=self.imgsz)
        loader = DataLoader(ds, self.batch_size, shuffle=True, seed=self.args.seed, workers=self.args.workers)
        nb = len(loader)
        opt_cfg = choose_optimizer(self.args, nc, nb)
        groups = param_groups(self.variables["params"])
        wd = float(self.args.weight_decay)
        model = self.model

        def loss_fn(params, batch_stats, imgs, labels):
            logits, mut = model.graph.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs.astype(jnp.float32) / 255.0, train=True, mutable=["batch_stats"],
            )
            total, items = classification_loss(logits, labels)
            return total, (items, mut["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(state, imgs, labels, ni):
            (loss, (items, new_bs)), grads = grad_fn(state["params"], state["batch_stats"], imgs, labels)
            new_params, new_opt = apply_updates(state["params"], grads, state["opt"], opt_cfg, groups, wd, lr_step=ni)
            upd = state["ema_updates"] + 1
            d = ema_decay(upd)
            new_ema = {
                "params": ema_update(state["ema"]["params"], new_params, d),
                "batch_stats": ema_update(state["ema"]["batch_stats"], new_bs, d),
            }
            return {"params": new_params, "batch_stats": new_bs, "opt": new_opt, "ema": new_ema,
                    "ema_updates": upd}, loss

        jstep = jax.jit(step, donate_argnums=(0,))
        mesh = get_mesh(batch_size=self.batch_size)
        state = {
            "params": self.variables["params"],
            "batch_stats": self.variables["batch_stats"],
            "opt": init_opt_state(self.variables["params"]),
            "ema": {
                "params": jax.tree_util.tree_map(lambda x: jnp.array(x, jnp.float32, copy=True), self.variables["params"]),
                "batch_stats": jax.tree_util.tree_map(lambda x: jnp.array(x, jnp.float32, copy=True), self.variables["batch_stats"]),
            },
            "ema_updates": jnp.zeros((), jnp.int32),
        }
        state = replicate_state(state, mesh)
        self.metrics: Dict[str, float] = {}
        for epoch in range(self.epochs):
            loader.set_epoch(epoch)
            tot = 0.0
            for i, batch in enumerate(TQDM(loader, total=nb, desc=f"epoch {epoch + 1}/{self.epochs}")):
                b = shard_batch({"img": batch["img"], "cls": batch["cls"]}, mesh)
                state, loss = jstep(state, b["img"], b["cls"], jnp.asarray(i + nb * epoch, jnp.int32))
                tot += float(loss)
            LOGGER.info(f"epoch {epoch + 1}: loss {tot / max(nb, 1):.4f}")
            ema_vars = {"params": state["ema"]["params"], "batch_stats": state["ema"]["batch_stats"]}
            val = ClassificationValidator(self.model, ema_vars, overrides={"data": str(root), "imgsz": self.imgsz,
                                                                           "batch": self.batch_size})
            self.metrics = val()
        self.variables = {"params": state["ema"]["params"], "batch_stats": state["ema"]["batch_stats"]}
        return self.metrics
