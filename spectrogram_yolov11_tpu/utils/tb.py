"""TensorBoard logger integration (reference: utils/callbacks/tensorboard.py).

Attached automatically by utils/callbacks._attach_integrations when a
SummaryWriter implementation is importable (torch's writer in this env;
tensorboardX elsewhere). Writes train losses, val metrics, and epoch to
`<save_dir>/` as TB event files readable by tensorboard/xprof.
"""

from __future__ import annotations

try:
    from torch.utils.tensorboard import SummaryWriter
except ImportError:  # pragma: no cover - alternative backend
    from tensorboardX import SummaryWriter  # noqa: F401

from spectrogram_yolov11_tpu.utils import LOGGER

_WRITER = None


def _scalars(trainer) -> dict:
    out = {}
    out.update(getattr(trainer, "label_loss", {}) or {})
    for k, v in (getattr(trainer, "metrics", {}) or {}).items():
        key = k if "/" in k else f"metrics/{k}"
        try:
            out[key] = float(v)
        except (TypeError, ValueError):
            pass
    return out


def on_train_start(trainer) -> None:
    global _WRITER
    try:
        _WRITER = SummaryWriter(str(trainer.save_dir))
        LOGGER.info(f"TensorBoard: logging to {trainer.save_dir} (tensorboard --logdir {trainer.save_dir})")
    except Exception as e:  # never let logging kill training
        _WRITER = None
        LOGGER.warning(f"TensorBoard init failed: {e}")


def on_fit_epoch_end(trainer) -> None:
    if _WRITER is None:
        return
    step = int(getattr(trainer, "epoch", 0)) + 1
    for k, v in _scalars(trainer).items():
        _WRITER.add_scalar(k, float(v), step)
    _WRITER.flush()


def on_train_end(trainer) -> None:
    global _WRITER
    if _WRITER is not None:
        _WRITER.close()
        _WRITER = None


callbacks = {
    "on_train_start": on_train_start,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
}
