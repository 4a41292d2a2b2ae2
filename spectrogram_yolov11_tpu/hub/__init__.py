"""HUB client over a LOCAL filesystem registry (reference: ultralytics/hub/).

The reference talks to the Ultralytics HUB SaaS (auth, session heartbeats,
model up/download, export handoff — hub/__init__.py:26-133, session.py:19).
This build is zero-egress, so the same verb surface is implemented against a
local registry directory (`SETTINGS['hub_dir']`, default `<runs>/hub`):

- login/logout persist the API key in SettingsManager (auth.py:140 semantics,
  no network round-trip);
- HUBTrainingSession registers a model, records per-epoch metrics to
  `<registry>/<id>/metrics.jsonl` with heartbeat counters, and "uploads"
  checkpoints by copying them into the registry (session.py upload_model);
- export_model/get_export run the real local exporter and register the
  artifact; check_dataset validates a dataset yaml exactly like the
  reference's pre-upload check (hub/__init__.py:123).

A networked deployment can subclass and point the same verbs at a real API.
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path
from typing import Optional

from spectrogram_yolov11_tpu.utils import LOGGER, RUNS_DIR, SETTINGS

HUB_API_ROOT = "local"  # zero-egress build: the registry below replaces the SaaS
HUB_WEB_ROOT = "local"


def registry_dir() -> Path:
    """Root of the local model registry."""
    d = Path(SETTINGS.get("hub_dir", RUNS_DIR / "hub"))
    d.mkdir(parents=True, exist_ok=True)
    return d


class Auth:
    """API-key holder persisted via SettingsManager (reference hub/auth.py:140)."""

    def __init__(self, api_key: str = "", verbose: bool = False):
        self.api_key = api_key or SETTINGS.get("api_key", "")
        if verbose and not self.api_key:
            LOGGER.info("HUB: no API key configured.")

    def authenticate(self) -> bool:
        """Local registry needs no credentials; key presence == authenticated."""
        return bool(self.api_key)


def login(api_key: Optional[str] = None, save: bool = True) -> bool:
    """Store the key (reference hub/__init__.py:26; no network in this build)."""
    auth = Auth(api_key or "", verbose=False)
    if save and auth.api_key:
        SETTINGS.update(api_key=auth.api_key)
        SETTINGS.save()
    LOGGER.info(f"HUB login: registry at {registry_dir()}")
    return True


def logout() -> None:
    """Drop the stored key (reference hub/__init__.py:70)."""
    SETTINGS.update(api_key="")
    SETTINGS.save()
    LOGGER.info("HUB logout: api_key cleared.")


def reset_model(model_id: str = "") -> None:
    """Reset a registered model to untrained (reference hub/__init__.py:85)."""
    d = registry_dir() / model_id
    for f in ("best.ckpt", "last.ckpt", "metrics.jsonl"):
        (d / f).unlink(missing_ok=True)
    LOGGER.info(f"HUB: model '{model_id}' reset.")


def export_fmts_hub() -> list:
    """Formats the local exporter can produce (reference hub/__init__.py:94)."""
    from spectrogram_yolov11_tpu.engine.exporter import export_formats

    return [k for k, v in export_formats().items() if v.get("available")]


def export_model(model_id: str = "", format: str = "stablehlo") -> Path:
    """Run the real exporter on a registered checkpoint and register the
    artifact (reference hub/__init__.py:101 hands off to the SaaS)."""
    assert format in export_fmts_hub(), f"unsupported format {format!r}, options: {export_fmts_hub()}"
    d = registry_dir() / model_id
    ckpt = d / "best.ckpt"
    if not ckpt.exists():
        raise FileNotFoundError(f"no trained checkpoint registered for '{model_id}' at {ckpt}")
    from spectrogram_yolov11_tpu.engine.model import YOLO

    out = YOLO(str(ckpt)).export(format=format)
    dest = d / "exports" / Path(str(out)).name
    dest.parent.mkdir(parents=True, exist_ok=True)
    if Path(str(out)).is_dir():
        shutil.copytree(out, dest, dirs_exist_ok=True)
    else:
        shutil.copy2(out, dest)
    LOGGER.info(f"HUB: exported '{model_id}' ({format}) -> {dest}")
    return dest


def get_export(model_id: str = "", format: str = "stablehlo") -> dict:
    """Return the registered export artifact (reference hub/__init__.py:111)."""
    d = registry_dir() / model_id / "exports"
    hits = sorted(d.glob("*")) if d.exists() else []
    return {"success": bool(hits), "files": [str(h) for h in hits]}


def check_dataset(path: str, task: str) -> None:
    """Validate a dataset yaml before registering it (reference :123)."""
    from spectrogram_yolov11_tpu.data import check_det_dataset

    data = check_det_dataset(path)
    LOGGER.info(f"HUB dataset check passed for {path}: nc={data['nc']}, task={task} ✅")


class HUBTrainingSession:
    """Training session against the local registry (reference hub/session.py:19).

    The trainer's callbacks call upload_metrics per epoch and upload_model on
    saves; both verbs do real (local) work: metrics append to the model's
    metrics.jsonl with a heartbeat counter, checkpoints copy into the registry.
    """

    def __init__(self, identifier: str):
        self.model_id = identifier or f"model_{int(time.time())}"
        self.dir = registry_dir() / self.model_id
        self.dir.mkdir(parents=True, exist_ok=True)
        self.model_url = str(self.dir)
        self.alive = True
        self.heartbeats = 0
        (self.dir / "meta.json").write_text(json.dumps({"id": self.model_id, "created": time.time()}))
        LOGGER.info(f"HUBTrainingSession: registry entry {self.dir}")

    def upload_metrics(self, epoch: int, metrics: dict) -> None:
        self.heartbeats += 1
        with (self.dir / "metrics.jsonl").open("a") as f:
            f.write(json.dumps({"epoch": int(epoch), "heartbeat": self.heartbeats, **metrics}) + "\n")

    def upload_model(self, epoch: int, weights: str, is_best: bool = False, final: bool = False) -> None:
        src = Path(weights)
        if not src.exists():
            return
        shutil.copy2(src, self.dir / ("best.ckpt" if is_best or final else "last.ckpt"))

    @classmethod
    def create_session(cls, identifier: str, args: Optional[dict] = None) -> Optional["HUBTrainingSession"]:
        """The facade calls this for hub-style model ids; local ids always work."""
        return cls(identifier) if identifier else None
