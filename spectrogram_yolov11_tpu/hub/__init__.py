"""HUB client surface (reference: /root/reference/ultralytics/hub/).

The reference talks to the Ultralytics HUB SaaS (session heartbeats, model
up/download, auth). This environment is zero-egress and the service is not
part of the framework's value here, so the surface is preserved as explicit
no-ops that explain themselves — the facade hooks (`YOLO` model-id loading,
train callbacks) stay wired exactly like the reference's
(engine/model.py:128,784) so a networked deployment can fill them in.
"""

from __future__ import annotations

from typing import Optional

from spectrogram_yolov11_tpu.utils import LOGGER

HUB_API_ROOT = "https://api.ultralytics.com"
HUB_WEB_ROOT = "https://hub.ultralytics.com"


class Auth:
    """API-key holder (reference: hub/auth.py:140)."""

    def __init__(self, api_key: str = "", verbose: bool = False):
        self.api_key = api_key
        if verbose and not api_key:
            LOGGER.info("HUB: no API key configured (offline build).")

    def authenticate(self) -> bool:
        LOGGER.warning("HUB authenticate(): this build is offline (zero-egress); skipping.")
        return False


def login(api_key: Optional[str] = None, save: bool = True) -> bool:
    LOGGER.warning("hub.login(): offline build — credentials stored, no network session opened.")
    return False


def logout() -> None:
    LOGGER.info("hub.logout(): done (offline build).")


def export_model(model_id: str = "", format: str = "stablehlo") -> None:
    LOGGER.warning("hub.export_model(): offline build — use YOLO(...).export(format=...) locally.")


class HUBTrainingSession:
    """Session shim (reference: hub/session.py:19): accepts a model id and
    exposes the callback points the trainer fires; all remote ops are no-ops."""

    def __init__(self, identifier: str):
        self.model_id = identifier
        self.model_url = f"{HUB_WEB_ROOT}/models/{identifier}"
        self.alive = False
        LOGGER.warning(f"HUBTrainingSession('{identifier}'): offline build — metrics stay local.")

    def upload_metrics(self, *a, **k):
        pass

    def upload_model(self, *a, **k):
        pass

    @classmethod
    def create_session(cls, identifier: str, args: Optional[dict] = None) -> Optional["HUBTrainingSession"]:
        return None  # offline: the facade falls through to local weights/yamls
