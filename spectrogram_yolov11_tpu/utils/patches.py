"""Unicode-safe cv2 IO wrappers (reference: ultralytics/utils/patches.py —
cv2.imread/imwrite cannot handle non-ASCII paths on some platforms; encoding
through numpy buffers side-steps the filesystem-encoding issue).

The reference also patches torch.load/save here; this framework's checkpoints
are msgpack (engine/checkpoint.py) so no torch patching exists.
"""

from __future__ import annotations

import cv2
import numpy as np


def imread(filename: str, flags: int = cv2.IMREAD_COLOR):
    """Read an image from any (incl. non-ASCII) path; None on failure."""
    return cv2.imdecode(np.fromfile(filename, np.uint8), flags)


def imwrite(filename: str, img: np.ndarray, params=None) -> bool:
    """Write an image to any (incl. non-ASCII) path; False on failure."""
    try:
        ext = "." + filename.rsplit(".", 1)[-1] if "." in filename else ".png"
        cv2.imencode(ext, img, params or [])[1].tofile(filename)
        return True
    except Exception:
        return False


def imshow(winname: str, mat: np.ndarray) -> None:
    """Display an image in a window whose title may be non-ASCII."""
    cv2.imshow(winname.encode("unicode_escape").decode(), mat)
