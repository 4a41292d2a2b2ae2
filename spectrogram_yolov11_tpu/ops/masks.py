"""Host-side mask utilities (numpy/cv2) — the public counterparts of the
reference's mask pipeline (/root/reference/ultralytics/utils/ops.py:
process_mask:679, process_mask_native:712, scale_masks:732, scale_image:605,
crop_mask:660).

The jitted production paths keep their own fused implementations (segment
exporter graph, SegmentationValidator, Results); these functions serve user
code that post-processes raw (proto, coeff) outputs on host. Protos are HWC
(mh, mw, nm) — the TPU-native layout this framework emits everywhere — where
the reference uses CHW.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def crop_masks_device(masks, boxes, in_hw):
    """Jitted batched crop-to-box (the device-side counterpart of crop_mask,
    reference ops.py:660): masks (b, d, mh, mw) float logits or bool, boxes
    (b, d, 4) xyxy in INPUT-image pixels, in_hw the network input (h, w).

    The reference's process_mask always multiplies the mask logits by the
    box window before thresholding at 0 — without it, sigmoid spill outside
    the box inflates predicted masks ~20x and mask IoU collapses (round-5
    crossseg leg: ref-trained weights scored box mAP 0.41 but mask mAP 0.0
    through the un-cropped validator path)."""
    import jax.numpy as jnp

    mh, mw = masks.shape[-2], masks.shape[-1]
    sy, sx = mh / float(in_hw[0]), mw / float(in_hw[1])
    x = jnp.arange(mw, dtype=jnp.float32)[None, None, None, :]
    y = jnp.arange(mh, dtype=jnp.float32)[None, None, :, None]
    x1 = (boxes[..., 0] * sx)[..., None, None]
    y1 = (boxes[..., 1] * sy)[..., None, None]
    x2 = (boxes[..., 2] * sx)[..., None, None]
    y2 = (boxes[..., 3] * sy)[..., None, None]
    inside = (x >= x1) & (x < x2) & (y >= y1) & (y < y2)
    if masks.dtype == jnp.bool_:
        return masks & inside
    return masks * inside


def crop_mask(masks: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Zero mask pixels outside each box: (n, h, w) x (n, 4 xyxy in mask
    coords) -> (n, h, w)."""
    n, h, w = masks.shape
    r = np.arange(w, dtype=np.float32)[None, None, :]
    c = np.arange(h, dtype=np.float32)[None, :, None]
    x1, y1, x2, y2 = (boxes[:, i].reshape(-1, 1, 1) for i in range(4))
    return masks * ((r >= x1) & (r < x2) & (c >= y1) & (c < y2))


def process_mask(protos: np.ndarray, masks_in: np.ndarray, bboxes: np.ndarray,
                 shape: Tuple[int, int], upsample: bool = False) -> np.ndarray:
    """proto (mh, mw, nm) + NMS-surviving coeffs (n, nm) + boxes (n, 4 xyxy in
    input-image pixels) -> boolean masks (n, mh, mw), or (n, *shape) when
    `upsample`. Mirrors reference process_mask: crop at proto resolution,
    then optionally upsample."""
    import cv2

    mh, mw, nm = protos.shape
    masks = (masks_in.astype(np.float32) @ protos.reshape(-1, nm).T.astype(np.float32))
    masks = masks.reshape(-1, mh, mw)
    scale = np.array([mw / shape[1], mh / shape[0], mw / shape[1], mh / shape[0]], np.float32)
    masks = crop_mask(masks, bboxes * scale)
    if upsample:
        up = np.empty((len(masks), *shape), np.float32)
        for i, m in enumerate(masks):
            up[i] = cv2.resize(m, (shape[1], shape[0]), interpolation=cv2.INTER_LINEAR)
        masks = up
    return masks > 0.0


def process_mask_native(protos: np.ndarray, masks_in: np.ndarray, bboxes: np.ndarray,
                        shape: Tuple[int, int]) -> np.ndarray:
    """Like process_mask but upsample FIRST (un-letterboxed), then crop at
    full resolution — the higher-quality path (reference
    process_mask_native:712)."""
    mh, mw, nm = protos.shape
    masks = (masks_in.astype(np.float32) @ protos.reshape(-1, nm).T.astype(np.float32))
    masks = masks.reshape(-1, mh, mw)
    masks = scale_masks(masks, shape)
    return crop_mask(masks, bboxes) > 0.0


def scale_masks(masks: np.ndarray, shape: Tuple[int, int], padding: bool = True) -> np.ndarray:
    """Rescale (n, h, w) masks to `shape`, removing letterbox padding first
    when `padding` (reference scale_masks:732)."""
    import cv2

    mh, mw = masks.shape[1:]
    gain = min(mh / shape[0], mw / shape[1])
    pad_w, pad_h = mw - shape[1] * gain, mh - shape[0] * gain
    if padding:
        pad_w, pad_h = pad_w / 2, pad_h / 2
    top, left = (int(pad_h), int(pad_w)) if padding else (0, 0)
    bottom, right = int(mh - pad_h), int(mw - pad_w)
    out = np.empty((len(masks), *shape), masks.dtype if masks.dtype == np.float32 else np.float32)
    for i, m in enumerate(masks):
        out[i] = cv2.resize(m[top:bottom, left:right].astype(np.float32),
                            (shape[1], shape[0]), interpolation=cv2.INTER_LINEAR)
    return out


def scale_image(masks: np.ndarray, im0_shape: Tuple[int, int], ratio_pad=None) -> np.ndarray:
    """Un-letterbox an (h, w, c) image/mask plane back to the original image
    shape (reference scale_image:605)."""
    import cv2

    im1_shape = masks.shape
    if im1_shape[:2] == tuple(im0_shape[:2]):
        return masks
    if ratio_pad is None:
        gain = min(im1_shape[0] / im0_shape[0], im1_shape[1] / im0_shape[1])
        pad = (im1_shape[1] - im0_shape[1] * gain) / 2, (im1_shape[0] - im0_shape[0] * gain) / 2
    else:
        pad = ratio_pad[1]
    if masks.ndim < 2:
        raise ValueError(f"masks must be 2- or 3-dimensional, got {masks.ndim}")
    top, left = int(pad[1]), int(pad[0])
    bottom, right = int(im1_shape[0] - pad[1]), int(im1_shape[1] - pad[0])
    masks = cv2.resize(masks[top:bottom, left:right], (im0_shape[1], im0_shape[0]))
    return masks[:, :, None] if masks.ndim == 2 else masks


def convert_torch2numpy_batch(batch) -> np.ndarray:
    """BCHW float [0,1] batch (torch tensor, jax array, or numpy) -> BHWC
    uint8 numpy (reference: utils/ops.py:840 — array-type-agnostic here since
    this framework's device arrays are jax, but .pt-era user code passes
    torch tensors)."""
    if hasattr(batch, "permute"):  # torch tensor
        return (batch.permute(0, 2, 3, 1).contiguous() * 255).clamp(0, 255).cpu().numpy().astype(np.uint8)
    arr = np.asarray(batch)
    return np.clip(arr.transpose(0, 2, 3, 1) * 255, 0, 255).astype(np.uint8)
