"""Host-side deterministic image/box transforms (numpy + PIL).

Parity targets: fvcore/detectron2 transforms as used by the reference
(uwsod/detectron2/data/transforms/augmentation_impl.py:125-175 ResizeShortestEdge,
fvcore ResizeTransform/HFlipTransform/CropTransform semantics):
  - resize: new size int(scale*edge + 0.5), PIL BILINEAR; boxes scale by
    (new/old) per axis
  - hflip: x' = width - x (no -1; d2 convention)
  - crop "relative_range": crop fraction ~ U[size, 1] per axis, int(d*frac+0.5),
    random top-left; boxes translate by (-x0, -y0)
All randomness comes from an explicit np.random.RandomState so runs are
reproducible and worker-shardable.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image


class Transform:
    def apply_image(self, img: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def apply_box(self, boxes: np.ndarray) -> np.ndarray:
        """boxes: (N, 4) XYXY float. d2 applies coords to all 4 corners and
        re-extracts min/max; for axis-aligned transforms below this reduces to
        direct arithmetic."""
        raise NotImplementedError

    def inverse_box(self, boxes: np.ndarray) -> np.ndarray:
        """Map boxes from transformed coords back to input coords (the TTA
        wrappers' inverse-transform of predictions)."""
        raise NotImplementedError

    @property
    def output_size(self) -> Tuple[int, int]:  # (h, w)
        raise NotImplementedError


class NoOpTransform(Transform):
    def __init__(self, h: int, w: int):
        self._hw = (h, w)

    def apply_image(self, img):
        return img

    def apply_box(self, boxes):
        return boxes

    def inverse_box(self, boxes):
        return boxes

    @property
    def output_size(self):
        return self._hw


class ResizeTransform(Transform):
    def __init__(self, h: int, w: int, new_h: int, new_w: int, interp=Image.BILINEAR):
        self.h, self.w, self.new_h, self.new_w = h, w, new_h, new_w
        self.interp = interp

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        assert img.shape[:2] == (self.h, self.w)
        if img.dtype == np.uint8:
            pil = Image.fromarray(img)
            pil = pil.resize((self.new_w, self.new_h), self.interp)
            return np.asarray(pil)
        pil = Image.fromarray(img.astype(np.float32), mode="F") if img.ndim == 2 else None
        if pil is not None:
            return np.asarray(pil.resize((self.new_w, self.new_h), self.interp))
        out = np.stack(
            [
                np.asarray(
                    Image.fromarray(img[..., c].astype(np.float32), mode="F").resize(
                        (self.new_w, self.new_h), self.interp
                    )
                )
                for c in range(img.shape[2])
            ],
            axis=2,
        )
        return out

    def apply_box(self, boxes: np.ndarray) -> np.ndarray:
        boxes = boxes.astype(np.float32).copy()
        boxes[:, 0::2] *= self.new_w * 1.0 / self.w
        boxes[:, 1::2] *= self.new_h * 1.0 / self.h
        return boxes

    def inverse_box(self, boxes: np.ndarray) -> np.ndarray:
        out = np.asarray(boxes, np.float64).copy()
        out[:, 0::2] *= self.w * 1.0 / self.new_w
        out[:, 1::2] *= self.h * 1.0 / self.new_h
        return out

    @property
    def output_size(self):
        return (self.new_h, self.new_w)


class HFlipTransform(Transform):
    def __init__(self, h: int, w: int):
        self.h, self.w = h, w

    def apply_image(self, img):
        return np.ascontiguousarray(img[:, ::-1])

    def apply_box(self, boxes):
        out = boxes.astype(np.float32).copy()
        out[:, 0] = self.w - boxes[:, 2]
        out[:, 2] = self.w - boxes[:, 0]
        return out

    def inverse_box(self, boxes):
        out = np.asarray(boxes, np.float64).copy()
        out[:, 0] = self.w - boxes[:, 2]
        out[:, 2] = self.w - boxes[:, 0]
        return out

    @property
    def output_size(self):
        return (self.h, self.w)


class CropTransform(Transform):
    def __init__(self, x0: int, y0: int, ch: int, cw: int, orig_h: int, orig_w: int):
        self.x0, self.y0, self.ch, self.cw = x0, y0, ch, cw
        self._orig = (orig_h, orig_w)

    def apply_image(self, img):
        return img[self.y0 : self.y0 + self.ch, self.x0 : self.x0 + self.cw]

    def apply_box(self, boxes):
        out = boxes.astype(np.float32).copy()
        out[:, 0::2] -= self.x0
        out[:, 1::2] -= self.y0
        return out

    def inverse_box(self, boxes):
        out = np.asarray(boxes, np.float64).copy()
        out[:, 0::2] += self.x0
        out[:, 1::2] += self.y0
        return out

    @property
    def output_size(self):
        return (self.ch, self.cw)


class TransformList(Transform):
    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = list(transforms)

    def apply_image(self, img):
        for t in self.transforms:
            img = t.apply_image(img)
        return img

    def apply_box(self, boxes):
        for t in self.transforms:
            boxes = t.apply_box(boxes)
        return boxes

    def inverse_box(self, boxes):
        for t in reversed(self.transforms):
            boxes = t.inverse_box(boxes)
        return boxes

    def __add__(self, other: "TransformList") -> "TransformList":
        return TransformList(self.transforms + list(other.transforms))

    @property
    def output_size(self):
        return self.transforms[-1].output_size


def resize_shortest_edge(
    h: int, w: int, short_edge_length, max_size: int, rng: np.random.RandomState = None,
    sample_style: str = "choice",
) -> ResizeTransform:
    """ResizeShortestEdge.get_transform parity (augmentation_impl.py:155-175)."""
    if isinstance(short_edge_length, int):
        short_edge_length = [short_edge_length]
    if sample_style == "range":
        size = rng.randint(short_edge_length[0], short_edge_length[1] + 1)
    elif rng is not None:
        size = int(rng.choice(short_edge_length))
    else:
        size = int(short_edge_length[0])
    if size == 0:
        return NoOpTransform(h, w)
    scale = size * 1.0 / min(h, w)
    if h < w:
        newh, neww = size, scale * w
    else:
        newh, neww = scale * h, size
    if max(newh, neww) > max_size:
        scale = max_size * 1.0 / max(newh, neww)
        newh, neww = newh * scale, neww * scale
    return ResizeTransform(h, w, int(newh + 0.5), int(neww + 0.5))


def random_crop(
    h: int, w: int, crop_type: str, crop_size, rng: np.random.RandomState
) -> CropTransform:
    """RandomCrop parity (d2 augmentation_impl RandomCrop.get_crop_size)."""
    if crop_type == "relative":
        ch, cw = crop_size
        ch, cw = int(h * ch + 0.5), int(w * cw + 0.5)
    elif crop_type == "relative_range":
        cs = np.asarray(crop_size, dtype=np.float32)
        ch_f, cw_f = cs + rng.rand(2).astype(np.float32) * (1 - cs)
        ch, cw = int(h * ch_f + 0.5), int(w * cw_f + 0.5)
    elif crop_type == "absolute":
        ch, cw = min(crop_size[0], h), min(crop_size[1], w)
    elif crop_type == "absolute_range":
        ch = rng.randint(min(h, crop_size[0]), min(h, crop_size[1]) + 1)
        cw = rng.randint(min(w, crop_size[0]), min(w, crop_size[1]) + 1)
    else:
        raise ValueError(crop_type)
    assert ch <= h and cw <= w
    y0 = rng.randint(h - ch + 1)
    x0 = rng.randint(w - cw + 1)
    return CropTransform(x0, y0, ch, cw, h, w)


def clip_boxes_np(boxes: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    out = boxes.copy()
    out[:, 0::2] = np.clip(out[:, 0::2], 0, hw[1])
    out[:, 1::2] = np.clip(out[:, 1::2], 0, hw[0])
    return out
