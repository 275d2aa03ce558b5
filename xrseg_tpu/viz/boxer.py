"""Box visualization onto numpy RGB frames (the IEBoxer equivalent).

The reference draws pooled uGUI panels (IEBoxer.cs:37-128); our output
surface is a plain [H,W,3] uint8 array (PNG-able, streamable), so "drawing"
is rasterizing rectangle outlines + label text. Caps mirror the reference:
200 drawn boxes (IEBoxer.cs:50).
"""
from __future__ import annotations

import colorsys
from typing import Optional, Sequence, Tuple

import numpy as np

from xrseg_tpu.perception.tracking import BoundingBox
from xrseg_tpu.viz.labels import COCO_LABELS

MAX_DRAWN_BOXES = 200   # ref: IEBoxer.cs:50


def class_color(label: int) -> Tuple[int, int, int]:
    """Deterministic well-spread palette per class id."""
    h = (label * 0.6180339887) % 1.0
    r, g, b = colorsys.hsv_to_rgb(h, 0.85, 1.0)
    return int(r * 255), int(g * 255), int(b * 255)


def _draw_rect(img: np.ndarray, x1: int, y1: int, x2: int, y2: int,
               color, thickness: int = 2) -> None:
    H, W = img.shape[:2]
    x1, x2 = sorted((max(0, min(W - 1, x1)), max(0, min(W - 1, x2))))
    y1, y2 = sorted((max(0, min(H - 1, y1)), max(0, min(H - 1, y2))))
    t = thickness
    img[y1:y1 + t, x1:x2 + 1] = color
    img[max(0, y2 - t + 1):y2 + 1, x1:x2 + 1] = color
    img[y1:y2 + 1, x1:x1 + t] = color
    img[y1:y2 + 1, max(0, x2 - t + 1):x2 + 1] = color


def _draw_text(img: np.ndarray, text: str, x: int, y: int, color) -> None:
    try:
        import cv2
        cv2.putText(img, text, (x, y), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    color, 1, cv2.LINE_AA)
    except Exception:
        pass   # text is cosmetic; boxes carry the information


class Boxer:
    """Draws detection boxes + labels (IEBoxer.DrawBoxes equivalent)."""

    def __init__(self, labels: Optional[Sequence[str]] = None):
        self.labels = list(labels) if labels is not None else list(COCO_LABELS)

    def class_name(self, label_id: int) -> str:
        if label_id < 0 or label_id >= len(self.labels):
            return "unknown"
        return self.labels[label_id].replace(" ", "_")

    def draw_boxes(self, frame: np.ndarray, boxes: Sequence[BoundingBox],
                   thickness: int = 2) -> np.ndarray:
        """frame: [H,W,3] uint8 (modified copy returned). Boxes are
        center-origin screen coords (parse_boxes output); screen == frame."""
        img = np.array(frame, copy=True)
        H, W = img.shape[:2]
        for b in boxes[:MAX_DRAWN_BOXES]:
            # center-origin -> pixel coords; screen Y up -> image row down
            cx = b.center_x + W / 2.0
            cy = H / 2.0 - b.center_y
            x1 = int(round(cx - b.width / 2))
            x2 = int(round(cx + b.width / 2))
            y1 = int(round(cy - b.height / 2))
            y2 = int(round(cy + b.height / 2))
            color = class_color(b.label)
            _draw_rect(img, x1, y1, x2, y2, color, thickness)
            _draw_text(img, f"{b.class_name} {b.score:.2f}",
                       x1 + 3, max(12, y1 - 4), color)
        return img
