"""The paper's aspect-ratio-invariant head cropping, as one shared function.

The reference replicates this idiom in every dataset module
(/root/reference/src/datasets/dataset_300WLP.py:22-100 and siblings):

1. a square box from landmarks (side = max(h, w)) or a head bbox;
2. random padding factor ``ad`` with *double* headroom above the face
   (new_y_min uses ``ad * h * 2``) so hair/headwear is included;
3. clip to the image, then symmetrically zero-pad back to square so the
   face is never warped, and resize to 224.

Host-side numpy/PIL (runs in loader workers); the hot normalize/occlusion
ops live on device in ops/augment.py.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def expand_box(x_min, y_min, x_max, y_max, ad: float, img_w: int, img_h: int,
               top_scale: float = 2.0):
    """Pad the squared box by ``ad`` on each side, with ``top_scale`` x extra
    above (reference hint 2), clipped to the image."""
    h, w = y_max - y_min, x_max - x_min
    side = max(h, w)
    new_x_min = max(int(x_min - ad * side), 0)
    new_x_max = min(int(x_max + ad * side), img_w - 1)
    new_y_min = max(int(y_min - ad * side * top_scale), 0)
    new_y_max = min(int(y_max + ad * side), img_h - 1)
    return new_x_min, new_y_min, new_x_max, new_y_max


def crop_pad_square(img: Image.Image, left: int, top: int, right: int,
                    bottom: int, out_size: int = 224) -> Image.Image:
    """Crop, then symmetrically zero-pad the crop to square (no warping),
    then resize to ``out_size`` — reference hint 3."""
    img_w, img_h = img.size
    temph, tempw = bottom - top, right - left
    if temph > tempw:
        pad_lr, pad_tb = (temph - tempw) // 2, 0
    else:
        pad_lr, pad_tb = 0, (tempw - temph) // 2

    if left - pad_lr < 0:
        new_left, paste_x = 0, abs(left - pad_lr)
    else:
        new_left, paste_x = left - pad_lr, 0
    if top - pad_tb < 0:
        new_top, paste_y = 0, abs(top - pad_tb)
    else:
        new_top, paste_y = top - pad_tb, 0
    if right + pad_lr > img_w - 1:
        new_right, extra_r = img_w - 1, right + pad_lr - img_w + 1
    else:
        new_right, extra_r = right + pad_lr, 0
    if bottom + pad_tb > img_h - 1:
        new_bottom, extra_b = img_h - 1, bottom + pad_tb - img_h + 1
    else:
        new_bottom, extra_b = bottom + pad_tb, 0

    crop = img.crop((new_left, new_top, new_right, new_bottom))
    w, h = crop.size
    padded = Image.new(crop.mode, (w + paste_x + extra_r, h + paste_y + extra_b),
                       (0, 0, 0))
    padded.paste(crop, (paste_x, paste_y))
    return padded.resize((out_size, out_size))


def head_crop_from_landmarks(img: Image.Image, pt2d: np.ndarray, ad: float,
                             out_size: int = 224) -> Image.Image:
    """Full pipeline from 68 (or 19) landmarks; pt2d shape (2, N)."""
    xs, ys = pt2d[0], pt2d[1]
    keep = (xs > 0.0) if (xs > 0.0).sum() <= (ys > 0.0).sum() else (ys > 0.0)
    xs, ys = xs[keep], ys[keep]
    x_min, x_max = int(xs.min()), int(xs.max())
    y_min, y_max = int(ys.min()), int(ys.max())
    l, t, r, b = expand_box(x_min, y_min, x_max, y_max, ad, *img.size)
    return crop_pad_square(img, l, t, r, b, out_size)


def head_crop_from_bbox(img: Image.Image, bbox, ad: float, out_size: int = 224,
                        top_scale: float = 1.0) -> Image.Image:
    """Center-based crop from a head/face bbox (x, y, w, h): the box center
    padded to half-extent (0.5 + ad) * (w+h)/2 on each side, with the top
    extent using ``top_scale * ad`` (WiderFace uses 2x headroom above the
    face, dataset_WiderFace.py:34-38; head-box sets use 1x,
    dataset_COCOHead.py:30-40)."""
    x, y, w, h = bbox
    cx, cy = x + w / 2.0, y + h / 2.0
    pad_len = (w + h) / 2.0
    img_w, img_h = img.size
    l = max(int(cx - (0.5 + ad) * pad_len), 0)
    t = max(int(cy - (0.5 + ad * top_scale) * pad_len), 0)
    r = min(int(cx + (0.5 + ad) * pad_len), img_w - 1)
    b = min(int(cy + (0.5 + ad) * pad_len), img_h - 1)
    return crop_pad_square(img, l, t, r, b, out_size)
