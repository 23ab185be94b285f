"""Packed uint8 crop datasets: decode-once, stream-forever.

The reference re-decodes JPEG + re-crops every epoch inside torch
DataLoader workers (/root/reference/src/datasets/dataset_300WLP.py:311-312)
— fine with dozens of idle CPU cores next to one GPU, hopeless next to a
TPU chip that eats 8k+ imgs/s (and this host exposes ONE core).  The
TPU-native split: the *deterministic* part of the pipeline (decode, head
crop, pad-to-square, resize to input_size) runs ONCE offline into a
memory-mapped uint8 array; the *stochastic* part (flip/blur/
RandomResizedCrop/rotation + normalization) runs on device per step
(ops/views.py).  This is exactly the reference pipeline split at the
224px base-crop point (SURVEY.md §2.6: crop -> resize 224 -> random
views), so augmentation semantics are unchanged.

Per-batch host cost collapses to one fancy-indexed memmap read (a
vectorized memcpy, no per-sample Python), which one core sustains at
tens of thousands of images/sec.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

_IMGS = "imgs_u8.npy"
_LABELS = "labels.npz"
_META = "meta.json"

# Label keys packed alongside the images when the source dataset provides
# them (unlabeled sets have none).
_LABEL_KEYS = ("rot_mat", "euler_angles")


def pack_dataset(dataset, out_dir: str, size: Optional[int] = None,
                 log_every: int = 2000) -> str:
    """Materialize ``dataset``'s base crops into ``out_dir``.

    The dataset must yield the raw-crop schema (``img_raw`` uint8, plus
    optional labels) — i.e. be constructed in device-views mode.  Safe to
    call concurrently-ish: writes to a temp file then renames.
    """
    n = len(dataset)
    first = dataset[0]
    if "img_raw" not in first:
        raise ValueError(
            "pack_dataset needs raw uint8 crops; construct the dataset in "
            "device-views/raw mode (it yielded keys "
            f"{sorted(first.keys())})")
    s = int(size or first["img_raw"].shape[0])
    os.makedirs(out_dir, exist_ok=True)

    imgs_path = os.path.join(out_dir, _IMGS)
    # Unique temp name: concurrent packers (e.g. two ladder arms racing on
    # a shared cache) must never interleave writes into one temp file; the
    # final os.replace publishes whichever finished, atomically.
    tmp_path = f"{imgs_path}.{os.getpid()}.tmp"
    imgs = np.lib.format.open_memmap(
        tmp_path, mode="w+", dtype=np.uint8, shape=(n, s, s, 3))
    labels = {k: [] for k in _LABEL_KEYS if k in first}
    for i in range(n):
        sample = dataset[i] if i else first
        img = sample["img_raw"]
        if img.shape[0] != s:
            import cv2

            img = cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
        imgs[i] = img
        for k in labels:
            labels[k].append(np.asarray(sample[k], np.float32))
        if log_every and (i + 1) % log_every == 0:
            print(f"packed {i + 1}/{n}", flush=True)
    imgs.flush()
    del imgs
    labels_tmp = os.path.join(out_dir, f"{_LABELS}.{os.getpid()}.tmp")
    with open(labels_tmp, "wb") as f:
        np.savez(f, **{k: np.stack(v) for k, v in labels.items()})
    os.replace(labels_tmp, os.path.join(out_dir, _LABELS))
    meta_tmp = os.path.join(out_dir, f"{_META}.{os.getpid()}.tmp")
    with open(meta_tmp, "w") as f:
        json.dump({"n": n, "size": s, "labeled": sorted(labels),
                   "fingerprint": getattr(dataset, "fingerprint", None)}, f)
    os.replace(meta_tmp, os.path.join(out_dir, _META))
    # Publish the images last: is_packed() keys off _IMGS + _META, so a
    # reader can never see the images without their labels/meta.  (This
    # ordering is airtight for a fresh dir — the normal case, since cache
    # dirs are content-addressed by dataset fingerprint upstream; racing
    # same-dir packers write identical bytes, so replace order between
    # them is immaterial.)
    os.replace(tmp_path, imgs_path)
    return out_dir


def is_packed(path: str) -> bool:
    return (os.path.isfile(os.path.join(path, _IMGS))
            and os.path.isfile(os.path.join(path, _META)))


class PackedHeadPose:
    """Memory-mapped packed crops with vectorized batch access.

    ``get_batch(idxs)`` is the hot path (one gather over the memmap); the
    per-sample ``__getitem__`` exists for protocol compatibility.  Samples
    use the raw-views schema (``img_raw`` uint8) — pair with the device
    view pipeline (``--device_views``).
    """

    def __init__(self, path: str):
        with open(os.path.join(path, _META)) as f:
            meta = json.load(f)
        self.n = int(meta["n"])
        self.size = int(meta["size"])
        # Source-dataset identity recorded at pack time (None for datasets
        # that don't define one); lets callers detect a stale cache when
        # the split/config changed under the same cache dir.
        self.fingerprint = meta.get("fingerprint")
        self._imgs = np.load(os.path.join(path, _IMGS), mmap_mode="r")
        labels_path = os.path.join(path, _LABELS)
        self._labels: Dict[str, np.ndarray] = {}
        if os.path.isfile(labels_path):
            with np.load(labels_path) as z:
                self._labels = {k: z[k] for k in z.files}

    def __len__(self) -> int:
        return self.n

    def get_batch(self, idxs: Sequence[int]) -> Dict[str, np.ndarray]:
        idxs = np.asarray(idxs, np.int64)
        out = {"idx": idxs.astype(np.int32),
               "img_raw": np.ascontiguousarray(self._imgs[idxs])}
        for k, v in self._labels.items():
            out[k] = v[idxs]
        return out

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        b = self.get_batch([idx])
        return {k: v[0] for k, v in b.items()}
