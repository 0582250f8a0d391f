"""Folder dataset: *.jpg/*.png images with sibling *.txt captions.

The reference's SDLoRADataset (train_lora_pipeline.py:62-123): random square
crop at native min side, resize to target, hflip, normalize to [-1,1], plus
the SDXL micro-conditioning tuple (original_sizes, crop_top_left,
target_sizes).  The reference's hflip probability is accidentally 1.0
(train_lora_pipeline.py:74); here it is 0.5 and flag-controlled per the
SURVEY.md behavior-vs-bug ledger.

Host-side numpy/PIL; emits ready NHWC float32 batches.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional

import numpy as np

try:
    from PIL import Image

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")


@dataclass
class Example:
    pixel_values: np.ndarray  # [H, W, 3] float32 in [-1, 1]
    caption: str
    original_size: tuple
    crop_top_left: tuple
    target_size: tuple


class SDLoRADataset:
    def __init__(
        self,
        data_dir: str,
        resolution: int = 1024,
        random_flip: bool = True,
        flip_p: float = 0.5,
        center_crop: bool = False,
        seed: int = 0,
    ):
        self.data_dir = data_dir
        self.resolution = resolution
        self.random_flip = random_flip
        self.flip_p = flip_p
        self.center_crop = center_crop
        self.rng = np.random.default_rng(seed)
        self.items: List[str] = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.lower().endswith(IMAGE_EXTS)
        )
        if not self.items:
            raise ValueError(f"no images found in {data_dir}")

    def __len__(self) -> int:
        return len(self.items)

    def _caption(self, img_path: str) -> str:
        txt = os.path.splitext(img_path)[0] + ".txt"
        if os.path.exists(txt):
            with open(txt, encoding="utf-8") as f:
                return f.read().strip()
        return ""

    def __getitem__(self, idx: int) -> Example:
        path = self.items[idx]
        img = Image.open(path).convert("RGB")
        W, H = img.size
        original_size = (H, W)

        # random (or center) square crop at native min side
        side = min(H, W)
        if self.center_crop:
            top, left = (H - side) // 2, (W - side) // 2
        else:
            top = int(self.rng.integers(0, H - side + 1))
            left = int(self.rng.integers(0, W - side + 1))
        img = img.crop((left, top, left + side, top + side))
        img = img.resize((self.resolution, self.resolution), Image.BILINEAR)

        arr = np.asarray(img, np.float32) / 255.0
        if self.random_flip and self.rng.random() < self.flip_p:
            arr = arr[:, ::-1]
            # mirror the crop x-coordinate for the conditioning tuple
            left = W - left - side
        arr = arr * 2.0 - 1.0

        return Example(
            pixel_values=arr,
            caption=self._caption(path),
            original_size=original_size,
            crop_top_left=(top, left),
            target_size=(self.resolution, self.resolution),
        )

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        epochs: Optional[int] = None,
        shard_index: int = 0,
        num_shards: int = 1,
        drop_last: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Epoch iterator of collated batches (collate analog,
        train_lora_pipeline.py:320-342).  `shard_index/num_shards` give
        per-host sharding for multi-host data parallel."""
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.arange(len(self))
            if shuffle:
                self.rng.shuffle(order)
            order = order[shard_index::num_shards]
            for s in range(0, len(order) - (batch_size - 1 if drop_last else 0), batch_size):
                idxs = order[s : s + batch_size]
                if drop_last and len(idxs) < batch_size:
                    break
                ex = [self[int(i)] for i in idxs]
                yield {
                    "pixel_values": np.stack([e.pixel_values for e in ex]),
                    "captions": [e.caption for e in ex],
                    "original_sizes": np.asarray(
                        [e.original_size for e in ex], np.float32
                    ),
                    "crop_top_lefts": np.asarray(
                        [e.crop_top_left for e in ex], np.float32
                    ),
                    "target_sizes": np.asarray(
                        [e.target_size for e in ex], np.float32
                    ),
                }
            epoch += 1
