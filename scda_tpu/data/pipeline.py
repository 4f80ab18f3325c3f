"""Static-shape input pipeline.

Rebuild of the reference's roi_data_layer (L4):
  - ``prep_im_for_blob`` scaling rule (ref lib/model/utils/blob.py:~40):
    shorter side -> ``scale`` capped so the longer side <= ``max_size``.
  - ``roibatchLoader`` batching (ref lib/roi_data_layer/roibatchLoader.py:
    ~60-200): the reference groups images by aspect ratio and pads/crops
    per batch so a batch shares one dynamic shape.  XLA wants ONE shape:
    every image is placed top-left into a fixed ``image_size`` canvas and
    its valid extent travels in ``im_info`` — downstream ops mask instead
    of relying on tensor bounds.
  - gt boxes padded to ``max_gt_boxes`` with a count (ref pads to 20/50).

Outputs mirror the reference forward signature
``(im_data, im_info, gt_boxes, num_boxes)`` (ref trainval_net.py:~300).
Pixel processing matches the caffe-lineage recipe: BGR channel order,
mean subtraction with ``pixel_means`` (ref blob.py:~45) — required for
drop-in compatibility with caffe-pretrained VGG/ResNet weights.
"""

from __future__ import annotations

import threading
import queue as queue_mod
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from scda_tpu.config import DataConfig
from scda_tpu.data.voc import Dataset, ImageRecord


@dataclass
class Batch:
    """One fixed-shape training batch."""

    image: np.ndarray      # (B, H, W, 3) float32, BGR, mean-subtracted
    im_info: np.ndarray    # (B, 3) float32: (valid_h, valid_w, scale)
    gt_boxes: np.ndarray   # (B, G, 5) float32: (x1, y1, x2, y2, class)
    num_boxes: np.ndarray  # (B,) int32


def compute_scale(height: int, width: int, target: int, max_size: int) -> float:
    """Ref ``prep_im_for_blob`` scale rule (blob.py:~40)."""
    short, long_ = min(height, width), max(height, width)
    scale = float(target) / short
    if round(scale * long_) > max_size:
        scale = float(max_size) / long_
    return scale


def load_image(record: ImageRecord) -> np.ndarray:
    """Decode to float32 BGR HWC."""
    from PIL import Image

    with Image.open(record.image_path) as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.float32)
    return rgb[:, :, ::-1]  # RGB -> BGR (caffe convention)


def _resize_bilinear_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Classic half-pixel bilinear resize (cv2 INTER_LINEAR semantics,
    the reference's resize; ref blob.py uses cv2.resize).  Same math as
    the native C++ kernel — equality is pinned in tests."""
    sh, sw = img.shape[:2]
    fy = np.clip((np.arange(out_h) + 0.5) * (sh / out_h) - 0.5, 0, sh - 1)
    fx = np.clip((np.arange(out_w) + 0.5) * (sw / out_w) - 0.5, 0, sw - 1)
    y0 = fy.astype(np.int64)
    x0 = fx.astype(np.int64)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    ly = (fy - y0).astype(np.float32)[:, None, None]
    lx = (fx - x0).astype(np.float32)[None, :, None]
    img = img.astype(np.float32)
    top = img[y0][:, x0] * (1 - lx) + img[y0][:, x1] * lx
    bot = img[y1][:, x0] * (1 - lx) + img[y1][:, x1] * lx
    return top * (1 - ly) + bot * ly


def prepare_image(
    img_bgr: np.ndarray,
    cfg: DataConfig,
    flip: bool = False,
) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Scale + mean-subtract + paste into the fixed canvas.

    Uses the native C++ prep kernel (scda_tpu.native) when available;
    the numpy fallback computes identical math.

    Returns (canvas (H, W, 3) float32, scale, (valid_h, valid_w)).
    """
    h, w = img_bgr.shape[:2]
    canvas_h, canvas_w = cfg.image_size
    scale = compute_scale(h, w, cfg.scale, cfg.max_size)
    # Never overflow the canvas.
    scale = min(scale, canvas_h / h, canvas_w / w)
    new_h, new_w = int(round(h * scale)), int(round(w * scale))

    from scda_tpu import native

    if native.available():
        canvas = native.prep_image_native(
            np.ascontiguousarray(img_bgr, np.float32),
            (canvas_h, canvas_w), (new_h, new_w),
            np.asarray(cfg.pixel_means, np.float32), flip,
        )
        return canvas, scale, (new_h, new_w)

    if flip:
        img_bgr = img_bgr[:, ::-1, :]
    if (new_h, new_w) != (h, w):
        resized = _resize_bilinear_np(img_bgr, new_h, new_w)
    else:
        resized = img_bgr.astype(np.float32)
    resized = resized - np.asarray(cfg.pixel_means, np.float32)

    canvas = np.zeros((canvas_h, canvas_w, 3), np.float32)
    canvas[:new_h, :new_w] = resized
    return canvas, scale, (new_h, new_w)


def prepare_gt_boxes(
    record: ImageRecord,
    scale: float,
    cfg: DataConfig,
    flip: bool = False,
) -> Tuple[np.ndarray, int]:
    """Scale (and maybe flip) gt boxes into canvas coords; pad to fixed G."""
    g = cfg.max_gt_boxes
    out = np.zeros((g, 5), np.float32)
    boxes = record.boxes.copy()
    if flip and len(boxes):
        # Ref imdb.append_flipped_images (lib/datasets/imdb.py:~150).
        x1 = record.width - boxes[:, 2] - 1
        x2 = record.width - boxes[:, 0] - 1
        boxes[:, 0], boxes[:, 2] = x1, x2
    n = min(len(boxes), g)
    if n:
        out[:n, :4] = boxes[:n] * scale
        out[:n, 4] = record.labels[:n].astype(np.float32)
    return out, n


def make_example(
    record: ImageRecord, cfg: DataConfig, flip: bool = False,
    img_bgr: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    img = load_image(record) if img_bgr is None else img_bgr
    canvas, scale, (vh, vw) = prepare_image(img, cfg, flip)
    gt, n = prepare_gt_boxes(record, scale, cfg, flip)
    im_info = np.array([vh, vw, scale], np.float32)
    return canvas, im_info, gt, n


def _collate(examples) -> Batch:
    imgs, infos, gts, counts = zip(*examples)
    return Batch(
        image=np.stack(imgs).astype(np.float32),
        im_info=np.stack(infos).astype(np.float32),
        gt_boxes=np.stack(gts).astype(np.float32),
        num_boxes=np.asarray(counts, np.int32),
    )


class DataLoader:
    """Epoch-based shuffled loader with optional background prefetch.

    Replaces the reference's ``torch.utils.data.DataLoader`` + ratio-grouped
    ``sampler`` (trainval_net.py:~280).  Host-side only; the arrays it
    yields are device-put by the train loop (and sharded by pjit).
    """

    def __init__(
        self,
        dataset: Dataset,
        cfg: DataConfig,
        batch_size: int,
        *,
        shuffle: bool = True,
        augment_flip: Optional[bool] = None,
        seed: int = 0,
        prefetch: int = 2,
        pad_final: bool = False,
    ):
        if len(dataset) == 0:
            raise ValueError(
                f"dataset {dataset.name!r} has no records — an empty "
                "dataset would make the loader spin forever"
            )
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment_flip = (
            cfg.use_flipped if augment_flip is None else augment_flip
        )
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch
        # pad_final=True (eval): keep EVERY record; the ragged final
        # batch is padded by wrapping to the front — consumers must
        # ignore positions >= len(dataset).  pad_final=False (train):
        # drop the ragged tail so epochs stay uniform.
        self.pad_final = pad_final
        # Decoded-image cache: avoids re-decoding per epoch on small
        # datasets (the reference re-reads from disk every step too).
        self._cache: dict = {}
        self._cache_limit = cfg.cache_images

    def __len__(self) -> int:
        if self.pad_final:
            return -(-len(self.dataset) // self.batch_size)
        return max(len(self.dataset) // self.batch_size, 1)

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        if self.pad_final:
            pad = (-len(idx)) % self.batch_size
            if pad:
                # Tile so pad > len(idx) (batch_size > dataset) still
                # fills the batch to the static size.
                fill = np.tile(idx, -(-pad // len(idx)))[:pad]
                idx = np.concatenate([idx, fill])
            return idx
        # Drop ragged tail so every batch has the static batch size
        # (the reference relied on its sampler for the same invariant).
        n = (len(idx) // self.batch_size) * self.batch_size
        if n == 0:
            # Tiny datasets: wrap around.
            reps = -(-self.batch_size // max(len(idx), 1))
            idx = np.tile(idx, reps)[: self.batch_size]
            return idx
        return idx[:n]

    def _load(self, record) -> np.ndarray:
        img = self._cache.get(record.image_path)
        if img is None:
            img = load_image(record)
            if len(self._cache) < self._cache_limit:
                self._cache[record.image_path] = img
        return img

    def _make_batch(self, indices: Sequence[int]) -> Batch:
        examples = []
        for i in indices:
            flip = self.augment_flip and bool(self.rng.randint(2))
            rec = self.dataset.records[i]
            examples.append(
                make_example(rec, self.cfg, flip, img_bgr=self._load(rec))
            )
        return _collate(examples)

    def __iter__(self) -> Iterator[Batch]:
        idx = self._epoch_indices()
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.prefetch <= 0:
            for b in batches:
                yield self._make_batch(b)
            return

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            try:
                for b in batches:
                    q.put(self._make_batch(b))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item

    def repeat(self) -> Iterator[Batch]:
        """Endless stream over reshuffled epochs (for step-based loops and
        the SCDA target-domain feed)."""
        while True:
            yield from self
