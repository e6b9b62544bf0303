"""Folder-of-images + txt-label dataset (host side).

Data layout matches the reference (README.md:25-50):

    img_dir/000001.jpg ...
    lab_dir/000001.txt   lines: "class_id xmin ymin xmax ymax" (absolute px)
    names.txt            lines: "class_id name"

Augmentation follows YOLODataset.__getitem__ (dataset/datasets.py:404-441):
mosaic(+nested mixup) with probability, then the perspective/cutout/HSV/flip
chain, a validity filter, and resample-until-nonempty.

Differences from the reference (intentional):
* labels are parsed fully — the reference's ``np.loadtxt(..., skiprows=1)``
  (dataset/datasets.py:171) silently drops every file's first box; we do not
  replicate that bug,
* randomness comes from an explicit np.random.Generator so results are
  reproducible per (seed, epoch, index).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

from .augment import AugmentConfig, apply_transform_chain, mixup, mosaic4, valid_boxes_mask

__all__ = ["DetectionDataset", "load_names"]

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def load_names(path) -> dict[int, str]:
    """Parse names.txt: 'class_id name' per line (dataset/datasets.py names map)."""
    out = {}
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        idx, name = line.split(maxsplit=1)
        out[int(idx)] = name
    return out


class DetectionDataset:
    """Index of (image, label) pairs with reference-parity augmentation."""

    def __init__(
        self,
        img_dir,
        lab_dir,
        names_path=None,
        input_size=(640, 640),
        aug: AugmentConfig | None = None,
        enable_aug: bool = True,
        cache_images: bool = False,
        cache_dir=None,
        cached_canvas: bool | None = None,
    ):
        # cached_canvas: serve the FULL (h, w) cache row — min-scale content
        # top-left, the remainder zero — instead of the content crop. This
        # is the reference's de facto TRAINING distribution: its
        # pull_item (dataset/datasets.py:350-357) returns self.imgs[ix],
        # the whole memmap canvas, and mosaic composes those padded
        # canvases (:188-212). Its cache_num=0 (uncached) path is broken in
        # its own code (empty memmap, :292), so cache-everything canvases
        # are what every reference training run actually sees. Round-5
        # converged-parity A/B measured the difference at ~13 mAP50 pts on
        # the synthetic set, so parity REQUIRES it: default ON when the
        # cache is active. Pass False to serve tight content crops instead.
        self.img_dir = Path(img_dir)
        self.lab_dir = Path(lab_dir)
        self.input_size = tuple(input_size)
        self.aug = aug or AugmentConfig(input_size=tuple(input_size))
        self.enable_aug = enable_aug

        self.img_files = sorted(
            p for p in self.img_dir.iterdir() if p.suffix.lower() in IMG_EXTENSIONS
        )
        if not self.img_files:
            raise FileNotFoundError(f"no images under {self.img_dir}")
        # consistency check (dataset/datasets.py asserts file pairing)
        missing = [
            p.name for p in self.img_files
            if not (self.lab_dir / f"{p.stem}.txt").exists()
        ]
        if missing:
            raise FileNotFoundError(
                f"{len(missing)} images lack label files, e.g. {missing[:3]}"
            )

        if names_path is not None:
            self.cls2name = load_names(names_path)
        else:
            self.cls2name = {}
        self._num_class = None
        self._ann_cache: dict = {}
        self._meta_cache: dict = {}

        # optional np.memmap cache of min-scale-resized images
        # (dataset/datasets.py:277-322 _cache_image). When active, pull_item
        # serves the resized image with boxes scaled accordingly — matching
        # the reference's cached-path numerics.
        self._cache = None
        self._cache_shapes = None
        self._orig_shapes = None
        self.cached_canvas = bool(cache_images) if cached_canvas is None \
            else bool(cached_canvas)
        if cache_images:
            self._build_cache(cache_dir)

    def __len__(self):
        return len(self.img_files)

    @property
    def num_class(self) -> int:
        if self.cls2name:
            return max(self.cls2name) + 1
        if self._num_class is None:
            classes = set()
            for idx in range(len(self.img_files)):
                ann = self.load_annotations(idx)
                classes.update(ann[:, 0].astype(int).tolist())
            self._num_class = (max(classes) + 1) if classes else 1
        return self._num_class

    def load_img(self, idx: int) -> np.ndarray:
        img = np.asarray(Image.open(self.img_files[idx]).convert("RGB"))
        return img

    def load_annotations(self, idx: int) -> np.ndarray:
        """Returns (N, 5) [cls, xmin, ymin, xmax, ymax]; boxes with any side
        < 1 px are dropped (dataset/datasets.py:178-181).

        Parsed labels are memoized: a mosaic+mixup plan pulls 8+ items, and
        re-running np.loadtxt per pull was ~40% of device-aug planning time
        (profiled on the 1-core host). Callers get a fresh copy — pull_item
        and the augmenters mutate boxes in place."""
        cached = self._ann_cache.get(idx)
        if cached is not None:
            return cached.copy()
        path = self.lab_dir / f"{self.img_files[idx].stem}.txt"
        try:
            ann = np.loadtxt(str(path), dtype=np.float32, ndmin=2)
        except (ValueError, OSError):
            ann = np.zeros((0, 5), dtype=np.float32)
        if ann.size == 0:
            ann = np.zeros((0, 5), dtype=np.float32)
        else:
            assert ann.shape[1] == 5, f"bad label shape {ann.shape} in {path}"
            whs = ann[:, [3, 4]] - ann[:, [1, 2]]
            ann = ann[np.all(whs >= 1, axis=1)]
        self._ann_cache[idx] = ann
        return ann.copy()

    def _build_cache(self, cache_dir):
        import cv2
        from concurrent.futures import ThreadPoolExecutor

        h, w = self.input_size
        cache_dir = Path(cache_dir) if cache_dir else self.img_dir.parent
        cache_dir.mkdir(parents=True, exist_ok=True)
        cache_file = cache_dir / (
            f"img_{self.img_dir.name}_cache_h{h}_w{w}_{len(self)}.array"
        )
        shapes_file = cache_file.with_suffix(".shapes.npy")
        fresh = not (cache_file.exists() and shapes_file.exists())
        self._cache = np.memmap(
            cache_file, shape=(len(self), h, w, 3), dtype=np.uint8,
            mode="w+" if fresh else "r+",
        )
        if not fresh:
            # warm start: sidecar has cached + original shapes — no image
            # is decoded (a cold build used to be paid on EVERY startup)
            shapes = np.load(shapes_file)
            self._cache_shapes = shapes[:, :2].copy()
            self._orig_shapes = shapes[:, 2:].copy()
            return
        self._cache_shapes = np.zeros((len(self), 2), dtype=np.int32)
        self._orig_shapes = np.zeros((len(self), 2), dtype=np.int32)

        def resize_one(i):
            img = self.load_img(i)
            r = min(h / img.shape[0], w / img.shape[1])
            rh, rw = int(img.shape[0] * r), int(img.shape[1] * r)
            self._cache_shapes[i] = (rh, rw)
            self._orig_shapes[i] = img.shape[:2]
            out = cv2.resize(img, (rw, rh), interpolation=cv2.INTER_LINEAR)
            self._cache[i, :rh, :rw] = out

        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(resize_one, range(len(self))))
        self._cache.flush()
        np.save(shapes_file,
                np.concatenate([self._cache_shapes, self._orig_shapes], 1))

    def pull_item(self, idx: int):
        """Raw (img, boxes (N,4) xyxy, classes (N,)). With the image cache
        active, the min-scale-resized image is served and boxes are scaled
        to match (reference cached-path semantics)."""
        ann = self.load_annotations(idx)
        boxes, classes = ann[:, 1:5].copy(), ann[:, 0].copy()
        if self._cache is not None:
            # boxes scale by the cached resize ratio r = min(h/H, w/W);
            # original sizes come from the cache sidecar (a PIL header
            # read here cost 8 file opens per mosaic+mixup plan)
            h, w = self.input_size
            H, W = self._orig_shapes[idx]
            boxes = boxes * min(h / H, w / W)
            if self.cached_canvas:
                # reference-parity: the whole canvas row, zero-padded
                # beyond the content region (see __init__ docnote)
                return np.asarray(self._cache[idx]), boxes, classes
            rh, rw = self._cache_shapes[idx]
            return np.asarray(self._cache[idx, :rh, :rw]), boxes, classes
        img = self.load_img(idx)
        return img, boxes, classes

    def pull_meta(self, idx: int):
        """Like pull_item but WITHOUT touching pixel bytes: returns
        ((h, w), boxes (N,4) xyxy, classes (N,)) for the image pull_item
        would serve. Device-cache augmentation plans (data/device_aug.py,
        with_pixels=False) only need shapes + labels — slicing the memmap
        cache here copied ~1.2 MB per pull (8 pulls per mosaic+mixup plan)
        that the renderer then re-read from the chip-resident cache."""
        # memoized: shape/boxes/classes are static per index, and a
        # mosaic+mixup plan pulls 8+ of them. The returned arrays are
        # SHARED — every consumer in the plan path copies before mutating
        # (mosaic rounds into new arrays, flips/jitting copy first).
        cached = self._meta_cache.get(idx)
        if cached is not None:
            return cached
        ann = self.load_annotations(idx)
        boxes, classes = ann[:, 1:5].copy(), ann[:, 0].copy()
        if self._cache is not None:
            h, w = self.input_size
            H, W = self._orig_shapes[idx]
            boxes = boxes * min(h / H, w / W)
            if self.cached_canvas:
                out = ((int(h), int(w)), boxes, classes)
            else:
                rh, rw = self._cache_shapes[idx]
                out = ((int(rh), int(rw)), boxes, classes)
            self._meta_cache[idx] = out
            return out
        # no cache: a PIL header read gives the size without decoding
        with Image.open(self.img_files[idx]) as im:
            w0, h0 = im.size
        out = ((int(h0), int(w0)), boxes, classes)
        self._meta_cache[idx] = out
        return out

    def _mosaic(self, idx: int, rng: np.random.Generator):
        indices = [idx] + [int(rng.integers(0, len(self))) for _ in range(3)]
        rng.shuffle(indices)
        imgs, boxes, labels = [], [], []
        for i in indices:
            im, b, l = self.pull_item(i)
            imgs.append(im)
            boxes.append(b)
            labels.append(l)
        return mosaic4(
            imgs, boxes, labels,
            mosaic_shape=[2 * s for s in self.input_size],
            fill_value=self.aug.fill_value,
            rng=rng,
        )

    def get(self, idx: int, rng: np.random.Generator, enable_aug: bool | None = None):
        """One training sample after augmentation.

        Returns (img uint8 HxWx3, boxes (N, 4) xyxy float32, classes (N,)).
        Resamples (up to a bound) when augmentation leaves no valid boxes,
        mirroring the reference's while-loop (dataset/datasets.py:436-440).
        """
        if enable_aug is None:
            enable_aug = self.enable_aug

        for _attempt in range(10):
            img, boxes, labels = self.pull_item(idx)
            if enable_aug:
                if rng.random() < self.aug.mosaic_p:
                    img, boxes, labels = self._mosaic(idx, rng)
                    if rng.random() < self.aug.mixup_p:
                        im2, b2, l2 = self._mosaic(int(rng.integers(0, len(self))), rng)
                        img, boxes, labels = mixup(img, boxes, labels, im2, b2, l2, rng)
                img, boxes, labels = apply_transform_chain(
                    img, boxes, labels, self.aug, rng
                )
            if len(boxes):
                keep = valid_boxes_mask(boxes)
                boxes, labels = boxes[keep], labels[keep]
            if len(boxes) and boxes.sum() > 0:
                return img, boxes.astype(np.float32), labels.astype(np.float32)
            idx = int(rng.integers(0, len(self)))

        # give up augmenting; return the raw item even if empty
        img, boxes, labels = self.pull_item(idx)
        return img, boxes.astype(np.float32), labels.astype(np.float32)
