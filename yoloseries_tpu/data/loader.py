"""Fixed-shape batching + device prefetch (the TPU input pipeline).

Replaces the reference's torch DataLoader / InfiniteSampler / CUDA-stream
prefetcher stack (dataset/data_sampler.py:106-159, data_collater.py:21-66,
data_prefetcher.py:6-57) with:

* an infinite, seeded, rank-sharded index stream (same islice(start=rank,
  step=world_size) semantics as InfiniteSampler),
* letterbox collate into STATIC shapes: uint8 (B, H, W, 3) images and a
  -1-padded float32 (B, M, 6) annotation tensor [x1, y1, x2, y2, cls,
  img_idx] with a fixed M (the reference pads to the per-batch max, which is
  a dynamic shape — fatal under jit; overflow boxes are dropped),
* a thread-pool worker + double-buffered `jax.device_put` prefetch —
  normalization (/255) happens on device in the train step, so host->device
  traffic stays uint8 (4x smaller than the reference's f32 transfer).
"""

from __future__ import annotations

import itertools
import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue

import numpy as np

from ..ops.letterbox import letterbox_boxes, letterbox_image

__all__ = ["infinite_indices", "collate_batch", "collate_plan_batch",
           "DataLoader"]


# ---- process-worker plumbing (fork): the dataset is inherited by the child
# at fork time via this module global, so nothing heavy crosses the pipe on
# every task — only (idx, sample_id, seed) in and the augmented sample out.
_WORKER_DATASET = None
_WORKER_AUG = None


def _worker_init(dataset, enable_aug):
    global _WORKER_DATASET, _WORKER_AUG
    _WORKER_DATASET = dataset
    _WORKER_AUG = enable_aug


def _worker_load(args):
    idx, sample_id, seed, enable_aug, plan_mode, with_pixels = args
    rng = np.random.default_rng((seed, sample_id))
    if plan_mode:
        from .device_aug import plan_sample

        return plan_sample(_WORKER_DATASET, idx, rng,
                           with_pixels=with_pixels)
    return _WORKER_DATASET.get(idx, rng, enable_aug=enable_aug)


def infinite_indices(size: int, seed: int, rank: int = 0, world_size: int = 1,
                     shuffle: bool = True):
    """Seeded infinite index stream, rank-sharded
    (dataset/data_sampler.py:106-159)."""
    rng = np.random.default_rng(seed)

    def stream():
        while True:
            if shuffle:
                yield from rng.permutation(size).tolist()
            else:
                yield from range(size)

    return itertools.islice(stream(), rank, None, world_size)


def collate_batch(samples, dst_size, max_labels: int, stride: int = 32,
                  fill_value: int = 114):
    """Letterbox + pad into fixed shapes (dataset/data_collater.py:21-66).

    samples: list of (img uint8, boxes (N,4) xyxy, classes (N,)).
    Returns dict with:
      img  uint8 (B, H, W, 3),
      ann  float32 (B, M, 6) [x1,y1,x2,y2,cls,img_idx], -1 padded,
      info float32 (B, 5) [scale, pad_left, pad_top, org_w, org_h].
    """
    batch = len(samples)
    h, w = dst_size if not isinstance(dst_size, int) else (dst_size, dst_size)
    imgs = np.empty((batch, h, w, 3), dtype=np.uint8)
    anns = np.full((batch, max_labels, 6), -1.0, dtype=np.float32)
    infos = np.empty((batch, 5), dtype=np.float32)
    n_dropped = 0

    for i, (img, boxes, classes) in enumerate(samples):
        out, info = letterbox_image(
            img, (h, w), stride=stride, fill_value=fill_value, training=True
        )
        assert out.shape[:2] == (h, w), (
            f"letterbox produced {out.shape}, expected {(h, w)}; "
            "dst_size must already be stride-aligned for static batching"
        )
        imgs[i] = out
        infos[i] = info.as_array()
        n = min(len(boxes), max_labels)
        n_dropped += len(boxes) - n
        if n:
            lb = letterbox_boxes(boxes[:n], info)
            anns[i, :n, 0:4] = lb
            anns[i, :n, 4] = classes[:n]
            anns[i, :n, 5] = i
    return {"img": imgs, "ann": anns, "info": infos, "n_dropped": n_dropped}


def collate_plan_batch(samples, dst_size, max_labels: int, stride: int = 32):
    """Stack device-aug plans (data/device_aug.py) into one fixed-shape
    batch. Boxes are letterboxed on host with the SAME arithmetic as
    collate_batch (per-sample plane size -> dst); pixels stay as uint8
    tiles + a parameter record until `render_batch` runs on device.

    samples: list of (plan dict, boxes (N,4), classes (N,), plane_hw).
    Returns dict with plan {...}, ann (B,M,6) f32, info (B,5) f32, and —
    for pixel plans — tiles (B,8,th,tw,3) u8 (device-cache plans carry
    img_ids/tile_off inside the plan instead).
    """
    from ..ops.preprocess import letterbox_plan

    batch = len(samples)
    h, w = dst_size if not isinstance(dst_size, int) else (dst_size, dst_size)
    anns = np.full((batch, max_labels, 6), -1.0, dtype=np.float32)
    infos = np.empty((batch, 5), dtype=np.float32)
    lbox = np.empty((batch, 3), dtype=np.float32)
    n_dropped = 0

    for i, (plan, boxes, classes, plane_hw) in enumerate(samples):
        info = letterbox_plan(plane_hw, (h, w), stride=stride)
        infos[i] = info.as_array()
        lbox[i] = (info.scale, info.pad_left, info.pad_top)
        n = min(len(boxes), max_labels)
        n_dropped += len(boxes) - n
        if n:
            lb = letterbox_boxes(boxes[:n], info)
            anns[i, :n, 0:4] = lb
            anns[i, :n, 4] = classes[:n]
            anns[i, :n, 5] = i

    plan = {k: np.stack([s[0][k] for s in samples]) for k in samples[0][0]}
    plan["lbox"] = lbox
    batch = {"plan": plan, "ann": anns, "info": infos,
             "dst_hw": (h, w), "n_dropped": n_dropped}
    if "tiles" in plan:
        batch["tiles"] = plan.pop("tiles")
    return batch


class DataLoader:
    """Threaded, double-buffered loader producing device-ready fixed batches.

    One instance per host process; under multi-host data parallelism give
    each host its (rank, world_size) so index streams don't overlap.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        max_labels: int = 300,
        seed: int = 7,
        rank: int = 0,
        world_size: int = 1,
        workers: int = 8,
        shuffle: bool = True,
        infinite: bool = True,
        enable_aug: bool | None = None,
        prefetch: int = 2,
        device_put=None,
        use_processes: bool | None = None,
        device_aug: bool = False,
        device_cache: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_labels = max_labels
        self.seed = seed
        self.infinite = infinite
        self.shuffle = shuffle
        self.rank = rank
        self.world_size = world_size
        self._enable_aug = (
            dataset.enable_aug if enable_aug is None else enable_aug
        )
        # device_aug: workers emit augmentation PLANS (host does only the
        # O(#boxes) work); the consumer renders pixels on the TPU with
        # data.device_aug.render_batch. See device_aug.py for the why.
        self.device_aug = bool(device_aug)
        # device_cache: plans carry image INDICES into the chip-resident
        # dataset cache instead of pixel tiles — nothing but scalars and
        # labels cross the host<->device boundary per batch
        self.device_cache = bool(device_cache) and self.device_aug
        if self.device_aug:
            from .device_aug import device_aug_supported

            if not device_aug_supported(dataset.aug):
                # documented contract (device_aug.py): unsupported knob
                # combinations FALL BACK to the host pipeline with a
                # warning rather than erroring a run that would work
                import warnings

                warnings.warn(
                    "device_aug disabled for this run: blur_p/"
                    "scale_jitting_p > 0 need the staged renderer, which "
                    "requires perspective_p == 1.0 or mosaic_p == 0.0 "
                    "(the sample plane must fit the input-size buffer); "
                    "falling back to host augmentation",
                    stacklevel=2,
                )
                self.device_aug = False
                self.device_cache = False
        if self.device_cache and dataset._cache is None:
            raise ValueError(
                "device_cache needs the dataset image cache "
                "(cache_images=True): plans index cached images"
            )
        # augmentation is CPU-bound numpy/cv2: Python threads serialize on
        # the GIL, so real throughput needs PROCESS workers (the reference's
        # torch DataLoader num_workers are processes too). Default: processes
        # when >1 worker and fork is available; threads otherwise (tiny test
        # datasets, platforms without fork).
        import multiprocessing as mp
        import os

        if use_processes is None:
            # processes only pay off with real parallelism: on a 1-core
            # machine fork overhead dominates (and tests run there)
            use_processes = (
                workers > 1
                and (os.cpu_count() or 1) > 1
                and mp.get_start_method(False) in ("fork", None)
            )
        self._proc_pool = None
        if use_processes:
            ctx = mp.get_context("fork")
            self._proc_pool = ctx.Pool(
                workers, initializer=_worker_init,
                initargs=(dataset, self._enable_aug),
            )
        self._pool = ThreadPoolExecutor(max_workers=workers)
        self._queue: Queue = Queue(maxsize=prefetch)
        self._device_put = device_put
        self._stop = threading.Event()
        self._sample_counter = 0
        self.dropped_boxes = 0  # boxes lost to max_labels truncation
        self._warned_drop = False
        # mutable per-batch letterbox size (multi-scale training,
        # train_yolov5.py:526-544 — bucketed static sizes under jit)
        self._input_size = tuple(dataset.input_size)
        self._producer = threading.Thread(target=self._produce, daemon=True)
        self._producer.start()

    def set_input_size(self, size):
        """Change the collate letterbox size for subsequently produced
        batches (each distinct size compiles its own train step)."""
        if isinstance(size, int):
            size = (size, size)
        self._input_size = tuple(size)

    def __len__(self):
        """Batches per epoch (drop_last semantics)."""
        return max(
            len(self.dataset) // (self.batch_size * self.world_size), 1
        )

    def close_data_aug(self):
        """Turn off mosaic/mixup for the no-aug tail epochs
        (train_yolov5.py:286-292)."""
        self._enable_aug = False

    def _load_one(self, idx: int, sample_id: int, plan_mode: bool = False):
        rng = np.random.default_rng((self.seed, sample_id))
        if plan_mode:
            from .device_aug import plan_sample

            return plan_sample(self.dataset, idx, rng,
                               with_pixels=not self.device_cache)
        return self.dataset.get(idx, rng, enable_aug=self._enable_aug)

    def _produce(self):
        indices = infinite_indices(
            len(self.dataset), self.seed, self.rank, self.world_size, self.shuffle
        )
        if not self.infinite:
            total = len(self) * self.batch_size
            indices = itertools.islice(indices, total)
        while not self._stop.is_set():
            chunk = list(itertools.islice(indices, self.batch_size))
            if len(chunk) < self.batch_size:
                self._queue.put(None)
                return
            ids = range(self._sample_counter, self._sample_counter + len(chunk))
            self._sample_counter += len(chunk)
            plan_mode = self.device_aug and self._enable_aug
            try:
                if self._proc_pool is not None:
                    samples = self._proc_pool.map(
                        _worker_load,
                        [(i, sid, self.seed, self._enable_aug, plan_mode,
                          not self.device_cache)
                         for i, sid in zip(chunk, ids)],
                    )
                else:
                    samples = list(self._pool.map(
                        self._load_one, chunk, ids,
                        itertools.repeat(plan_mode, len(chunk)),
                    ))
            except Exception as e:  # noqa: BLE001
                if self._stop.is_set():
                    # pool shut down mid-map by stop(): benign exit
                    return
                # a real worker failure: surface it to the consumer instead
                # of exiting silently (which would hang __next__ forever)
                self._queue.put(e)
                return
            if plan_mode:
                batch = collate_plan_batch(
                    samples, self._input_size, self.max_labels
                )
            else:
                batch = collate_batch(
                    samples,
                    self._input_size,
                    self.max_labels,
                    fill_value=self.dataset.aug.fill_value,
                )
            # surface max_labels overflow instead of silently truncating
            # (reference pads to per-batch max; we keep static M for jit)
            dropped = batch.pop("n_dropped")
            if dropped:
                self.dropped_boxes += dropped
                if not self._warned_drop:
                    self._warned_drop = True
                    import warnings

                    warnings.warn(
                        f"collate dropped {dropped} boxes beyond "
                        f"max_labels={self.max_labels} in one batch; raise "
                        "max_labels if this persists (total tracked in "
                        "DataLoader.dropped_boxes)",
                        stacklevel=1,
                    )
            if self._device_put is not None:
                batch = self._device_put(batch)
            self._queue.put(batch)

    def __iter__(self):
        return self

    def __next__(self):
        batch = self._queue.get()
        if batch is None:
            raise StopIteration
        if isinstance(batch, Exception):
            raise batch
        return batch

    def restart(self):
        """Re-arm a finite loader for another pass, reusing the worker
        pools (a val loader is used once per epoch with `val_every: 1`;
        rebuilding it would pay a process-pool spin-up every call)."""
        if self.infinite:
            raise ValueError("restart() only applies to finite loaders")
        # stop a possibly still-running pass (early consumer exit leaves the
        # producer blocked on queue.put) and drain everything it buffered
        self._stop.set()
        while self._producer.is_alive():
            try:
                self._queue.get(timeout=0.1)
            except Exception:
                pass
        try:
            while True:
                self._queue.get_nowait()
        except Exception:
            pass
        self._stop.clear()
        self._sample_counter = 0  # identical (seed, sample) RNG streams
        self._producer = threading.Thread(target=self._produce, daemon=True)
        self._producer.start()

    def stop(self):
        self._stop.set()
        # drain so the producer can exit
        try:
            while True:
                self._queue.get_nowait()
        except Exception:
            pass
        if self._proc_pool is not None:
            self._proc_pool.terminate()
        self._pool.shutdown(wait=False)
