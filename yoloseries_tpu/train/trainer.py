"""The single Trainer — replaces the reference's six ~860-line Training
god-classes (train_{yolov5,yolov7,yolov8,yolox,fcos,retinanet_experiment}.py)
with ONE loop parameterized by (model name, loss, decoder).

Structure vs the reference (call stack SURVEY §3.1):
* before_train -> __init__: data loaders, mesh, model/state/optimizer build
* step() epoch/iter loop -> train(): device-sharded batches through ONE
  jitted train step (forward + assign + loss + grad + optimizer + EMA
  fused; gradient accumulation via lax.scan inside the step)
* after_epoch mAP eval -> evaluate(): EMA params, on-device decode+NMS,
  host mAP_v2-equivalent metrics
* save/load -> orbax checkpoints of the whole TrainState.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # avoid circular import (configs builds typed sub-configs)
    from ..configs.config import TrainConfig

from ..data.dataset import DetectionDataset
from ..data.loader import DataLoader
from ..evaluation.yolov5 import Evaluator
from ..families import get_family
from ..models import create_model
from ..ops.metrics import DetectionMetrics
from ..parallel.mesh import batch_sharding, make_mesh, replicate_state
from ..utils.meters import MeterBuffer
from .checkpoint import restore_checkpoint, save_checkpoint
from .optim import build_optimizer
from .state import create_train_state, make_train_step

__all__ = ["Trainer"]


class Trainer:
    def __init__(
        self,
        cfg: "TrainConfig",
        train_dirs: tuple,  # (img_dir, lab_dir)
        val_dirs: tuple | None = None,
        names_path=None,
        model_name: str | None = None,
        compute_dtype=jnp.float32,
        log_fn=print,
    ):
        self.cfg = cfg
        # per-rank log file (train_yolov5.py:132-150 writes under
        # log/log_rank_{r}/): tee every log line into
        # {output_dir}/log/log_rank_{process_index}/train.log
        self._log_file = None
        if cfg.hyp.get("save_log_txt", True):
            log_dir = (
                Path(cfg.output_dir) / "log" / f"log_rank_{jax.process_index()}"
            )
            log_dir.mkdir(parents=True, exist_ok=True)
            self._log_file = open(log_dir / "train.log", "a", buffering=1)

        def log(*parts):
            log_fn(*parts)
            if self._log_file is not None:
                print(
                    time.strftime("%Y-%m-%d %H:%M:%S"), *parts,
                    file=self._log_file,
                )

        self.log = log

        self.train_dataset = DetectionDataset(
            train_dirs[0], train_dirs[1], names_path,
            input_size=cfg.input_size, aug=cfg.aug, enable_aug=True,
            # the val dataset stays uncached: eval letterboxes from the
            # ORIGINAL resolution (protocol numerics)
            cache_images=cfg.cache_images,
        )
        self.num_class = self.train_dataset.num_class
        self.val_dataset = None
        if val_dirs is not None:
            self.val_dataset = DetectionDataset(
                val_dirs[0], val_dirs[1], names_path,
                input_size=cfg.input_size, aug=cfg.aug, enable_aug=False,
            )

        self.mesh = make_mesh()
        self.n_devices = len(self.mesh.devices.ravel())
        assert cfg.batch_size % self.n_devices == 0, (
            f"global batch {cfg.batch_size} must divide over "
            f"{self.n_devices} devices"
        )

        self.train_loader = DataLoader(
            self.train_dataset,
            batch_size=cfg.batch_size * cfg.accumulate,
            max_labels=cfg.max_labels,
            seed=cfg.seed,
            rank=jax.process_index(),
            world_size=jax.process_count(),
            workers=cfg.num_workers,
            device_aug=cfg.device_aug,
            device_cache=cfg.device_cache,
        )
        # device_cache: one-time upload of the resized train set; per-batch
        # host->device traffic is then plan scalars + labels only
        self._dev_cache = None
        if self.train_loader.device_cache:
            from ..parallel.mesh import replicated

            self._dev_cache = jax.device_put(
                np.asarray(self.train_dataset._cache),
                replicated(self.mesh),
            )
        # the loader shards indices by world_size, so an epoch on this host
        # only sees len(dataset)/world_size samples (DataLoader.__len__)
        self.steps_per_epoch = max(
            len(self.train_dataset)
            // (cfg.batch_size * cfg.accumulate * jax.process_count()),
            1,
        )
        # rebuild optim config with the real steps_per_epoch
        cfg.optim = type(cfg.optim)(
            **{**cfg.optim.__dict__, "steps_per_epoch": self.steps_per_epoch}
        )

        resolved_name = model_name or cfg.model
        model_kw = dict(num_class=self.num_class, dtype=compute_dtype)
        perf_kw = {}
        if cfg.remat:
            perf_kw["remat"] = True
        if cfg.hyp.get("s2d_stem", False):
            perf_kw["s2d_stem"] = True
        try:
            self.model = create_model(resolved_name, **perf_kw, **model_kw)
        except TypeError:
            if not perf_kw:
                raise
            # family without the remat/s2d knobs yet
            self.log(
                f"{sorted(perf_kw)} requested but {resolved_name} does not "
                "support it; continuing without"
            )
            self.model = create_model(resolved_name, **model_kw)
        tx_params = self.model.init(
            jax.random.PRNGKey(cfg.seed),
            jnp.zeros((1, *cfg.input_size, 3)),
            train=False,
        )["params"]
        self.tx = build_optimizer(cfg.optim, tx_params)

        # family adapter: loss closure + decode closure for this model;
        # hyp['family'] overrides for custom-registered models whose name
        # doesn't start with a known family prefix
        self.family = get_family(resolved_name, default=cfg.hyp.get("family"))
        loss_fn, balances0 = self.family.make_loss(
            cfg.hyp, self.num_class, cfg.input_size
        )
        decode_fn = self.family.make_decode(cfg.hyp, self.num_class, cfg.input_size)

        self.state = create_train_state(
            self.model, self.tx, jax.random.PRNGKey(cfg.seed),
            (1, *cfg.input_size, 3), balances=balances0,
        )
        self._compute_dtype = compute_dtype
        # `per_replica_bn: true` selects the DDP-semantics shard_map step
        # (per-device BN stats + pmean grads — the reference's exact training
        # dynamics); default is the pjit path (global-batch BN).
        self.per_replica_bn = bool(cfg.hyp.get("per_replica_bn", False))
        if self.per_replica_bn:
            from .ddp import make_ddp_train_step, shard_ddp_state

            self.state = shard_ddp_state(self.state, self.mesh)
            self._step_fns = {
                tuple(cfg.input_size): make_ddp_train_step(
                    loss_fn, self.mesh, self.model.apply, self.tx,
                    accumulate=cfg.accumulate,
                    do_ema=cfg.do_ema, compute_dtype=compute_dtype,
                )
            }
        else:
            self.state = replicate_state(self.state, self.mesh)
            self._step_fns = {
                tuple(cfg.input_size): make_train_step(
                    loss_fn, accumulate=cfg.accumulate,
                    do_ema=cfg.do_ema, compute_dtype=compute_dtype,
                )
            }
        # multi-scale training (train_yolov5.py:526-544): the reference
        # samples a fresh /32 size in [0.5x, 1.5x+32) EVERY iteration (:321,
        # :538) and bilinearly interpolates the collated batch + targets.
        # jit needs static shapes, so each /32 bucket gets its own compiled
        # step. Two modes (multi_scale_mode):
        # * "interpolate" (default): the reference's exact numerics — the
        #   loader always collates at base size and the jitted step resizes
        #   the batch on device (state.make_train_step resize_to),
        # * "collate": re-letterbox subsequent batches at the new size
        #   (higher-fidelity pixels, non-reference dynamics; size redrawn
        #   every 10 iterations to bound collate churn).
        self.multi_scale_sizes = []
        if cfg.hyp.get("mutil_scale_training") or cfg.hyp.get("multi_scale_training"):
            base = cfg.input_size[0]
            lo = max(round(base * 0.5 / 32) * 32, 64)
            hi = round(base * 1.5 / 32) * 32
            self.multi_scale_sizes = list(range(lo, hi + 1, 32))
        self.multi_scale_mode = cfg.hyp.get("multi_scale_mode", "interpolate")
        assert self.multi_scale_mode in ("interpolate", "collate")
        self._ms_rng = np.random.default_rng(cfg.seed + 1)

        self.batch_shard = batch_sharding(self.mesh)
        self.meters = MeterBuffer()
        select_builder = (
            self.family.make_select(cfg.hyp, self.num_class, cfg.input_size)
            if self.family.make_select else None
        )
        eval_cfg = self.family.apply_eval_overrides(cfg.eval, cfg.hyp)
        self.evaluator = Evaluator(
            self.model.apply, decode_fn, eval_cfg,
            select_fn=select_builder(eval_cfg) if select_builder else None,
        )
        self.start_epoch = 0
        self.ckpt_dir = Path(cfg.output_dir) / "checkpoints"

        # observability: TensorBoard scalars (train_yolov5.py:213-214,
        # 520-524) and an optional jax.profiler trace window (the reference
        # gates torch.profiler behind enable_profiler, train_yolov8.py:286-291)
        self.writer = None
        if cfg.hyp.get("enable_tensorboard") and jax.process_index() == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(
                    log_dir=str(Path(cfg.output_dir) / "tb")
                )
            except Exception as err:  # torch TB is optional
                self.log(f"tensorboard disabled: {err}")
        self._profile_steps = cfg.hyp.get("enable_profiler", 0)
        self._profile_dir = str(Path(cfg.output_dir) / "profile")
        # in-epoch progress line every save_log_every iterations
        # (train_yolov5.py:409-417 update_logger)
        self._log_every = int(cfg.hyp.get("save_log_every", 50) or 0)
        self._train_t0 = None
        # deferred (global_it, data_t, iter_t, device-metrics) tuples,
        # flushed into meters/TB at logging points (async dispatch)
        self._pending = []

        # header: formatted config + model summary into the per-rank log
        # (train_yolov5.py:132-150 behavior)
        if self._log_file is not None:
            from ..utils.summary import format_hyp_table, summarize_model

            print(format_hyp_table(cfg.hyp), file=self._log_file)
            try:
                s = summarize_model(self.model, (1, *cfg.input_size, 3))
                print(
                    f"model {resolved_name}: {s['params']:,} params, "
                    f"{s['gflops']:.2f} GFLOPs @ {cfg.input_size}",
                    file=self._log_file,
                )
            except Exception as err:  # summary is best-effort
                print(f"model summary unavailable: {err}", file=self._log_file)

    def _step_fn_for(self, size):
        """Compiled train step for one multi-scale bucket. In interpolate
        mode the step resizes the base-size batch to ``size`` on device; in
        collate mode the batch already arrives at ``size``."""
        size = tuple(size)
        if size not in self._step_fns:
            base = tuple(self.cfg.input_size)
            resize_to = (
                size if self.multi_scale_mode == "interpolate"
                and size != base else None
            )
            loss_fn, _ = self.family.make_loss(self.cfg.hyp, self.num_class, size)
            if self.per_replica_bn:
                from .ddp import make_ddp_train_step

                self._step_fns[size] = make_ddp_train_step(
                    loss_fn, self.mesh, self.model.apply, self.tx,
                    accumulate=self.cfg.accumulate,
                    do_ema=self.cfg.do_ema, compute_dtype=self._compute_dtype,
                    resize_to=resize_to, base_hw=base,
                )
            else:
                self._step_fns[size] = make_train_step(
                    loss_fn, accumulate=self.cfg.accumulate,
                    do_ema=self.cfg.do_ema, compute_dtype=self._compute_dtype,
                    resize_to=resize_to, base_hw=base,
                )
        return self._step_fns[size]

    # ------------------------------------------------------------------ io
    def save(self, step: int):
        if jax.process_index() == 0:
            save_checkpoint(self.ckpt_dir, self.state, step, hyp=self.cfg.hyp)

    def load(self):
        self.state, step = restore_checkpoint(self.ckpt_dir, self.state)
        if step is not None:
            self.start_epoch = int(step) // self.steps_per_epoch
            self.log(f"resumed from step {step} (epoch {self.start_epoch})")

    # --------------------------------------------------------------- train
    def _device_batch(self, batch):
        if "plan" in batch:  # device_aug plan batch: render pixels on-TPU
            from ..data.device_aug import (
                render_batch,
                render_method,
                render_staged,
            )

            fill = self.train_dataset.aug.fill_value
            plan = {
                k: jax.device_put(v, self.batch_shard)
                for k, v in batch["plan"].items()
            }
            img = render_batch(
                jax.device_put(batch["tiles"], self.batch_shard)
                if "tiles" in batch else None,
                plan,
                out_hw=tuple(batch["dst_hw"]),
                tile_hw=tuple(self.train_dataset.input_size),
                fill=fill,
                lb_fill=fill,
                method=render_method(self.train_dataset.aug),
                cache=self._dev_cache,
                staged=render_staged(self.train_dataset.aug),
            )
            return {"img": img,
                    "ann": jax.device_put(batch["ann"], self.batch_shard)}
        return {
            "img": jax.device_put(batch["img"], self.batch_shard),
            "ann": jax.device_put(batch["ann"], self.batch_shard),
        }

    def _flush_metrics(self):
        """Pull all queued device-side metric scalars to host and feed the
        meters / TensorBoard writer. One blocking transfer per flush instead
        of one per step."""
        if not self._pending:
            return
        pending, self._pending = self._pending, []
        host = jax.device_get([m for (_, _, _, m) in pending])
        for (global_it, t_data, t_iter, _), metrics in zip(pending, host):
            metrics = {k: float(v) for k, v in metrics.items()}
            self.meters.update(data_time=t_data, iter_time=t_iter, **metrics)
            if self.writer is not None:
                for k, v in metrics.items():
                    self.writer.add_scalar(f"train/{k}", v, global_it)

    def _current_lr(self, global_it: int) -> float:
        """The 'other'-group lr at this iteration, evaluated from the SAME
        `_group_schedule` closure build_optimizer injects into optax — the
        logged lr cannot drift from the optimizer if optim.py changes."""
        if getattr(self, "_lr_schedule", None) is None:
            from .optim import _group_schedule

            self._lr_schedule = _group_schedule(self.cfg.optim, 0.0)
        return float(self._lr_schedule(global_it))

    def _log_progress(self, epoch, total, it, global_it, batch):
        """Periodic in-epoch progress line (train_yolov5.py:409-417): percent
        of the whole run, losses, lr, iteration/data time, input size, ETA."""
        total_iters = total * self.steps_per_epoch
        done = global_it + 1
        iter_t = self.meters["iter_time"].avg
        eta_s = (total_iters - done) * iter_t if iter_t else 0.0
        eta = time.strftime("%H:%M:%S", time.gmtime(min(eta_s, 86399)))
        if eta_s >= 86400:
            eta = f"{int(eta_s // 86400)}d {eta}"
        self.log(
            f"[{epoch + 1:>3d}/{total}] {done / total_iters:6.2%} "
            f"it {it + 1}/{self.steps_per_epoch} "
            f"loss {self.meters['tot_loss'].latest:.3f} "
            f"lr {self._current_lr(global_it):.3e} "
            f"size {getattr(self, '_last_train_size', batch['img'].shape[1])} "
            f"iter {iter_t:.3f}s data {self.meters['data_time'].avg:.3f}s "
            f"eta {eta}"
        )

    def precompile_multi_scale(self):
        """Compile every multi-scale bucket's train step up front.

        Multi-scale training touches up to ~21 /32-bucket shapes at 640
        (train_yolov5.py:536-543); by default each bucket pays its compile
        on first encounter, scattering multi-second (worse over a tunneled
        chip: multi-minute) stalls through the first epoch. This runs one
        dummy step per bucket against a throwaway copy of the state —
        populating the jit and persistent compile caches — so the epoch
        loop runs stall-free. Opt in with `precompile_multi_scale: true`.
        """
        sizes = self.multi_scale_sizes or [self.cfg.input_size[0]]
        b = self.cfg.batch_size * self.cfg.accumulate
        m = self.cfg.max_labels
        # throwaway state: donation invalidates it, the real state is untouched
        tmp = jax.tree.map(jnp.copy, self.state)
        for s in sizes:
            t0 = time.time()
            # interpolate mode feeds every bucket BASE-size batches
            bs = (self.cfg.input_size[0]
                  if self.multi_scale_mode == "interpolate" else s)
            batch = self._device_batch({
                "img": np.zeros((b, bs, bs, 3), np.uint8),
                "ann": np.full((b, m, 6), -1.0, np.float32),
            })
            tmp, _ = self._step_fn_for((s, s))(tmp, batch)
            jax.block_until_ready(tmp.step)
            self.log(f"precompiled train step @ {s}px in {time.time() - t0:.1f}s")
        del tmp

    def train(self, epochs: int | None = None, eval_fn=None):
        cfg = self.cfg
        total = epochs or cfg.total_epochs
        if cfg.hyp.get("precompile_multi_scale") and self.start_epoch == 0:
            self.precompile_multi_scale()
        aug_closed = False
        for epoch in range(self.start_epoch, total):
            if (
                not aug_closed
                and cfg.no_aug_epochs > 0
                and epoch >= total - cfg.no_aug_epochs
            ):
                self.train_loader.close_data_aug()
                aug_closed = True
                self.log("data augmentation closed for final epochs")
                self.save(epoch * self.steps_per_epoch)

            t_epoch = time.time()
            for it in range(self.steps_per_epoch):
                global_it = epoch * self.steps_per_epoch + it
                step_size = None
                if self.multi_scale_sizes:
                    if self.multi_scale_mode == "interpolate":
                        # fresh size EVERY iteration, resized on device
                        # inside the step (reference :321, :536-543)
                        s = int(self._ms_rng.choice(self.multi_scale_sizes))
                        step_size = (s, s)
                    elif global_it % 10 == 0:
                        s = int(self._ms_rng.choice(self.multi_scale_sizes))
                        self.train_loader.set_input_size(s)
                if self._profile_steps and global_it == 1:
                    jax.profiler.start_trace(self._profile_dir)
                t0 = time.time()
                batch = self._device_batch(next(self.train_loader))
                t_data = time.time() - t0
                train_size = tuple(step_size or batch["img"].shape[1:3])
                self._last_train_size = train_size[0]
                step_fn = self._step_fn_for(train_size)
                self.state, metrics = step_fn(self.state, batch)
                # ASYNC DISPATCH: don't pull metric scalars here — a host
                # sync per step serializes dispatch latency into the step
                # time (~30 ms/step on a tunneled chip). Device-side scalars
                # queue up and are flushed at logging points, so steps chain
                # on-device back to back.
                self._pending.append((global_it, t_data, time.time() - t0, metrics))
                if self._profile_steps and global_it == 1 + self._profile_steps:
                    jax.profiler.stop_trace()
                    self.log(f"profiler trace saved to {self._profile_dir}")
                if self._log_every and (global_it + 1) % self._log_every == 0:
                    self._flush_metrics()
                    self._log_progress(epoch, total, it, global_it, batch)
            self._flush_metrics()
            step = int(self.state.step)
            parts = " ".join(
                f"{k.replace('_loss', '')} {self.meters[k].avg:.3f}"
                for k in sorted(metrics)
                if k.endswith("_loss") and k != "tot_loss"
            )
            self.log(
                f"epoch {epoch + 1}/{total} "
                f"loss {self.meters['tot_loss'].avg:.3f} ({parts}) "
                f"targets {self.meters['tar_nums'].avg:.0f} "
                f"{time.time() - t_epoch:.1f}s"
            )
            if (epoch + 1) % cfg.save_every == 0:
                self.save(step)
            if eval_fn is not None and (epoch + 1) % cfg.val_every == 0:
                eval_fn(self)
        return self.state

    # ---------------------------------------------------------------- eval
    def eval_variables(self):
        """EMA weights if tracked, else live weights (train_yolov5.py:688-693).
        Under per-replica BN, stats are averaged across replicas first
        (all_reduce_norm's pre-eval sync, utils/allreduce_norm.py:91)."""
        if self.cfg.do_ema:
            stats = self.state.ema_batch_stats
        else:
            stats = self.state.batch_stats
        if self.per_replica_bn:
            from .ddp import sync_replica_stats

            stats = sync_replica_stats(stats)
        params = self.state.ema_params if self.cfg.do_ema else self.state.params
        return {"params": params, "batch_stats": stats}

    @staticmethod
    def _accumulate_eval(metrics, dets, batch):
        """Pull one batch's detections to host and add (gt, pred) pairs."""
        preds = Evaluator.to_host_detections(dets, batch["info"])
        anns = batch["ann"]
        for i in range(len(preds)):
            valid = anns[i][:, 4] >= 0
            gt = anns[i][valid]
            # un-letterbox gt like preds_postprocess (train_yolov5.py:631-647)
            scale, pl, pt, ow, oh = batch["info"][i]
            g = np.zeros((valid.sum(), 5), dtype=np.float64)
            g[:, 0] = ((gt[:, 0] - pl) / scale).clip(0, ow)
            g[:, 1] = ((gt[:, 1] - pt) / scale).clip(0, oh)
            g[:, 2] = ((gt[:, 2] - pl) / scale).clip(0, ow)
            g[:, 3] = ((gt[:, 3] - pt) / scale).clip(0, oh)
            g[:, 4] = gt[:, 4]
            metrics.add_image(g, preds[i])

    def evaluate(self, max_batches: int | None = None) -> dict:
        """mAP over the val set with reference thresholds (val protocol)."""
        assert self.val_dataset is not None, "no val dirs configured"
        # persistent val loader: with `val_every: 1` a fresh DataLoader per
        # call would spin up and tear down a process pool every epoch
        if getattr(self, "_val_loader", None) is None:
            # rank-sharded: each host evaluates len(val)/world_size images
            # and metrics.gather_across_processes() merges before compute —
            # NOT every host redundantly scoring the full set (reference
            # shards via its sampler + utils/dist.py gather)
            self._val_loader = DataLoader(
                self.val_dataset, batch_size=self.cfg.batch_size,
                max_labels=self.cfg.max_labels, workers=self.cfg.num_workers,
                shuffle=False, infinite=False, enable_aug=False,
                rank=jax.process_index(), world_size=jax.process_count(),
            )
        else:
            self._val_loader.restart()
        loader = self._val_loader
        variables = self.eval_variables()
        metrics = DetectionMetrics()
        # pipelined: submit batch i's jitted eval, then pull batch i-1's
        # detections to host while i runs (same async-dispatch rationale
        # as the train loop — a per-batch host sync serializes dispatch
        # latency into every eval step). The loader stays alive for the
        # next evaluate() call; Trainer.close() stops it.
        pending = None
        for bi, batch in enumerate(loader):
            if max_batches is not None and bi >= max_batches:
                break
            dets = self.evaluator(variables, batch["img"])
            if pending is not None:
                self._accumulate_eval(metrics, *pending)
            pending = (dets, batch)
        if pending is not None:
            self._accumulate_eval(metrics, *pending)
        out = metrics.gather_across_processes().compute()
        self.log(
            f"mAP {out['map']:.4f} mAP50 {out['map50']:.4f} "
            f"P {out['mp']:.4f} R {out['mr']:.4f}"
        )
        return out

    def close(self):
        """Stop loader worker pools (train + persistent val)."""
        self.train_loader.stop()
        if getattr(self, "_val_loader", None) is not None:
            self._val_loader.stop()
            self._val_loader = None
