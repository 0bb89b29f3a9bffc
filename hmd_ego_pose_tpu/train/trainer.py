"""The training orchestrator: epoch loop, per-epoch eval, checkpointing, LR.

Functional equivalent of the reference loop (pytorch-sandbox/train.py:88-342):
10x-oversampled epochs, full validation each epoch via the metrics engine,
ReduceLROnPlateau stepped on MixedAveragePointDistanceMean, best-metric
checkpointing with metric-encoded names, scalar logging.

TPU specifics: batches are sharded over the data axis of the mesh before
each step (params replicated); the train step is one donated jit call; the
input pipeline prefetches on background threads so the device never idles on
the host.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax

from hmd_ego_pose_tpu.config import Config
from hmd_ego_pose_tpu.data.pipeline import InputPipeline
from hmd_ego_pose_tpu.eval.evaluator import EvalResult, evaluate_model
from hmd_ego_pose_tpu.models import hmd_ego_pose
from hmd_ego_pose_tpu.train.checkpoint import checkpoint_name, save_checkpoint
from hmd_ego_pose_tpu.train.plateau import ReduceLROnPlateau
from hmd_ego_pose_tpu.train.state import set_learning_rate
from hmd_ego_pose_tpu.train.step import make_epoch_runner, make_eval_forward, make_train_step
from hmd_ego_pose_tpu.utils.logging import MetricLogger


class Trainer:
    def __init__(
        self,
        config: Config,
        train_dataset,
        val_dataset,
        mesh=None,
        logger: Optional[MetricLogger] = None,
        params=None,
        bn_state=None,
        opt_leaves=None,
        start_step: int = 0,
    ):
        self.config = config
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.mesh = mesh
        self.logger = logger or MetricLogger()

        if params is None:
            # int seed: the key is created host-side (accelerator-resident
            # keys force on-device init; see hmd_ego_pose.init docstring)
            params, bn_state = hmd_ego_pose.init(config.train.seed, config.model)
        model_points = train_dataset.model_points_for_loss(config.train.loss.num_model_points)

        # a mesh shards batches over the data axis on EVERY training path
        # (device-resident epoch runner or host pipeline), so check
        # divisibility up front — the host path would otherwise die later
        # inside GSPMD with an opaque dimension error
        if mesh is not None and config.train.batch_size % mesh.shape[mesh.axis_names[0]]:
            raise ValueError(
                f"batch_size {config.train.batch_size} not divisible by "
                f"data-axis size {mesh.shape[mesh.axis_names[0]]}"
            )

        # HBM-resident dataset: upload once (replicated across the mesh when
        # data-parallel), gather batches by index on device.  Datasets whose
        # decoded frames exceed the per-device budget stay TPU-native via
        # WINDOWED residency: the host keeps the decoded cache and uploads
        # one random frame window per epoch segment (shard-shuffle
        # semantics — each step samples within the resident window; windows
        # repartition every epoch), instead of falling back to the ~50 img/s
        # per-step host pipeline.
        self._device_data = None
        self._host_cache = None
        self._window_frames = 0
        if config.data.device_resident and config.data.device_augment:
            from hmd_ego_pose_tpu.data.device_dataset import (
                build_host_cache, upload_window,
            )

            cache = build_host_cache(train_dataset, config.data.max_objects)
            budget = config.data.device_resident_budget_bytes
            if sum(a.nbytes for a in cache) <= budget:
                self._device_data = upload_window(cache, None, mesh)
            else:
                w = int(budget // max(1, cache.bytes_per_frame()))
                if w >= config.train.batch_size:
                    self._host_cache = cache
                    self._window_frames = w

        if self._device_data is not None or self._host_cache is not None:
            # whole-epoch scan program: one device dispatch per epoch; under
            # a mesh this is the data-parallel step (indices sharded over the
            # data axis, dataset replicated, grads psum'd by GSPMD)
            self.epoch_runner = make_epoch_runner(config, model_points, mesh=mesh)
            self.step_fn = self.epoch_runner.step
        else:
            self.epoch_runner = None
            self.step_fn = make_train_step(
                config, model_points, device_augment=config.data.device_augment,
                mesh=mesh,
            )
        self.state = self.step_fn.init_state(params, bn_state)
        if opt_leaves is not None:
            # resume the optimizer MOMENTS (checkpoint.py restore_opt_leaves):
            # rebuild against the freshly-initialized treedef, bulk-upload the
            # leaves, then re-inject THIS run's learning rate (the saved
            # leaves carry the old one)
            from hmd_ego_pose_tpu.train.state import set_learning_rate as _set_lr
            from hmd_ego_pose_tpu.utils.device import to_default_device

            template = self.state.opt_state
            t_leaves, treedef = jax.tree.flatten(template)
            if len(t_leaves) != len(opt_leaves):
                raise ValueError(
                    f"optimizer state mismatch: checkpoint has {len(opt_leaves)} "
                    f"leaves, this optimizer has {len(t_leaves)} (config "
                    "fine_tune/freeze_backbone changed?)"
                )
            import numpy as np

            up = to_default_device(
                [np.asarray(l).astype(t.dtype).reshape(t.shape)
                 for l, t in zip(opt_leaves, t_leaves)]
            )
            self.state = self.state._replace(opt_state=jax.tree.unflatten(treedef, up))
            self.state = _set_lr(self.state, config.train, config.train.learning_rate)
        if start_step:
            import jax.numpy as jnp

            self.state = self.state._replace(
                step=jnp.asarray(start_step, jnp.int32))
        self._steps_done = int(start_step)
        self.predict_fn = make_eval_forward(config)
        self.scheduler = ReduceLROnPlateau(
            config.train.learning_rate,
            factor=config.train.plateau_factor,
            patience=config.train.plateau_patience,
            threshold=config.train.plateau_threshold,
            min_lr=config.train.min_learning_rate,
        )

        self.pipeline = InputPipeline(
            train_dataset,
            config.data,
            config.model,
            batch_size=config.train.batch_size,
            training=True,
            seed=config.train.seed,
        )

        if mesh is not None:
            from hmd_ego_pose_tpu.parallel.mesh import batch_sharding, replicated_sharding

            self._batch_sharding = batch_sharding(mesh)
            self.state = jax.device_put(self.state, replicated_sharding(mesh))
        else:
            self._batch_sharding = None

        self.best_metric = float("inf")
        self.best_checkpoint: Optional[str] = None

    def _put(self, batch):
        if self._batch_sharding is None:
            return batch
        return jax.tree.map(lambda x: jax.device_put(x, self._batch_sharding), batch)

    def _epoch_batches(self):
        """Per-step payloads from the host pipeline (Batch or RawBatch)."""
        for batch in self.pipeline.batches(oversample=self.config.train.oversample):
            yield self._put(batch)

    @staticmethod
    def _combine_means(means_list, weights):
        """Exact weighted mean of per-segment metric means (device-scalar
        arithmetic — no host fetch)."""
        if len(means_list) == 1:
            return dict(means_list[0])
        total = sum(weights)
        return {
            k: sum(m[k] * (s / total) for m, s in zip(means_list, weights))
            for k in means_list[0]
        }

    def _dispatch_scan(self, idxs_np, rng_key, device_data):
        """Run (steps, B) index rows through the epoch runner against
        ``device_data``, chunked to max_steps_per_dispatch — a single
        over-long scan program crashes the relay-attached worker (see
        plan_epoch_chunks).  Per-step keys/indices are the SAME arrays
        merely sliced, so chunking is semantics-preserving.  Returns
        (device-scalar metric means, steps)."""
        import jax.numpy as jnp
        import numpy as np

        from hmd_ego_pose_tpu.train.step import plan_epoch_chunks

        n = idxs_np.shape[0]
        keys = jax.random.split(rng_key, n)
        idxs = jnp.asarray(idxs_np.astype(np.int32))

        idx_sharding = key_sharding = None
        if self.mesh is not None:
            # (steps, B): shard the batch dim so each device gathers its
            # local shard of every step; keys are replicated
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = self.mesh.axis_names[0]
            idx_sharding = NamedSharding(self.mesh, P(None, axis))
            key_sharding = NamedSharding(self.mesh, P())

        chunks = plan_epoch_chunks(n, self.config.train.max_steps_per_dispatch)
        chunk_means = []
        start = 0
        for size in chunks:
            ci = idxs[start : start + size]
            ck = keys[start : start + size]
            if idx_sharding is not None:
                ci = jax.device_put(ci, idx_sharding)
                ck = jax.device_put(ck, key_sharding)
            self.state, m = self.epoch_runner(self.state, device_data, ci, ck)
            chunk_means.append(m)
            start += size
        return self._combine_means(chunk_means, chunks), n

    def _windowed_epoch(self, rng_key):
        """One epoch in windowed device-resident mode: repartition the frame
        set randomly, then upload + scan one HBM-sized window at a time.
        Each step samples within the resident window (shard-shuffle
        semantics, the standard large-scale relaxation of global shuffling);
        the per-step host pipeline remains the exact-global-shuffle
        fallback.  Tail windows smaller than a batch are skipped this epoch
        (they land in full windows after the next repartition)."""
        import numpy as np

        from hmd_ego_pose_tpu.data.device_dataset import upload_window

        cfg = self.config.train
        rng = self.pipeline.rng  # the same sampler stream as epoch_indices
        n_frames = self._host_cache.frames.shape[0]
        perm = rng.permutation(n_frames)
        parts = [perm[i : i + self._window_frames]
                 for i in range(0, n_frames, self._window_frames)]

        win_means, win_steps = [], []
        for rows in parts:
            steps = (len(rows) * cfg.oversample) // cfg.batch_size
            if steps == 0:
                continue
            idx = np.concatenate(
                [rng.permutation(len(rows)) for _ in range(cfg.oversample)]
            )[: steps * cfg.batch_size].reshape(steps, cfg.batch_size)
            # free the previous window BEFORE uploading the next one so only
            # one window is ever resident
            self._device_data = None
            self._device_data = upload_window(self._host_cache, rows, self.mesh)
            rng_key, sub = jax.random.split(rng_key)
            m, n = self._dispatch_scan(idx, sub, self._device_data)
            win_means.append(m)
            win_steps.append(n)
        if not win_steps:
            raise ValueError(
                f"zero steps/epoch: batch_size {cfg.batch_size} exceeds every "
                f"{self._window_frames}-frame window (x oversample "
                f"{cfg.oversample})"
            )
        return self._combine_means(win_means, win_steps), sum(win_steps)

    def train_epoch(self, epoch: int, rng_key) -> Dict[str, float]:
        t0 = time.time()
        if self.epoch_runner is not None:
            if self._host_cache is not None:
                means, n = self._windowed_epoch(rng_key)
            else:
                idxs = self.pipeline.epoch_indices(self.config.train.oversample)
                if idxs.shape[0] == 0:
                    # scanning 0 steps would silently yield NaN metric means
                    raise ValueError(
                        f"zero steps/epoch: batch_size {self.config.train.batch_size} "
                        f"exceeds the {len(self.train_dataset)}-frame dataset "
                        f"(x oversample {self.config.train.oversample})"
                    )
                means, n = self._dispatch_scan(idxs, rng_key, self._device_data)
            # values stay DEVICE scalars: fit() floats them only at eval
            # epochs (the first fetch permanently degrades a relay session)
            #
            # dispatch_seconds, NOT epoch_seconds: under async dispatch this
            # measures host-side dispatch of the epoch program, not device
            # execution (block_until_ready acks dispatch on the relay —
            # BENCH_NOTES.md).  True wall time per shift is recorded by the
            # train_long wrapper (wall_seconds in history.jsonl).
            means["dispatch_seconds"] = time.time() - t0
            means["steps"] = n
            self._steps_done += n
            return means

        # host-pipeline path: keep per-step metric arrays as device handles;
        # reduce ONCE at epoch end (a per-step float() would sync the
        # pipeline, and on a relay-attached TPU each fetch costs ~35-50 ms)
        collected = []
        n = 0
        for batch in self._epoch_batches():
            rng_key, sub = jax.random.split(rng_key)
            self.state, metrics = self.step_fn.jitted(self.state, batch, sub)
            n += 1
            collected.append(metrics)
        means = {}
        if collected:
            import jax.numpy as jnp

            for k in collected[0]:
                means[k] = float(jnp.mean(jnp.stack([m[k] for m in collected])))
        # host-pipeline epochs are paced by the host input pipeline, so this
        # IS a meaningful wall time — but keep the same honest name as the
        # scan path (the final value still excludes un-fetched device work)
        means["dispatch_seconds"] = time.time() - t0
        means["steps"] = n
        self._steps_done += n
        return means

    def validate(self, max_images: Optional[int] = None) -> EvalResult:
        return evaluate_model(
            self.val_dataset,
            self.predict_fn,
            self.state.params,
            self.state.bn_state,
            self.config,
            max_eval_images=max_images,
        )

    def fit(
        self,
        epochs: Optional[int] = None,
        max_eval_images: Optional[int] = None,
        on_epoch_end: Optional[Callable] = None,
    ):
        epochs = epochs if epochs is not None else self.config.train.epochs
        eval_every = max(1, self.config.train.eval_every)
        key = jax.random.PRNGKey(self.config.train.seed + 1)
        pending = []  # (epoch, train metrics w/ possibly-device scalar values)
        new_lr = self.scheduler.lr
        for epoch in range(epochs):
            key, sub = jax.random.split(key)
            train_metrics = self.train_epoch(epoch, sub)
            pending.append((epoch, train_metrics))
            if (epoch + 1) % eval_every != 0 and epoch != epochs - 1:
                continue  # pure-compute epoch: no device->host fetch at all

            # flush deferred train metrics (first float() on a relay-attached
            # TPU permanently degrades the session — hence eval_every)
            for ep, m in pending:
                self.logger.log_scalars(
                    ep, {"lr": new_lr, **{k: float(v) for k, v in m.items()}}
                )
            train_metrics = {k: float(v) for k, v in pending[-1][1].items()}
            n_since_eval = len(pending)
            pending = []

            result = self.validate(max_images=max_eval_images)

            # plateau scheduler on the mixed point-distance mean (train.py:273);
            # patience counts EPOCHS, so an amortized eval burns eval_every
            metric = result.mixed_point_distance_mean_mm
            new_lr = self.scheduler.step(metric, n_epochs=max(1, n_since_eval))
            self.state = set_learning_rate(self.state, self.config.train, new_lr)

            self.logger.log_scalars(epoch, {f"val/{k}": v for k, v in result.scalars().items()})

            if metric < self.best_metric:
                self.best_metric = metric
                name = checkpoint_name(
                    self.config.data.dataset,
                    self.config.data.fold,
                    self.config.model.iter_steps,
                    metric,
                    epoch,
                )
                self.best_checkpoint = save_checkpoint(
                    self.config.train.checkpoint_dir,
                    name,
                    self.state.params,
                    self.state.bn_state,
                    metadata={
                        "epoch": epoch,
                        "metric": metric,
                        "hand_relative": self.config.model.hand_relative,
                        "config": repr(self.config),
                        "metrics": result.scalars(),
                    },
                )

            # rolling crash-resume checkpoint: best-only saving (the
            # reference policy) writes nothing until the first true positive,
            # which can be many epochs into a from-scratch run.  Carries the
            # optimizer moments + step counter so a resumed shift does not
            # re-warm Adam from zero (Trainer(opt_leaves=..., start_step=...))
            save_checkpoint(
                self.config.train.checkpoint_dir,
                "last",
                self.state.params,
                self.state.bn_state,
                metadata={"epoch": epoch, "metric": metric,
                          "train_step": self._steps_done,
                          "hand_relative": self.config.model.hand_relative,
                          "config": repr(self.config)},
                opt_state=self.state.opt_state,
            )

            if on_epoch_end is not None:
                on_epoch_end(epoch, train_metrics, result)
        return self.best_checkpoint
