"""Epoch engine (the reference's Multi_BaseTrainer_dist + Multi_Trainer_dist,
base_trainer.py:7-244 / trainer_dist.py:57-291, re-designed single-program).

One process drives the whole mesh (pjit): no DDP wrappers, no rank gating — the
jitted train step consumes globally-batch-sharded arrays and XLA lowers the
gradient reduction + the contrastive loss's global-negative gather to ICI
collectives. Per-epoch flow matches the reference: alternating multi-loader
batches, max_samples_per_epoch cap, init_val, monitored best + periodic Orbax
checkpoints, step-decay LR at epoch milestones, retrieval-metric validation with
`verbose` printing.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from oatx.config.schema import ExperimentCfg, build_tower_config
from oatx.config.registry import METRICS
from oatx.data.loader import MultiLoader, ShardedLoader, device_prefetch
from oatx.losses import contrastive as C
from oatx.parallel import mesh as meshlib
from oatx.parallel import sharding as shardlib
from oatx.train import checkpoint as ckptlib
from oatx.train import optim as optimlib
from oatx.train import step as steplib
from oatx.utils.logging import setup_logging
from oatx.utils.tb import TensorboardWriter


def verbose(epoch: int, metrics: Dict[str, float], name: str, mode: str = "t2v") -> str:
    """Reference trainer_dist.py:495-500 metric line."""
    msg = (f"[{mode}] epoch {epoch}, {name}: "
           f"R@1 {metrics['R1']:.1f} R@5 {metrics['R5']:.1f} "
           f"R@10 {metrics['R10']:.1f} R@50 {metrics['R50']:.1f} "
           f"MedR {metrics['MedR']:g} MeanR {metrics['MeanR']:.1f}")
    return msg


class Trainer:
    def __init__(
        self,
        exp: ExperimentCfg,
        train_loaders: List[ShardedLoader],
        valid_loaders: Optional[List[ShardedLoader]] = None,
        save_dir: Optional[str | Path] = None,
        log_dir: Optional[str | Path] = None,
        linear_eval: bool = False,
        resume: Optional[str] = None,
        mesh=None,
        tracker=None,
    ):
        self.exp = exp
        t = exp.trainer
        self.logger = setup_logging(log_dir, "oatx.trainer", t.verbosity)
        self.writer = TensorboardWriter(log_dir)
        self.profile_dir = Path(log_dir or save_dir or ".") / "profile"
        self._profiling = False
        self._profile_done = False
        self._profile_stop = 0
        self.tracker = tracker
        self.save_dir = Path(save_dir) if save_dir else None
        self.train_loaders = train_loaders
        self.valid_loaders = valid_loaders or []

        compute_dtype = jnp.bfloat16 if t.precision == "bf16" else jnp.float32
        self.tower_cfg = build_tower_config(exp.arch, compute_dtype=compute_dtype)
        if t.pipeline:
            # model axis becomes GPipe stages (mutually exclusive with the
            # Megatron TP kernel rules, which use the same axis)
            import dataclasses as _dc

            if t.fsdp:
                raise ValueError("trainer.pipeline and trainer.fsdp both use "
                                 "structured placements — enable one")
            if self.tower_cfg.video.sequence_parallel:
                raise ValueError(
                    "video_params.sequence_parallel cannot combine with "
                    "trainer.pipeline: the sharding constraint targets mesh "
                    "axes that are manual inside the pipeline's shard_map")
            self.tower_cfg = _dc.replace(
                self.tower_cfg,
                video=_dc.replace(self.tower_cfg.video,
                                  pipeline_stages=t.model_parallel,
                                  pipeline_microbatches=t.pipeline_microbatches))
        self.loss_cfg = steplib.LossConfig(
            name=exp.loss.type, temperature=exp.loss.temperature,
            margin=exp.loss.margin, region_bce_weight=exp.loss.region_bce_weight,
            chunked=exp.loss.chunked, chunk_size=exp.loss.chunk_size,
            object_nce_weight=exp.loss.object_nce_weight)

        self.mesh = mesh if mesh is not None else meshlib.make_mesh(
            model_parallel=t.model_parallel,
            dcn_slices=getattr(t, "dcn_slices", 1))
        # explicit mesh= bypasses make_mesh's registration — register it so the
        # mesh-consulting guards (ln_mlp.use_pallas TP fallback, _sp_constrain)
        # see the mesh actually in use
        meshlib.set_current_mesh(self.mesh)

        # batches are sharded over the mesh's data axis; catch indivisible
        # batch sizes here with a config-level message instead of letting
        # device_put fail deep inside the prefetch thread. Config batch_size is
        # per PROCESS (reference semantics: per-GPU batch, norm.json:43), so on
        # a multi-host mesh the sharded global batch is batch_size x processes.
        data_axis = meshlib.batch_shards(self.mesh)  # dcn x data on multi-slice
        n_proc = jax.process_count()
        for l in train_loaders:  # val batches are padded to the multiple instead
            gb = l.batch_size * n_proc
            if gb % data_axis != 0:
                raise ValueError(
                    f"data_loader '{l.dataset_name}' global batch {gb} "
                    f"(batch_size={l.batch_size} x {n_proc} processes) is not "
                    f"divisible by the mesh batch shards ({data_axis} devices)")
            if t.pipeline and t.model_parallel > 1:
                m = t.pipeline_microbatches
                if gb % m != 0 or (gb // m) % data_axis != 0:
                    raise ValueError(
                        f"pipeline mode: data_loader '{l.dataset_name}' "
                        f"global batch {gb} must be a multiple of "
                        f"pipeline_microbatches ({m}) x batch shards ({data_axis})")

        # steps/epoch for the LR schedule (epoch-milestone step decay)
        cycle_batches = sum(l.batch_size for l in train_loaders) or 1
        steps_per_cycle = len(train_loaders) or 1
        if t.len_epoch is not None and t.len_epoch <= 0:
            raise ValueError(f"trainer.len_epoch must be positive, got {t.len_epoch}")
        if t.len_epoch:  # iteration-based: fixed cycles, loaders cycle endlessly
            n_cycles = t.len_epoch
        else:
            agg = max if t.cycle_shorter else min
            n_cycles = agg(len(l) for l in train_loaders) if train_loaders else 0
            if t.max_samples_per_epoch:
                n_cycles = min(n_cycles, t.max_samples_per_epoch // cycle_batches)
        self.cycles_per_epoch = max(1, n_cycles)
        steps_per_epoch = self.cycles_per_epoch * steps_per_cycle

        schedule = optimlib.make_schedule(
            exp.optimizer.lr, steps_per_epoch, t.epochs,
            kind=exp.optimizer.schedule,
            milestones=exp.optimizer.milestones, gamma=exp.optimizer.gamma,
            warmup_steps=exp.optimizer.warmup_steps,
            lr_min=exp.optimizer.lr_min)
        self.lr_schedule = schedule  # re-evaluated host-side for logging only
        tf = optimlib.linear_probe_filter if linear_eval else None
        if self.tower_cfg.object_tower is not None:
            # the object NCE term only fires when batches CARRY object
            # features (step.loss_fn checks 'object' in batch) — unfreeze only
            # when the loss is configured AND the data plane supplies them;
            # otherwise freeze, or AdamW's weight decay would silently erode
            # the untrained params toward zero over a pretrain run
            object_in_data = any(
                getattr(getattr(l, "dataset", None), "opts", None) is not None
                and l.dataset.opts.features for l in train_loaders)
            trains_object = (self.tower_cfg.variant == "baseline"
                             and self.loss_cfg.object_nce_weight > 0
                             and object_in_data)
            if self.loss_cfg.object_nce_weight > 0 and not object_in_data:
                self.logger.warning(
                    "loss.object_nce_weight > 0 but no train loader supplies "
                    "object features (object_params.input_objects) — the "
                    "object tower stays FROZEN")
            if not trains_object:
                tf = optimlib.exclude_subtrees(tf, ("object_tower", "obj_proj"))
        self.optimizer = optimlib.make_optimizer(
            lr=schedule, weight_decay=exp.optimizer.weight_decay,
            grad_clip=exp.optimizer.grad_clip,
            trainable_filter=tf,
            ema_decay=t.ema_decay or None,
            kind=exp.optimizer.type)

        # params: fresh init → optional reference-checkpoint import → shard
        rng = jax.random.PRNGKey(t.seed)
        from oatx.models import towers

        params = towers.init(rng, self.tower_cfg)
        if exp.arch.load_checkpoint:
            self.logger.info("importing initial weights from %s", exp.arch.load_checkpoint)
            params = ckptlib.import_initial_weights(
                exp.arch.load_checkpoint, self.tower_cfg, params,
                temporal_fix=exp.arch.load_temporal_fix)
        if t.fsdp:
            params = shardlib.shard_params_fsdp(self.mesh, params)
        elif t.pipeline and t.model_parallel > 1:
            params = shardlib.shard_params_pipeline(self.mesh, params)
        else:
            params = shardlib.shard_params(self.mesh, params)
        self.state = steplib.init_state(rng, self.tower_cfg, self.optimizer, params=params)
        if t.zero1 and not t.fsdp:  # fsdp already shards the moments with the params
            self.state = steplib.TrainState(
                self.state.params,
                shardlib.shard_opt_state_zero1(self.mesh, self.state.opt_state),
                self.state.step)

        self.start_epoch = 1
        self.monitor_mode, self.monitor_metric = self._parse_monitor(t.monitor)
        self.monitor_best = np.inf if self.monitor_mode == "min" else -np.inf
        if resume:
            restored, meta = ckptlib.restore_checkpoint(resume, self.state)
            # re-place restored state with the SAME layout a fresh run gets:
            # fsdp shards params+moments over the data axis, zero1 the moments
            # only — a base-spec re-place here would silently de-shard a
            # resumed pod run (params+moments replicated → data_size× HBM)
            if t.fsdp:
                params_r = shardlib.shard_params_fsdp(self.mesh, restored["params"])
            elif t.pipeline and t.model_parallel > 1:
                params_r = shardlib.shard_params_pipeline(self.mesh, restored["params"])
            else:
                params_r = shardlib.shard_params(self.mesh, restored["params"])
            # derive the template SHARDINGS without materializing a throwaway
            # opt state on device (optimizer.init would transiently double the
            # moment HBM at restore — exactly the pod-scale fsdp/zero1 case):
            # moments inherit their param's sharding (what eager init's
            # zeros_like produced), zero1 re-derives from shapes alone
            abstract = jax.eval_shape(self.optimizer.init, params_r)
            if t.zero1 and not t.fsdp:
                template = jax.tree_util.tree_map(
                    lambda ab: shardlib.opt_leaf_zero1_sharding(self.mesh, ab),
                    abstract)
            else:
                template = shardlib.opt_state_template_shardings(params_r, abstract)

            def _put(r, sh):
                # honor only mesh (Named) shardings from the template; scalar
                # leaves like optax count are created single-device by init()
                # and must stay UNCOMMITTED so jit may place them freely
                from jax.sharding import NamedSharding

                r = jnp.asarray(r)
                if isinstance(sh, NamedSharding) and r.ndim > 0:
                    return jax.device_put(r, sh)
                return r

            self.state = steplib.TrainState(
                params_r,
                jax.tree_util.tree_map(_put, restored["opt_state"], template),
                jnp.asarray(restored["step"]))
            self._resume_cycle = 0
            if meta.get("cycles_done") is not None and \
                    int(meta["cycles_done"]) < self.cycles_per_epoch:
                # mid-epoch preemption snapshot: continue INSIDE that epoch
                self.start_epoch = meta["epoch"]
                self._resume_cycle = int(meta["cycles_done"])
                self.logger.info("resumed mid-epoch from %s (epoch %d, cycle %d)",
                                 resume, meta["epoch"], self._resume_cycle)
            else:
                self.start_epoch = meta["epoch"] + 1
                self.logger.info("resumed from %s at epoch %d", resume, meta["epoch"])
            if meta.get("has_meta", True) and "monitor_best" in meta:
                mb = meta["monitor_best"]
                # a lost .meta.json defaults to +inf, which silently disables
                # max-mode monitoring — keep the mode-aware init instead
                if not (self.monitor_mode == "max" and mb == float("inf")):
                    self.monitor_best = mb

        precropped = [getattr(l.dataset, "train_crop", "device_canonical")
                      == "reference_full_frame" for l in train_loaders]
        if any(precropped):
            # host-faithful RRC lane: datasets ship input_res² frames already
            # cropped; the device chain must skip its crop (data/transforms.py)
            assert all(precropped), (
                "train_crop='reference_full_frame' must be set on ALL train "
                "loaders (the device augmenter is shared)")
            from oatx.data import transforms as _T

            self.augment = steplib.make_augmenter(
                transform_cfg=_T.TransformConfig(
                    input_res=self.tower_cfg.video.img_size,
                    host_precropped=True),
                train=True, tower_cfg=self.tower_cfg)
        else:
            self.augment = steplib.make_augmenter(train=True,
                                                  tower_cfg=self.tower_cfg)
        fwd_chunk = getattr(t, "fwd_chunk", 0) or None
        step_mesh = None  # mesh handed to the step ONLY for the shard_map path
        if fwd_chunk and meshlib.batch_shards(self.mesh) > 1:
            # multi-chip fwd_chunk = per-chip remat-scan under shard_map with
            # global-batch negatives (loss_fn). Needs replicated params: any
            # sharded-param scheme would have to re-gather inside the manual
            # region, so those configs keep the plain GSPMD step instead.
            if t.model_parallel > 1 or t.fsdp or t.pipeline:
                self.logger.warning(
                    "fwd_chunk=%d ignored: shard_map fwd_chunk needs "
                    "replicated params (model_parallel=1, no fsdp/pipeline)",
                    fwd_chunk)
                fwd_chunk = None
            else:
                step_mesh = self.mesh
        if fwd_chunk and t.accum_steps > 1:
            raise ValueError("fwd_chunk and accum_steps are mutually exclusive "
                             "(full-batch vs micro-batch negative semantics)")
        # manual data parallelism (step.py _manual_dp_grads): per-shard
        # backward under shard_map + ONE explicit pmean per gradient leaf.
        # Default for eligible (replicated-param) multi-chip meshes: GSPMD
        # all-reduces each cotangent of a multiply-used weight separately
        # (split-CLS stream: +71% ViT-B gradient bytes — PERF.md round 5).
        dp_mode = getattr(t, "dp_mode", "auto") or "auto"
        if dp_mode not in ("auto", "gspmd", "manual"):
            raise ValueError(f"unknown trainer.dp_mode {dp_mode!r}")
        pure_dp = (meshlib.batch_shards(self.mesh) > 1 and t.model_parallel <= 1
                   and not t.fsdp and not t.pipeline)
        if dp_mode == "manual" and not pure_dp:
            raise ValueError(
                "trainer.dp_mode='manual' needs a >1-shard batch axis and "
                "replicated params (model_parallel=1, no fsdp/pipeline)")
        manual_axes = meshlib.batch_axes(self.mesh) \
            if dp_mode != "gspmd" and pure_dp else None
        grd = getattr(t, "grad_reduce_dtype", "") or ""
        if grd and not manual_axes:
            self.logger.warning(
                "trainer.grad_reduce_dtype=%r ignored: needs the manual "
                "dp_mode path (got dp_mode=%s, pure_dp=%s)", grd, dp_mode,
                pure_dp)
            grd = ""
        if manual_axes:
            self.logger.info("data-parallel gradients: manual pmean over %s%s",
                             manual_axes,
                             f" in {grd}" if grd else "")
        self.train_step = steplib.make_train_step(
            self.tower_cfg, self.loss_cfg, self.optimizer,
            augment=self.augment, base_rng=jax.random.PRNGKey(t.seed + 1),
            accum_steps=t.accum_steps, skip_nonfinite=t.skip_nonfinite,
            fwd_chunk=fwd_chunk,
            mesh=self.mesh if manual_axes else step_mesh,
            manual_axes=manual_axes,
            grad_reduce_dtype={"": None, "bf16": jnp.bfloat16,
                               "f32": jnp.float32}[grd])
        eval_cfg = self.tower_cfg
        if t.pipeline and self.tower_cfg.video.pipeline_stages > 1:
            # eval batches are padded to the data axis, not to microbatch
            # multiples — run eval through the sequential block path (GSPMD
            # all-gathers the stage-sharded blocks; forward-only, so the
            # pipeline schedule buys nothing there anyway)
            import dataclasses as _dc

            eval_cfg = _dc.replace(
                self.tower_cfg,
                video=_dc.replace(self.tower_cfg.video, pipeline_stages=1))
        # single-chip validation scans bs-8 sub-batches inside one jit (the
        # large-batch layout fix, PERF.md round 3); under a sharded data axis
        # the batch dim is already split per chip, so the scan is disabled —
        # likewise for val batch sizes the scan cannot divide
        eval_chunk: Optional[int] = None
        if meshlib.batch_shards(self.mesh) == 1:
            vb = max((l.batch_size for l in self.valid_loaders), default=1)
            if vb <= 8 or vb % 8 == 0:
                eval_chunk = 8
        self.eval_step = steplib.make_eval_step(eval_cfg, chunk=eval_chunk)
        self.not_improved = 0

        # preemption safety (beyond the reference — SURVEY.md §5 lists no elastic
        # recovery there): SIGTERM/SIGUSR1 requests a checkpoint at the next step
        self._preempted = False
        self._preempt_saved = False  # a snapshot was written for this signal
        self._install_preemption_handler()
        from oatx.utils.watchdog import StepWatchdog

        self.watchdog = StepWatchdog(timeout_s=900.0, logger=self.logger)

    def _install_preemption_handler(self) -> None:
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return

        def handler(signum, frame):
            self._preempted = True

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):
                pass

    @staticmethod
    def _parse_monitor(monitor: str):
        if monitor in ("off", ""):
            return "off", ""
        mode, metric = monitor.split(" ", 1)
        assert mode in ("min", "max"), f"monitor mode {mode!r}"
        return mode, metric

    # ------------------------------------------------------------------ train

    def train(self) -> Dict[str, Any]:
        t = self.exp.trainer
        history: Dict[str, Any] = {}
        if t.init_val and self.valid_loaders:
            val_log = self._valid_epoch(self.start_epoch - 1)
            self.logger.info("init_val: %s", {k: round(v, 4) for k, v in val_log.items()
                                              if isinstance(v, float)})
        for epoch in range(self.start_epoch, t.epochs + 1):
            if self._preempted:
                # the signal landed OUTSIDE the step loop (validation, epoch
                # summary, loader restart) — snapshot here instead of paying a
                # whole epoch's loader spin-up first. Caught by the round-5
                # soak drill: a SIGTERM during validation previously raced the
                # next epoch's first-batch wait and could die snapshot-less.
                if self.save_dir:
                    ckptlib.save_checkpoint(
                        self.save_dir, f"preempt-epoch{epoch - 1}", self.state,
                        epoch - 1, self.monitor_best,
                        extra_meta={"cycles_done": self.cycles_per_epoch})
                    self._preempt_saved = True
                self.logger.warning(
                    "preemption signal between epochs: checkpoint saved, exiting")
                break
            log = {"epoch": epoch}
            start_cycle = getattr(self, "_resume_cycle", 0) if epoch == self.start_epoch else 0
            log.update(self._train_epoch(epoch, start_cycle=start_cycle))
            if self._preempted:
                if not self._preempt_saved and self.save_dir:
                    # flag raced the end of the epoch (set after the last
                    # in-loop check) — the epoch is complete, snapshot as such
                    ckptlib.save_checkpoint(
                        self.save_dir, f"preempt-epoch{epoch}", self.state,
                        epoch, self.monitor_best,
                        extra_meta={"cycles_done": self.cycles_per_epoch})
                    self._preempt_saved = True
                self.logger.warning("stopping after preemption checkpoint (epoch %d)", epoch)
                break
            val_period = max(int(getattr(t, "val_period", 1)), 1)
            if self.valid_loaders and (epoch % val_period == 0
                                       or epoch == t.epochs):
                log.update(self._valid_epoch(epoch))
            history[epoch] = log
            for k, v in log.items():
                if isinstance(v, (int, float)):
                    self.logger.info("    %-24s: %s", k, v)
            if self.tracker is not None:
                self.tracker.log_metrics(epoch, {k: v for k, v in log.items()
                                                 if isinstance(v, (int, float))},
                                         mode="epoch")

            best = False
            if self.monitor_mode != "off" and self.monitor_metric in log:
                value = log[self.monitor_metric]
                improved = (value <= self.monitor_best if self.monitor_mode == "min"
                            else value >= self.monitor_best)
                if improved:
                    self.monitor_best, best, self.not_improved = value, True, 0
                else:
                    self.not_improved += 1
                if self.not_improved > t.early_stop:
                    self.logger.info("early stop after %d stale epochs", self.not_improved)
                    break
            if self.save_dir and (epoch % t.save_period == 0 or best):
                self._save(epoch, best)
        ckptlib.wait_for_async_saves()  # commit any in-flight snapshot writes
        return history

    def _train_epoch(self, epoch: int, start_cycle: int = 0) -> Dict[str, float]:
        """start_cycle > 0 resumes mid-epoch after a preemption snapshot: the
        completed cycles are skipped by INDEX ARITHMETIC in the loader
        (MultiLoader.iter_from — no skipped batch is decoded; sample rngs are
        (seed, epoch, index)-keyed so the remaining cycles see exactly the
        batches they would have in the uninterrupted run).

        Epoch loss is EXACT and sync-free: every step's loss is accumulated
        into a per-loader device scalar (one tiny async op enqueued behind the
        step — no host sync), fetched once at epoch end. The reference
        accumulates every batch on the host (trainer_dist.py:163-167); the old
        oatx behavior subsampled every log_step batches."""
        for l in self.train_loaders:
            l.set_epoch(epoch)
        multi = MultiLoader(self.train_loaders,
                            cycle_shorter=self.exp.trainer.cycle_shorter,
                            endless=bool(self.exp.trainer.len_epoch))
        loss_sums = [jnp.zeros(()) for _ in self.train_loaders]  # on-device
        valid_sums = [jnp.zeros(()) for _ in self.train_loaders]  # non-skipped
        # periodic console/TB line: fetching the loss forces a device sync, so
        # sample sparsely (reference log_step = sqrt(batch), trainer_dist.py:87);
        # counted PER LOADER so alternating multi-loader runs log every stream
        log_step = max(1, int(np.sqrt(self.train_loaders[0].batch_size)))
        steps_per_loader = [0] * len(self.train_loaders)
        t0 = time.time()
        cycles_done = start_cycle
        last_metrics = None
        self.watchdog.start()
        # live input-stall accounting: time blocked in the prefetch iterator
        # (host decode + collate + H2D not hidden by the overlap) vs wall time.
        # The offline equivalent is tools/bench_train_e2e.py; this makes the
        # stall visible in every real run (TB scalar `input_wait` + epoch log).
        prefetch_iter = iter(device_prefetch(multi.iter_from(start_cycle),
                                             self.mesh))
        data_wait = 0.0
        wall_start = time.perf_counter()  # monotonic, like the wait accumulator
        while True:
            if self._preempted and last_metrics is not None:
                # signal landed between steps (e.g. during the log fetch) —
                # don't wait for another batch before snapshotting
                _ = float(last_metrics["loss"])
                if self.save_dir:
                    ckptlib.save_checkpoint(
                        self.save_dir, f"preempt-epoch{epoch}", self.state,
                        epoch, self.monitor_best,
                        extra_meta={"cycles_done": cycles_done})
                    self._preempt_saved = True
                    self.logger.warning(
                        "preemption signal: checkpoint saved at cycle %d, exiting epoch",
                        cycles_done)
                break
            w0 = time.perf_counter()
            try:
                loader_idx, batch = next(prefetch_iter)
            except StopIteration:
                break
            data_wait += time.perf_counter() - w0
            batch.pop("meta", None)
            self.state, metrics = self.train_step(self.state, batch)
            last_metrics = metrics
            loss_sums[loader_idx] = loss_sums[loader_idx] + metrics["loss"]
            valid_sums[loader_idx] = valid_sums[loader_idx] + 1.0 - metrics.get(
                "skipped", 0.0)  # on-device: no sync; == step count unless skipping
            steps_per_loader[loader_idx] += 1
            self.watchdog.beat()
            self._profile_hook(epoch, sum(steps_per_loader), metrics)
            if loader_idx == len(self.train_loaders) - 1:
                cycles_done += 1
            if self._preempted:
                _ = float(metrics["loss"])
                if self.save_dir:
                    ckptlib.save_checkpoint(
                        self.save_dir, f"preempt-epoch{epoch}", self.state, epoch,
                        self.monitor_best, extra_meta={"cycles_done": cycles_done})
                    self._preempt_saved = True
                    self.logger.warning(
                        "preemption signal: checkpoint saved at cycle %d, exiting epoch",
                        cycles_done)
                break
            if (steps_per_loader[loader_idx] - 1) % log_step == 0:
                loss = float(metrics["loss"])  # forces the chain (axon-safe timing)
                self.writer.set_step((epoch - 1) * self.cycles_per_epoch + cycles_done)
                self.writer.add_scalar(f"loss_train_{loader_idx}", loss)
                # scheduled LR at the current optimizer step (host-side count:
                # no device sync; resume-correct via cycles_done, off by at
                # most a cycle's worth of steps + any skip_nonfinite no-ops)
                opt_step = ((epoch - 1) * self.cycles_per_epoch + cycles_done
                            ) * len(self.train_loaders)
                self.writer.add_scalar("lr", float(self.lr_schedule(opt_step)))
                self.logger.info(
                    "Train Epoch: %d %d/%d Loss[%d]: %.6f (%.2fs)",
                    epoch, cycles_done, self.cycles_per_epoch, loader_idx, loss,
                    time.time() - t0)
                t0 = time.time()
            if cycles_done >= self.cycles_per_epoch:
                break
        if self._profiling and last_metrics is not None:
            # epoch (or preemption) ended inside the capture window
            self._finish_profile(last_metrics)
        if last_metrics is not None:
            _ = float(last_metrics["loss"])  # drain device queue
        wall = time.perf_counter() - wall_start
        out = {"epoch_time": wall}
        if wall > 0 and sum(steps_per_loader):
            out["input_wait"] = data_wait / wall
            self.writer.add_scalar("input_wait", out["input_wait"])
        for i, (s, v, n) in enumerate(zip(loss_sums, valid_sums, steps_per_loader)):
            nv = float(v) if n else 0.0  # single fetch per loader per epoch
            out[f"loss_{i}"] = float(s) / nv if nv else float("nan")
            if n and nv < n:
                self.logger.warning("loader %d: %d/%d steps skipped (non-finite)",
                                    i, n - int(nv), n)
        return out

    # ------------------------------------------------------------------ valid

    def _gather_valid(self, out, n_valid, texts, vids) -> None:
        """Append this batch's VALID embedding rows to the host-side corpus.

        Multi-host: the batch axis spans processes, so np.asarray would raise
        on non-addressable shards. Gather the full array on every host (the
        reference's eval-time all_gather, trainer_dist.py:229-235) plus every
        process's n_valid, then drop each process block's padding rows — the
        global row order is process-blocked because
        make_array_from_process_local_data places each process's local rows on
        its own addressable devices (mesh device order groups by process)."""
        if meshlib.spans_processes(self.mesh):
            from jax.experimental import multihost_utils as mh

            te = np.asarray(mh.process_allgather(out["text_embeds"], tiled=True))
            ve = np.asarray(mh.process_allgather(out["video_embeds"], tiled=True))
            nv = np.asarray(mh.process_allgather(
                np.asarray([n_valid]))).reshape(-1)
            n_proc = len(nv)
            blk = te.shape[0] // n_proc
            for p in range(n_proc):
                texts.append(te[p * blk: p * blk + int(nv[p])])
                vids.append(ve[p * blk: p * blk + int(nv[p])])
        else:
            texts.append(np.asarray(out["text_embeds"])[:n_valid])
            vids.append(np.asarray(out["video_embeds"])[:n_valid])

    # ------------------------------------------------------------- profiling

    def _profile_hook(self, epoch: int, total_steps: int, metrics) -> None:
        """Config-gated jax.profiler capture inside the real training loop
        (`trainer.profile_epoch/profile_start_step/profile_steps`) — the in-run
        counterpart of tools/exp_step_trace.py. The start/stop fences fetch the
        loss so the window holds exactly the requested steps (on the tunneled
        TPU platform dispatch returns early; a fence is the only real sync)."""
        t = self.exp.trainer
        if (self._profile_done or not t.profile_epoch
                or epoch != t.profile_epoch):
            return
        import jax

        if jax.process_index() != 0:
            self._profile_done = True
            return
        if not self._profiling and total_steps >= t.profile_start_step:
            _ = float(metrics["loss"])  # fence: prior steps stay out
            self.profile_dir.mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(str(self.profile_dir))
            self._profiling = True
            self._profile_stop = total_steps + t.profile_steps
        elif self._profiling and total_steps >= self._profile_stop:
            self._finish_profile(metrics)

    def _finish_profile(self, metrics) -> None:
        import jax

        from oatx.utils import profiler as proflib

        _ = float(metrics["loss"])  # fence: the last step completes on device
        jax.profiler.stop_trace()
        self._profiling, self._profile_done = False, True
        self.logger.info("profiler trace captured → %s", self.profile_dir)
        for row in proflib.summarize_trace(str(self.profile_dir), top=5):
            self.logger.info("  trace: %-48s %9.2f ms total",
                             row["name"][:48], row["total_ms"])

    def _valid_epoch(self, epoch: int) -> Dict[str, float]:
        log: Dict[str, float] = {}
        from oatx.data.loader import padded_batches

        eval_params = self.state.params
        t = self.exp.trainer
        if t.ema_decay and t.ema_eval:
            ema = optimlib.find_ema(self.state.opt_state)
            if ema is not None:  # validate/monitor the EMA model
                eval_params = ema
        multiple = max((l.batch_size for l in self.valid_loaders), default=1)
        multiple = max(multiple, meshlib.batch_shards(self.mesh))
        for vi, loader in enumerate(self.valid_loaders):
            texts, vids = [], []
            for batch, n_valid in device_prefetch(
                    padded_batches(iter(loader), multiple), self.mesh):
                batch.pop("meta", None)
                out = self.eval_step(eval_params, batch)
                self._gather_valid(out, n_valid, texts, vids)
                self.watchdog.beat()  # long validations are not hangs
            if not texts:
                continue
            text_e = np.concatenate(texts)
            vid_e = np.concatenate(vids)
            sims = np.asarray(C.sim_matrix(jnp.array(text_e), jnp.array(vid_e)))
            val_loss = float(C.norm_softmax_loss(jnp.array(sims), self.loss_cfg.temperature))
            log[f"val_loss_{vi}"] = val_loss
            if vi == 0:
                log["val_loss"] = val_loss
            from oatx.metrics.retrieval import REQUIRES_QUERY_MASKS

            self.writer.set_step(epoch, mode="valid")
            for metric_name in self.exp.metrics:
                if metric_name in REQUIRES_QUERY_MASKS:
                    self.logger.warning(
                        "metric %s needs query_masks (label matrix) — "
                        "skipped during validation", metric_name)
                    continue
                fn = METRICS.get(metric_name)
                res = fn(sims)
                short = {"t2v_metrics": "t2v", "v2t_metrics": "v2t"}.get(metric_name, metric_name)
                if "R1" in res:
                    self.logger.info(verbose(epoch, res, loader.dataset_name, short))
                else:
                    self.logger.info("[%s] epoch %d, %s: %s", short, epoch,
                                     loader.dataset_name,
                                     {k: round(float(v), 3) for k, v in res.items()})
                for k, v in res.items():
                    log[f"val_{vi}_{short}_{k}"] = float(v)
                    self.writer.add_scalar(f"val_{vi}_{short}_{k}", float(v), epoch)
            self.writer.set_step(epoch, mode="train")
        return log

    # ------------------------------------------------------------------ save

    def _save(self, epoch: int, best: bool) -> None:
        name = f"checkpoint-epoch{epoch}"
        async_save = bool(getattr(self.exp.trainer, "async_checkpoint", False))
        path = ckptlib.save_checkpoint(self.save_dir, name, self.state, epoch,
                                       self.monitor_best, keep=3,
                                       async_save=async_save)
        self.logger.info("saved %s%s", path, " (async)" if async_save else "")
        if best:
            ckptlib.save_checkpoint(self.save_dir, "model_best", self.state,
                                    epoch, self.monitor_best,
                                    async_save=async_save)
            self.logger.info("saved model_best (epoch %d)", epoch)
