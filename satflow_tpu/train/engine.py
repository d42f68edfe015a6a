"""Trainer: the fit/validate/test engine (the reference's pl.Trainer surface).

Maps the reference trainer config surface (reference satflow/configs/trainer/*.yaml)
to TPU-native mechanics:

- ``accelerator/gpus/num_nodes``      → the global jax Mesh (parallel.mesh); DP
  gradient all-reduce is emitted by XLA from the sharded jit.
- ``precision: 16`` (AMP)             → ``precision="bf16"`` compute dtype policy
  (no loss scaling needed on TPU).
- ``accumulate_grad_batches``         → ``optax.MultiSteps`` wrapping.
- ``gradient_clip_val``               → ``optax.clip_by_global_norm`` in the chain.
- ``profiler: simple|pytorch``        → ``jax.profiler`` trace to ``profile_dir``.
- ``terminate_on_nan``                → NaN guard on the jitted loss.
- ``fast_dev_run`` / ``limit_*_batches`` / ``overfit_batches`` → loop limits.
- checkpoint/early-stop/LR-monitor    → callbacks (train.callbacks).
"""

from __future__ import annotations

import contextlib
import math
import signal
import threading
import time
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import numpy as np
import optax

from satflow_tpu.core.utils import get_logger
from satflow_tpu.models.base import expand_frame_metrics
from satflow_tpu.train.loggers import BaseLogger, HistoryLogger
from satflow_tpu.train.state import GANTrainState, TrainState
from satflow_tpu.train.steps import (
    make_eval_step,
    make_gan_eval_step,
    make_gan_train_step,
    make_train_step,
)

log = get_logger(__name__)


class Trainer:
    def __init__(
        self,
        max_epochs: int = 1,
        max_steps: Optional[int] = None,
        limit_train_batches: Optional[float] = None,
        limit_val_batches: Optional[float] = None,
        overfit_batches: int = 0,
        fast_dev_run: bool = False,
        accumulate_grad_batches: int = 1,
        gradient_clip_val: float = 0.0,
        precision: str | int = 32,
        check_val_every_n_epoch: int = 1,
        log_every_n_steps: int = 10,
        terminate_on_nan: bool = False,
        profiler: Optional[str] = None,
        profile_dir: str = "logs/profile",
        zero_sharding: bool = False,
        spatial: Optional[str] = None,
        gan_step_mode: str = "fused",
        handle_preemption: bool = True,
        callbacks: Optional[List] = None,
        logger: Optional[List[BaseLogger]] = None,
        seed: int = 0,
        resume_from_checkpoint: Optional[str] = None,
        # accepted-for-parity knobs (no-ops on TPU or handled elsewhere):
        gpus: Any = None,
        tpu_cores: Any = None,
        num_nodes: int = 1,
        accelerator: Optional[str] = None,
        sync_batchnorm: bool = False,
        **_: Any,
    ):
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.overfit_batches = overfit_batches
        self.fast_dev_run = fast_dev_run
        self.accumulate_grad_batches = accumulate_grad_batches
        self.gradient_clip_val = gradient_clip_val
        self.precision = precision
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.log_every_n_steps = log_every_n_steps
        self.terminate_on_nan = terminate_on_nan
        self.profiler = profiler
        self.profile_dir = profile_dir
        self.zero_sharding = zero_sharding
        self.spatial = spatial
        # "fused" = one XLA program per adversarial round; "split" = separate
        # D/G jits (Lightning's two optimizer closures, reference
        # cloudgan.py:244-248) — use for big GAN geometries where the fused
        # program's compile time is pathological (DGMR 128px F24).
        self.gan_step_mode = gan_step_mode
        self.handle_preemption = handle_preemption
        self.callbacks = list(callbacks or [])
        self.history = HistoryLogger()
        self.loggers: List[BaseLogger] = [self.history] + list(logger or [])
        self.seed = seed
        self.resume_from_checkpoint = resume_from_checkpoint

        self.state = None
        self.model = None
        self.should_stop = False
        self.preempted = False
        self.global_step = 0
        self.last_batch = None
        self._lr_schedule = None
        self._plateau = None
        self._spatial_mesh = None

    # -- public API ----------------------------------------------------------

    @property
    def callback_metrics(self) -> Dict[str, float]:
        return self.history.latest

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def current_lr(self) -> Optional[float]:
        if self._lr_schedule is None:
            return None
        return float(self._lr_schedule(self.global_step))

    def _parse_spatial(self) -> Tuple[int, int]:
        try:
            d_size, m_size = (
                int(p) for p in str(self.spatial).lower().split("x")
            )
        except ValueError as e:
            raise ValueError(
                f"trainer.spatial={self.spatial!r}: expected 'DxM' "
                "(data x model axis sizes, e.g. '2x4')"
            ) from e
        return d_size, m_size

    def _bind_spatial_mesh(self):
        """Context binding this trainer's DxM mesh as the global mesh — for
        the duration of one entry point only, so later non-spatial work in
        the process keeps full-device DP (see parallel.mesh.mesh_scope)."""
        if not self.spatial:
            return contextlib.nullcontext()
        from satflow_tpu.parallel.mesh import make_mesh, mesh_scope

        if self._spatial_mesh is None:
            d_size, m_size = self._parse_spatial()
            self._spatial_mesh = make_mesh([d_size, m_size])
        # spatial_axis="model": loaders sharding through this scope place H
        # over the model axis at device_put, so the shard_map rollout reads
        # batches in place (no per-step SPMD replicate at the mesh boundary).
        return mesh_scope(self._spatial_mesh, spatial_axis="model")

    def fit(self, model, datamodule) -> Dict[str, float]:
        with self._bind_spatial_mesh():
            return self._fit_impl(model, datamodule)

    def _fit_impl(self, model, datamodule) -> Dict[str, float]:
        rng = jax.random.PRNGKey(self.seed)
        # a reused Trainer (tune -> fit, or fit after an early stop) starts clean
        self.should_stop = False
        self.preempted = False
        self.model = model
        train_loader = datamodule.train_dataloader()
        if self.overfit_batches:
            # debug harness: reuse the same first-N batches for train AND val
            # (the reference trainer's overfit_batches knob, SURVEY §4)
            cached = []
            for i, b in enumerate(train_loader):
                cached.append(b)
                if i + 1 >= self.overfit_batches:
                    break
            train_loader = cached
            datamodule = _OverfitDataModule(cached)
        self._build_state(model, rng, train_loader)

        if model.is_gan:
            train_step = make_gan_train_step(model, mode=self.gan_step_mode)
            eval_step = make_gan_eval_step(model)
        else:
            train_step = make_train_step(model)
            eval_step = make_eval_step(model)

        for cb in self.callbacks:
            cb.on_train_start(self)

        n_train = self._limit(len(train_loader), self.limit_train_batches)
        if self.fast_dev_run:
            n_train = 1
        epochs = 1 if self.fast_dev_run else self.max_epochs

        profile_ctx = None
        if self.profiler:
            profile_ctx = jax.profiler.trace(self.profile_dir)
            profile_ctx.__enter__()

        # Preemption safety (beyond the reference, which has no failure
        # recovery — SURVEY §5.3): on SIGTERM (the TPU-VM/k8s preemption
        # signal), finish the in-flight step, checkpoint through the
        # callbacks' on_preemption hooks, and stop cleanly; the run resumes
        # via resume_from_checkpoint with optimizer state and step counters
        # intact.
        prev_handler = None
        if self.handle_preemption and threading.current_thread() is threading.main_thread():
            def _on_sigterm(signum, frame):  # noqa: ARG001
                log.warning(
                    "SIGTERM: stopping after the current step and checkpointing"
                )
                self.preempted = True
                self.should_stop = True

            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)

        step_rng = jax.random.PRNGKey(self.seed + 1)
        try:
            for epoch in range(epochs):
                if self.should_stop:
                    break
                t_epoch = time.time()
                t_last = t_epoch
                steps_since_log = 0
                pending_finite = None  # (global_step, on-device flag)
                for i, batch in enumerate(train_loader):
                    if i >= n_train or self.should_stop:
                        break
                    step_rng, sub = jax.random.split(step_rng)
                    self.last_batch = batch
                    self.state, metrics = train_step(self.state, batch, sub)
                    self.global_step += 1
                    steps_since_log += 1
                    if self.terminate_on_nan and "finite" in metrics:
                        # Check the PREVIOUS step's on-device flag: by the time
                        # step t is dispatched, t-1 has usually completed, so
                        # the device_get doesn't stall the pipeline (a same-step
                        # fetch would force a host sync every step). Detection
                        # lag: one step.
                        if pending_finite is not None and not bool(
                            jax.device_get(pending_finite[1])
                        ):
                            log.error(
                                "non-finite loss/grads at step %d; terminating fit",
                                pending_finite[0],
                            )
                            self.should_stop = True
                        pending_finite = (self.global_step, metrics["finite"])
                    if self.global_step % self.log_every_n_steps == 0 or i == n_train - 1:
                        now = time.time()
                        flat = expand_frame_metrics(metrics, "train")
                        flat["train/steps_per_sec"] = steps_since_log / max(
                            now - t_last, 1e-9
                        )
                        t_last = now
                        steps_since_log = 0
                        flat.update(_device_memory_metrics())
                        self.log_metrics(flat, self.global_step)
                        if self.terminate_on_nan and any(
                            isinstance(v, float) and math.isnan(v) for v in flat.values()
                        ):
                            log.error("NaN loss detected; terminating fit")
                            self.should_stop = True
                    for cb in self.callbacks:
                        cb.on_train_batch_end(self, metrics, self.global_step)
                    if self.max_steps and self.global_step >= self.max_steps:
                        self.should_stop = True
                if (
                    self.terminate_on_nan
                    and pending_finite is not None
                    and not bool(jax.device_get(pending_finite[1]))
                ):
                    log.error(
                        "non-finite loss/grads at step %d; terminating fit",
                        pending_finite[0],
                    )
                    self.should_stop = True
                log.info(
                    "epoch %d done in %.1fs (%d steps)",
                    epoch, time.time() - t_epoch, self.global_step,
                )
                if (epoch + 1) % self.check_val_every_n_epoch == 0 and not self.preempted:
                    val_metrics = self._run_eval(
                        eval_step, datamodule.val_dataloader(), "val", step_rng
                    )
                    self.log_metrics(val_metrics, self.global_step)
                    self._plateau_step(val_metrics)
                    for cb in self.callbacks:
                        cb.on_validation_end(self, val_metrics, epoch)
        finally:
            if profile_ctx is not None:
                profile_ctx.__exit__(None, None, None)
            # Keep OUR handler installed through the emergency checkpoint:
            # orchestrators often repeat SIGTERM during the grace period, and
            # restoring SIG_DFL first would kill the process mid-Orbax-save —
            # the exact corruption this feature exists to prevent.
            try:
                if self.preempted:
                    for cb in self.callbacks:
                        cb.on_preemption(self)
            finally:
                if prev_handler is not None:
                    signal.signal(signal.SIGTERM, prev_handler)

        for cb in self.callbacks:
            cb.on_train_end(self)
        for lg in self.loggers:
            lg.finalize()
        return self.callback_metrics

    def validate(self, model=None, datamodule=None) -> Dict[str, float]:
        model = model or self.model
        with self._bind_spatial_mesh():
            if self.state is None:
                self._build_state(model, jax.random.PRNGKey(self.seed),
                                  datamodule.val_dataloader())
                self.model = model
            eval_step = (make_gan_eval_step(model) if model.is_gan
                         else make_eval_step(model))
            metrics = self._run_eval(
                eval_step, datamodule.val_dataloader(), "val",
                jax.random.PRNGKey(self.seed)
            )
        self.log_metrics(metrics, self.global_step)
        return metrics

    def test(self, model=None, datamodule=None) -> Dict[str, float]:
        model = model or self.model
        with self._bind_spatial_mesh():
            if self.state is None:
                self._build_state(model, jax.random.PRNGKey(self.seed),
                                  datamodule.test_dataloader())
            eval_step = (make_gan_eval_step(model) if model.is_gan
                         else make_eval_step(model))
            metrics = self._run_eval(
                eval_step, datamodule.test_dataloader(), "test",
                jax.random.PRNGKey(self.seed)
            )
        self.log_metrics(metrics, self.global_step)
        return metrics

    # -- internals -----------------------------------------------------------

    def _plateau_step(self, val_metrics: Dict[str, float]) -> None:
        """ReduceLROnPlateau: decay the injected LR when the monitored val
        metric stalls (reference cloudgan.py:335-347 'plateau' scheduler)."""
        if self._plateau is None or self.state is None:
            return
        monitor = "val/g_loss" if self.model.is_gan else "val/loss"
        metric = val_metrics.get(monitor, val_metrics.get("val/loss"))
        if metric is None:
            return
        old_scale = self._plateau.scale
        self._plateau.update(float(metric))
        scale = self._plateau.scale
        if scale == old_scale:
            return
        from satflow_tpu.train.schedules import rewrite_learning_rate

        if hasattr(self.state, "opt_state"):
            new_lr = self.model.lr * scale
            log.info("plateau: reducing lr to %.3e", new_lr)
            self.state = self.state.replace(
                opt_state=rewrite_learning_rate(self.state.opt_state, new_lr)
            )
        else:
            # per-optimizer base LRs: scale each, don't clobber disc_lr with
            # the generator's decayed value
            g_lr = getattr(self.model, "gen_lr", self.model.lr) * scale
            d_lr = getattr(self.model, "disc_lr", self.model.lr) * scale
            log.info("plateau: reducing lrs to g=%.3e d=%.3e", g_lr, d_lr)
            self.state = self.state.replace(
                g_opt_state=rewrite_learning_rate(self.state.g_opt_state, g_lr),
                d_opt_state=rewrite_learning_rate(self.state.d_opt_state, d_lr),
            )

    def _build_state(self, model, rng: jax.Array, loader: Iterable) -> None:
        if self.state is not None:
            return
        if self.spatial:
            # "DxM": D-way data parallelism x M-way spatial (H-axis) model
            # parallelism — e.g. trainer.spatial=2x4 on an 8-device mesh.
            # The model must implement enable_spatial (fused ConvLSTM). The
            # mesh itself is bound as the global mesh by _bind_spatial_mesh
            # around each entry point, NOT permanently.
            if not hasattr(model, "enable_spatial"):
                raise ValueError(
                    f"{type(model).__name__} does not support spatial "
                    "parallelism (no enable_spatial)"
                )
            if self._spatial_mesh is None:
                from satflow_tpu.parallel.mesh import make_mesh

                d_size, m_size = self._parse_spatial()
                self._spatial_mesh = make_mesh([d_size, m_size])
            model.enable_spatial(self._spatial_mesh, axis="model")
        # precision: 16/"bf16" → bf16 compute dtype (params stay f32), the TPU
        # analog of the reference's AMP (configs/trainer/half.yaml:36).
        if str(self.precision) in ("16", "bf16", "bfloat16") and getattr(
            model, "dtype", None
        ) is None:
            import jax.numpy as jnp

            model.dtype = jnp.bfloat16
            model.module = model.build_module()
            if model.is_gan:
                model.disc_module = model.build_discriminator()
        first_batch = next(iter(loader))
        if model.is_gan:
            g_vars, d_vars = model.init_gan_variables(rng, first_batch)
            g_params, g_state = model.split_variables(g_vars)
            d_params, d_state = model.split_variables(d_vars)
            model_state = {"g": g_state, "d": d_state}
            g_tx, d_tx = model.make_optimizers()
            g_tx, d_tx = self._wrap_tx(g_tx), self._wrap_tx(d_tx)
            self.state = GANTrainState.create(g_params, d_params, model_state, g_tx, d_tx)
        else:
            variables = model.init_variables(rng, first_batch)
            params, model_state = model.split_variables(variables)
            tx = self._wrap_tx(model.make_optimizer())
            self.state = TrainState.create(params, model_state, tx)
        self._lr_schedule = getattr(model, "lr_schedule", None)
        if getattr(model, "scheduler", None) == "plateau":
            from satflow_tpu.train.schedules import PlateauScheduler

            self._plateau = PlateauScheduler(
                base_lr=getattr(model, "gen_lr", None) or model.lr,
                patience=getattr(model, "lr_epochs", 10) // 2,
            )

        if self.zero_sharding and len(jax.devices()) > 1:
            from satflow_tpu.parallel.zero import apply_zero_sharding

            self.state = apply_zero_sharding(self.state)

        if self.resume_from_checkpoint:
            from satflow_tpu.train.checkpoint import resume_state

            # Restores params, model_state, opt_state (Adam moments, schedule
            # position) and the step counter — Lightning resume semantics.
            self.state, step = resume_state(
                self.state, self.resume_from_checkpoint, model=model
            )
            self.global_step = step

    def _wrap_tx(self, tx: optax.GradientTransformation) -> optax.GradientTransformation:
        chain = []
        if self.gradient_clip_val:
            chain.append(optax.clip_by_global_norm(self.gradient_clip_val))
        chain.append(tx)
        tx = optax.chain(*chain) if len(chain) > 1 else tx
        if self.accumulate_grad_batches > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.accumulate_grad_batches)
        return tx

    def _run_eval(self, eval_step, loader, split: str, rng: jax.Array) -> Dict[str, float]:
        n = self._limit(len(loader), self.limit_val_batches)
        if self.fast_dev_run:
            n = 1
        sums: Dict[str, float] = {}
        count = 0
        for i, batch in enumerate(loader):
            if i >= n:
                break
            rng, sub = jax.random.split(rng)
            metrics = eval_step(self.state, batch, sub)
            flat = expand_frame_metrics(metrics, split)
            for k, v in flat.items():
                sums[k] = sums.get(k, 0.0) + v
            count += 1
        return {k: v / max(count, 1) for k, v in sums.items()}

    @staticmethod
    def _limit(n: int, limit: Optional[float]) -> int:
        if limit is None:
            return n
        if isinstance(limit, float) and limit <= 1.0:
            return max(1, int(n * limit))
        return min(n, int(limit))

    def scale_batch_size(
        self,
        model,
        datamodule,
        init_val: int = 2,
        max_trials: int = 6,
        max_batch_size: Optional[int] = None,
    ) -> int:
        """Power-scaling batch-size finder (the reference's
        ``trainer.tune(auto_scale_batch_size="power")``, train.py:81-83):
        double the batch until the train step OOMs, back off to the last
        good size. Sets ``datamodule.batch_size`` when the attribute exists."""
        import numpy as _np

        from satflow_tpu.train.state import GANTrainState, TrainState
        from satflow_tpu.train.steps import make_gan_train_step, make_train_step

        rng = jax.random.PRNGKey(self.seed)
        first = next(iter(datamodule.train_dataloader()))

        def resize(batch, n):
            def grow(arr):
                arr = _np.asarray(arr)
                reps = (n + arr.shape[0] - 1) // arr.shape[0]
                return _np.tile(arr, (reps,) + (1,) * (arr.ndim - 1))[:n]

            return jax.tree_util.tree_map(grow, batch)

        def probe(size):
            # Probe with the REAL step + optimizer(s): a cheap SGD/plain-loss
            # probe underestimates memory (Adam moments, discriminator
            # params/activations) and picks a size that OOMs in fit.
            batch = resize(first, size)
            if model.is_gan:
                g_vars, d_vars = model.init_gan_variables(rng, batch)
                g_params, g_state = model.split_variables(g_vars)
                d_params, d_state = model.split_variables(d_vars)
                g_tx, d_tx = model.make_optimizers()
                state = GANTrainState.create(
                    g_params, d_params, {"g": g_state, "d": d_state},
                    self._wrap_tx(g_tx), self._wrap_tx(d_tx),
                )
                state, metrics = make_gan_train_step(model)(state, batch, rng)
                jax.block_until_ready(metrics["g_loss"])
            else:
                variables = model.init_variables(rng, batch)
                params, model_state = model.split_variables(variables)
                state = TrainState.create(
                    params, model_state, self._wrap_tx(model.make_optimizer())
                )
                state, metrics = make_train_step(model)(state, batch, rng)
                jax.block_until_ready(metrics["loss"])

        good = 0
        size = max(1, init_val)
        for _ in range(max_trials):
            if max_batch_size and size > max_batch_size:
                break
            try:
                probe(size)
                good = size
                size *= 2
            except Exception as e:  # noqa: BLE001 - OOM/compile failure: back off
                log.info("scale_batch_size: %d failed (%s); keeping %d",
                         size, type(e).__name__, good)
                break
        if good == 0:
            raise RuntimeError(
                f"scale_batch_size: even batch {init_val} failed to run; "
                f"not overriding the configured batch size"
            )
        if hasattr(datamodule, "batch_size"):
            datamodule.batch_size = good
        log.info("scale_batch_size: selected %d", good)
        return good

    def tune(self, model, datamodule, num_steps: int = 30,
             min_lr: float = 1e-6, max_lr: float = 1.0,
             auto_lr_find: bool = True,
             auto_scale_batch_size: bool = False) -> float:
        """LR range finder + optional batch-size scaling (the reference's
        trainer.tune, train.py:81-83): sweep LR exponentially over a few steps
        and return the LR one decade below the loss blow-up point; sets
        model.lr. With ``auto_scale_batch_size``, first runs
        :meth:`scale_batch_size`."""
        if auto_scale_batch_size:
            self.scale_batch_size(model, datamodule)
        if not auto_lr_find:
            return model.lr
        import math as _math

        import numpy as _np
        import optax

        from satflow_tpu.train.steps import make_train_step
        from satflow_tpu.train.state import TrainState

        rng = jax.random.PRNGKey(self.seed)
        loader = datamodule.train_dataloader()
        first = next(iter(loader))
        variables = model.init_variables(rng, first)
        params, model_state = model.split_variables(variables)
        schedule = optax.exponential_decay(
            min_lr, transition_steps=num_steps,
            decay_rate=max_lr / min_lr,  # grows: rate > 1
        )
        state = TrainState.create(params, model_state, optax.sgd(schedule))
        step = make_train_step(model)
        losses, lrs = [], []
        it = iter(loader)
        for i in range(num_steps):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(loader)
                batch = next(it)
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub)
            loss = float(jax.device_get(metrics["loss"]))
            if not _math.isfinite(loss):
                break
            losses.append(loss)
            lrs.append(float(schedule(i)))
        if len(losses) < 3:
            return model.lr
        # steepest descent point, one decade of headroom
        grads = _np.gradient(_np.asarray(losses))
        best = int(_np.argmin(grads))
        suggestion = max(lrs[best] / 10.0, min_lr)
        log.info("tune: suggested lr %.2e", suggestion)
        model.lr = suggestion
        return suggestion


def _device_memory_metrics() -> Dict[str, float]:
    """HBM usage metrics (the reference's log_gpu_memory knob, trainer
    default.yaml:13); empty when the backend doesn't expose stats."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        out = {}
        if "bytes_in_use" in stats:
            out["mem/bytes_in_use_gb"] = stats["bytes_in_use"] / 1e9
        if "peak_bytes_in_use" in stats:
            out["mem/peak_gb"] = stats["peak_bytes_in_use"] / 1e9
        return out
    except Exception:  # noqa: BLE001
        return {}


class _OverfitDataModule:
    def __init__(self, batches):
        self._batches = list(batches)

    def _loader(self):
        return self._batches

    def train_dataloader(self):
        return self._loader()

    def val_dataloader(self):
        return self._loader()

    def test_dataloader(self):
        return self._loader()
