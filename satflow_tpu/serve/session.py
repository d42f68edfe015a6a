"""Compiled inference sessions and cross-request micro-batching.

``InferenceSession`` wraps a registry model (or any ``create_model`` source
string — ``local:<ckpt>``, ``torch:<path.ckpt>``, ``hf_hub:<repo>``) behind
ONE jitted fixed-shape forward: requests are zero-padded up to the compiled
``max_batch`` so XLA never recompiles on traffic patterns, and the pad rows
ride the same MXU tiles (padding to the compiled batch is cheaper than a
recompile by ~4 orders of magnitude).

``MicroBatcher`` coalesces concurrent requests into one forward call — chip
utilization on the rollout scales with batch (docs/DESIGN.md: b16 1016 →
b56 1357 f/s), so serving singles individually wastes most of the MXU.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np


class InferenceSession:
    """Fixed-shape compiled forward over a loaded model.

    Parameters
    ----------
    model: a BaseModel instance, or a ``create_model`` source string.
    max_batch: the compiled batch size; requests are padded up to it.
    variables: explicit variables; defaults to ``model.restored_variables``
        (set by checkpoint loading) and falls back to fresh init for tests.
    dtype: optional compute dtype for the input cast (e.g. jnp.bfloat16).
    """

    def __init__(
        self,
        model: Any,
        max_batch: int = 8,
        variables: Optional[dict] = None,
        dtype: Any = None,
        out_dtype: Any = None,
        quantize: Optional[str] = None,
        mesh: Any = None,
        donate: bool = False,
    ):
        import jax

        if isinstance(model, str):
            from satflow_tpu.core.registry import create_model
            import satflow_tpu.models  # noqa: F401 - populate the registry

            model = create_model(model)
        self.model = model
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        if quantize and getattr(model, "is_gan", False):
            raise ValueError("int8 serving supports forward models only")
        self.quantize = quantize
        # DP serving: shard each padded request batch over mesh['data'] so
        # one session drives every chip on the host; XLA compiles the sharded
        # program once (multi-chip analog of the training data layout)
        self.mesh = mesh
        if mesh is not None:
            if quantize is not None:
                # the int8 rollout is a Mosaic custom call GSPMD cannot
                # auto-partition — DP-shard the bf16 path instead
                raise ValueError("mesh-sharded serving does not support "
                                 "quantize='int8'")
            if "data" not in mesh.shape:
                raise ValueError(
                    f"mesh axes {tuple(mesh.shape)} lack a 'data' axis"
                )
            if int(max_batch) % mesh.shape["data"]:
                raise ValueError(
                    f"max_batch={max_batch} must divide by the data axis "
                    f"({mesh.shape['data']}) for sharded serving"
                )
        self.max_batch = int(max_batch)
        self.dtype = dtype
        # wire format: predictions are cast to this before leaving the device
        # (e.g. jnp.float16 halves the host/PCIe transfer — the dominant cost
        # of a serving request next to the ~0.2 s forward)
        self.out_dtype = out_dtype
        variables = variables if variables is not None else getattr(
            model, "restored_variables", None
        )
        if variables is None:
            raise ValueError(
                "model has no restored_variables; load it from a checkpoint "
                "(local:/torch:/hf_hub:) or pass variables= explicitly"
            )
        self._variables = variables
        if quantize == "int8":
            # inference-only int8 rollout (fused ConvLSTM cores only): the
            # h carries ride the scan as int8 and the gate convs run on the
            # int8 MXU path; accuracy deltas are gated in tests/test_int8.py
            if dtype is not None or donate:
                raise ValueError(
                    "dtype/donate do not apply to quantize='int8' (the "
                    "rollout quantizes its own inputs)"
                )
            from satflow_tpu.ops.pallas.fused_convlstm_int8 import (
                int8_rollout,
                quantize_convlstm_params,
            )

            try:
                self._qparams = quantize_convlstm_params(variables["params"])
            except (KeyError, ValueError) as e:
                raise ValueError(
                    "int8 serving requires a fused-cell ConvLSTM model "
                    "(EncoderDecoderConvLSTM with cell_impl='fused')"
                ) from e
            steps = int(getattr(model, "forecast_steps"))

            def _forward_int8(qp, x):
                import jax.numpy as jnp

                y = int8_rollout(qp, x, steps)
                return y.astype(self.out_dtype or jnp.float32)

            self._variables = self._qparams
            self._jitted = jax.jit(_forward_int8)
        elif getattr(model, "is_gan", False):
            # generative families (CloudGAN / DGMR): serve generator samples.
            # The rng is derived from a per-call counter so repeated requests
            # draw fresh samples while the compiled program stays fixed.
            if donate:
                raise ValueError("donate is not supported on the GAN path")
            # checkpoint-loaded GAN models carry BOTH networks
            # ({'params': {'generator', 'discriminator'}, 'g', 'd'} — see
            # train/checkpoint.py); serving needs the generator subtree.
            if "generator" in (variables.get("params") or {}):
                self._variables = {
                    "params": variables["params"]["generator"],
                    **(variables.get("g") or {}),
                }
            self._sample_counter = 0

            def _forward_gan(variables, x, seed):
                import jax.numpy as jnp

                rng = jax.random.PRNGKey(0)
                rng = jax.random.fold_in(rng, seed)
                if self.dtype is not None:
                    x = x.astype(self.dtype)
                y, _ = model.generate(variables, x, rng, train=False)
                return y.astype(self.out_dtype or jnp.float32)

            self._jitted_gan = jax.jit(_forward_gan)
            self._jitted = None
        else:
            self._jitted = jax.jit(
                self._forward, donate_argnums=(1,) if donate else ()
            )
        self._lock = threading.Lock()  # one in-flight forward per session

    def _forward(self, variables, x):
        import jax.numpy as jnp

        if self.dtype is not None:
            x = x.astype(self.dtype)
        y = self.model.forward(variables, x)
        return y.astype(self.out_dtype or jnp.float32)

    @property
    def forecast_steps(self) -> int:
        return int(getattr(self.model, "forecast_steps", 0))

    def info(self) -> dict:
        hp = dict(self.model.hparams())
        hp["max_batch"] = self.max_batch
        return hp

    def check_input_range(self, x: np.ndarray) -> None:
        """Reject out-of-range int8 inputs (no-op for non-quantized sessions).

        The int8 activation scale is fixed for [-1, 1] inputs;
        quantize_activations would silently clip anything outside (e.g.
        standardized radiances spanning +/-3). MicroBatcher calls this
        per REQUEST before pooling, so one out-of-range client cannot fail
        a coalesced batch for everyone else."""
        if getattr(self, "_qparams", None) is not None and x.size:
            amax = float(np.max(np.abs(x)))
            if amax > 1.0 + 1e-3:
                raise ValueError(
                    f"quantize='int8' expects inputs in [-1, 1]; got "
                    f"|x|max={amax:.3g} — normalize inputs or use the bf16 path"
                )

    def predict(self, x: np.ndarray) -> np.ndarray:
        """(B, T, H, W, C) -> (B, forecast_steps, H', W', C') for B <= max_batch.

        Pads the batch to ``max_batch`` (one compiled program) and strips the
        pad rows from the result. Larger batches are chunked.
        """
        x = np.asarray(x)
        if x.ndim == 4:  # single sample convenience
            return self.predict(x[None])[0]
        self.check_input_range(x)
        b = x.shape[0]
        if b > self.max_batch:
            outs = [
                self.predict(x[i : i + self.max_batch])
                for i in range(0, b, self.max_batch)
            ]
            return np.concatenate(outs, axis=0)
        if b < self.max_batch:
            pad = np.zeros((self.max_batch - b,) + x.shape[1:], x.dtype)
            x = np.concatenate([x, pad], axis=0)
        if self.mesh is not None:
            import jax

            from satflow_tpu.parallel.mesh import batch_sharding

            x = jax.device_put(x, batch_sharding(self.mesh))
        with self._lock:
            if self._jitted is None:  # GAN sampling path
                seed = self._sample_counter
                self._sample_counter += 1
                y = self._jitted_gan(self._variables, x, seed)
            else:
                y = self._jitted(self._variables, x)
        return np.asarray(y)[:b]


class _Pending:
    __slots__ = ("x", "event", "result", "error", "abandoned")

    def __init__(self, x: np.ndarray):
        self.x = x
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None
        # set by submit() on timeout: the caller is gone, don't burn a
        # forward on it (load shedding under sustained overload)
        self.abandoned = False


class MicroBatcher:
    """Coalesce concurrent single requests into one compiled forward.

    A worker thread collects requests for up to ``window_ms`` (or until
    ``session.max_batch`` samples are queued) and runs them as one padded
    batch. ``submit`` blocks the calling thread until its slice is ready —
    the server handles each HTTP request on its own thread, so N concurrent
    clients fill the batch.
    """

    def __init__(self, session: InferenceSession, window_ms: float = 5.0):
        self.session = session
        self.window = window_ms / 1000.0
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        self.batches_run = 0  # observability: how many forwards were issued

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        # fail queued requests immediately: their submit() callers must not
        # sit out their full timeout against a dead worker
        while True:
            try:
                p = self._q.get_nowait()
            except queue.Empty:
                break
            p.error = RuntimeError("MicroBatcher closed")
            p.event.set()

    def submit(self, x: np.ndarray, timeout: Optional[float] = None) -> np.ndarray:
        """One (T, H, W, C) sample or (b, T, H, W, C) micro-batch."""
        if self._stop.is_set():
            raise RuntimeError("MicroBatcher closed")
        x = np.asarray(x)
        single = x.ndim == 4
        if single:
            x = x[None]
        # per-request validation BEFORE pooling: a 400-class client fault
        # must fail only its own request, not the coalesced group
        self.session.check_input_range(x)
        p = _Pending(x)
        self._q.put(p)
        if self._stop.is_set() and not p.event.is_set():
            # raced with close(): the worker may already be gone
            p.error = p.error or RuntimeError("MicroBatcher closed")
            p.event.set()
        if not p.event.wait(timeout):
            p.abandoned = True
            raise TimeoutError("inference request timed out")
        if p.error is not None:
            raise p.error
        return p.result[0] if single else p.result

    # -- worker ---------------------------------------------------------------

    def _collect(self) -> List[_Pending]:
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        group = [first]
        total = first.x.shape[0]
        deadline = _now() + self.window
        while total < self.session.max_batch:
            remaining = deadline - _now()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            group.append(nxt)
            total += nxt.x.shape[0]
        return group

    def _run(self) -> None:
        while not self._stop.is_set():
            group = self._collect()
            if not group:
                continue
            # shed requests whose submit() already timed out: under sustained
            # overload the backlog is full of abandoned work, and spending
            # forwards on it starves the live requests into timing out too
            group = [p for p in group if not p.abandoned]
            if not group:
                continue
            # one forward per distinct sample shape: a misshapen request must
            # not poison the well-formed ones sharing its window
            by_shape: dict = {}
            for p in group:
                by_shape.setdefault(p.x.shape[1:], []).append(p)
            for shaped in by_shape.values():
                try:
                    x = np.concatenate([p.x for p in shaped], axis=0)
                    y = self.session.predict(x)
                    self.batches_run += 1
                    off = 0
                    for p in shaped:
                        n = p.x.shape[0]
                        p.result = y[off : off + n]
                        off += n
                except BaseException as e:  # noqa: BLE001 - delivered to callers
                    for p in shaped:
                        p.error = e
                finally:
                    for p in shaped:
                        p.event.set()


def _now() -> float:
    import time

    return time.monotonic()
