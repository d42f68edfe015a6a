"""Encoder-decoder ConvLSTM nowcaster — the canonical recurrent model.

Behavioral parity with reference satflow/models/conv_lstm.py:14-228: a 2-layer
ConvLSTM encoder consumes the past frames, its final hidden state seeds a 2-layer
ConvLSTM decoder that rolls forward autoregressively (feeding its own hidden state
back as the next input), and a (1,3,3) conv head + sigmoid maps hidden states to
output frames.

TPU-native design (this file is the north-star rollout of BASELINE.json):
- Layout is (B, T, H, W, C); both temporal loops are ``nn.scan``/``lax.scan`` —
  one compiled XLA while-loop each, with the gate convs hoisted — replacing the
  reference's per-timestep Python loops (conv_lstm.py:176-196).
- The decoder's autoregressive feedback lives in the scan carry
  (h3, c3, h4, c4, encoder_vector), so the whole 48-step rollout is a single
  fused device program with zero host round-trips.
- The (1,3,3) Conv3d head is applied as one batched 2D conv over B·T folded
  frames (identical math, bigger MXU tiles).
- Optional bf16 compute dtype for MXU throughput; params stay f32.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from satflow_tpu.core.registry import register_model
from satflow_tpu.models.base import BaseModel
from satflow_tpu.nn.recurrent import (
    ConvLSTMCell,
    FusedConvLSTMCell,
    InputGateConv,
    SplitConvLSTMCell,
)


class _EncoderStepFused(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, x_t):
        # padded-IO throughout: x_t arrives (B, H, W+2, C); h states stay
        # (W+2)-padded across the scan — no per-step jnp.pad round-trips.
        s1, s2 = carry
        s1, h1 = FusedConvLSTMCell(self.features, padded_io=True,
                                   dtype=self.dtype, name="encoder_1")(s1, x_t)
        s2, h2 = FusedConvLSTMCell(self.features, padded_io=True,
                                   dtype=self.dtype, name="encoder_2")(s2, h1)
        return (s1, s2), h2


class _DecoderStepFused(nn.Module):
    features: int
    dtype: Any = None
    head_channels: int = 0  # >0: apply the output head inside the scan step

    @nn.compact
    def __call__(self, carry, _):
        s3, s4, v = carry
        s3, h3 = FusedConvLSTMCell(self.features, padded_io=True,
                                   dtype=self.dtype, name="decoder_1")(s3, v)
        s4, h4 = FusedConvLSTMCell(self.features, padded_io=True,
                                   dtype=self.dtype, name="decoder_2")(s4, h3)
        # h4 is (B, H, W+2, C): the head consumes it with VALID-W padding;
        # without a head, emit the unpadded frame for the output stack.
        out = (
            _maybe_head(h4, self.head_channels, self.dtype, padded_w=True)
            if self.head_channels
            else h4[:, :, 1:-1]
        )
        return (s3, s4, h4), out


class _CMajorCellParams(nn.Module):
    """Parameter holder matching :class:`FusedConvLSTMCell`'s tree
    (``x_gates_kernel`` / ``h_gates_kernel`` / ``bias``) so fused-trained
    checkpoints serve on the C-major decoder unchanged."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        wx = self.param("x_gates_kernel", nn.initializers.lecun_normal(),
                        (3, 3, self.in_features, 4 * self.features))
        wh = self.param("h_gates_kernel", nn.initializers.lecun_normal(),
                        (3, 3, self.features, 4 * self.features))
        b = self.param("bias", nn.initializers.zeros_init(),
                       (4 * self.features,))
        return wx, wh, b


class _CMajorHeadParams(nn.Module):
    """Parameter holder matching ``nn.Conv``'s kernel/bias tree (the head)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class _DecoderStepCMajor(nn.Module):
    """Autoregressive decoder step on flat channel-major carries (B, C, SP).

    Same math and param tree as :class:`_DecoderStepFused`, but the carries
    never leave the C-major layout: each cell is one ``cmajor_convlstm_step``
    kernel — the 3x3 conv as nine lane-aligned MXU matmuls, replacing the
    NHWC kernel's sublane-shifted window reads (measured 1.225x at the
    ceiling-study shape, docs/DESIGN.md) — and the output head is a
    ``cmajor_conv3x3`` on h4. Layout converts happen once per ROLLOUT at the
    scan boundary, not once per step."""

    features: int
    head_channels: int
    block_h: int
    height: int
    width: int
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, _):
        from satflow_tpu.ops.pallas.cmajor_convlstm import (
            cmajor_conv3x3,
            cmajor_convlstm_step,
        )

        (h3, c3), (h4, c4), v = carry
        cdtype = self.dtype or v.dtype
        wx1, wh1, b1 = _CMajorCellParams(
            self.features, self.features, name="decoder_1")()
        wx2, wh2, b2 = _CMajorCellParams(
            self.features, self.features, name="decoder_2")()
        geo = (self.block_h, self.height, self.width)
        h3, c3 = cmajor_convlstm_step(
            v, h3, c3, wx1.astype(cdtype), wh1.astype(cdtype),
            b1.astype(cdtype), *geo)
        h4, c4 = cmajor_convlstm_step(
            h3, h4, c4, wx2.astype(cdtype), wh2.astype(cdtype),
            b2.astype(cdtype), *geo)
        wk, wb = _CMajorHeadParams(
            self.head_channels, self.features, name="head")()
        out = cmajor_conv3x3(h4, wk.astype(cdtype), wb.astype(cdtype), *geo)
        return ((h3, c3), (h4, c4), h4), out


class _EncoderStepSplit(nn.Module):
    """Encoder step on precomputed input gates (split-conv fast path)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, xg_t):
        s1, s2 = carry
        s1, h1 = SplitConvLSTMCell(self.features, x_precomputed=True,
                                   dtype=self.dtype, name="encoder_1")(s1, xg_t)
        s2, h2 = SplitConvLSTMCell(self.features, dtype=self.dtype,
                                   name="encoder_2")(s2, h1)
        return (s1, s2), h2


class _DecoderStepSplit(nn.Module):
    features: int
    dtype: Any = None
    head_channels: int = 0

    @nn.compact
    def __call__(self, carry, _):
        s3, s4, v = carry
        s3, h3 = SplitConvLSTMCell(self.features, dtype=self.dtype,
                                   name="decoder_1")(s3, v)
        s4, h4 = SplitConvLSTMCell(self.features, dtype=self.dtype,
                                   name="decoder_2")(s4, h3)
        out = _maybe_head(h4, self.head_channels, self.dtype)
        return (s3, s4, h4), out


class _EncoderStep(nn.Module):
    """One timestep through the 2-layer encoder stack."""

    features: int
    conv_type: str
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, x_t):
        s1, s2 = carry
        s1, h1 = ConvLSTMCell(self.features, conv_type=self.conv_type,
                              dtype=self.dtype, name="encoder_1")(s1, x_t)
        s2, h2 = ConvLSTMCell(self.features, conv_type=self.conv_type,
                              dtype=self.dtype, name="encoder_2")(s2, h1)
        return (s1, s2), h2


class _DecoderStep(nn.Module):
    """One autoregressive decoder step: input is the previous step's output."""

    features: int
    conv_type: str
    dtype: Any = None
    head_channels: int = 0

    @nn.compact
    def __call__(self, carry, _):
        s3, s4, v = carry
        s3, h3 = ConvLSTMCell(self.features, conv_type=self.conv_type,
                              dtype=self.dtype, name="decoder_1")(s3, v)
        s4, h4 = ConvLSTMCell(self.features, conv_type=self.conv_type,
                              dtype=self.dtype, name="decoder_2")(s4, h3)
        out = _maybe_head(h4, self.head_channels, self.dtype)
        return (s3, s4, h4), out


class _EncoderScan(nn.Module):
    """The full encoder scan as one module, so it can be nn.remat-wrapped.

    With per-step remat the scan still saves every step's carry for the
    backward (~270 MB × history steps at 256px b8) and those residuals stay
    alive through the entire DECODER backward. Rematerializing the whole
    encoder saves only its inputs/outputs; the per-step carries exist only
    transiently during the encoder's own backward — after the decoder's
    transients are freed.
    """

    step_cls: type
    step_args: Tuple
    unroll: int

    @nn.compact
    def __call__(self, carry, xs):
        scan = nn.scan(
            self.step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            unroll=self.unroll,
        )(*self.step_args, name="steps")
        return scan(carry, xs)


class _DecoderChunk(nn.Module):
    """``chunk`` decoder steps fused into ONE outer-scan step (sqrt remat).

    Per-step remat still saves every step's scan carry — at 256px training
    shapes that is ~338 MB × forecast_steps (the ~8 GB that kept batch 8 from
    fitting in 15.75 GB HBM). Wrapping this module in ``nn.remat`` inside an
    outer scan saves only per-CHUNK carries (chunk× fewer) and recomputes each
    chunk's forward once during the backward — the classic sqrt-remat
    memory/recompute trade (SURVEY §5.7), applied to the rollout dimension.
    """

    step_cls: type
    step_args: Tuple
    chunk: int
    unroll: int

    @nn.compact
    def __call__(self, carry, _):
        scan = nn.scan(
            self.step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            length=self.chunk,
            unroll=min(self.unroll, self.chunk),
        )(*self.step_args, name="steps")
        return scan(carry, None)


def _largest_divisor_at_most(n: int, k: int) -> int:
    k = max(1, min(k, n))
    while n % k:
        k -= 1
    return k


def _maybe_head(h4: jax.Array, head_channels: int, dtype,
                padded_w: bool = False) -> jax.Array:
    """Apply the (1,3,3)-Conv3d-equivalent output head inside the scan step.

    With the head in-scan, the decoder stacks (B, T, H, W, out) frames instead
    of (B, T, H, W, hidden) states — at hidden=64/out=12 that is 5.3x less
    stacked activation (and gradient) memory, the difference between OOM and
    fitting for 256px training (measured 25.1 GB -> fits in 15.75 GB HBM).
    Identical math: the head is a per-frame 3x3 conv either way.

    ``padded_w``: h4 arrives (B, H, W+2, C) from a padded-IO cell — the head
    conv then runs SAME on H but VALID on W (its zero halo columns ARE the
    conv's W padding), yielding (B, H, W, out) with zero extra copies.
    """
    if not head_channels:
        return h4
    padding = ((1, 1), (0, 0)) if padded_w else "SAME"
    return nn.Conv(head_channels, (3, 3), padding=padding, dtype=dtype,
                   name="head")(h4)


class ConvLSTMCore(nn.Module):
    """Pure forward: (B, T, H, W, C_in) -> (B, forecast_steps, H, W, C_out)."""

    hidden_dim: int = 64
    out_channels: int = 1
    forecast_steps: int = 48
    conv_type: str = "standard"
    # Cell formulations (identical math, different op schedules):
    #  - "concat": one conv over concat([x, h]) per cell (reference layout).
    #  - "split":  conv_x(x) + conv_h(h); encoder input convs hoisted out of
    #    the scan as one folded batch conv; no concat buffers.
    #  - "hybrid": split/hoisted encoder + concat decoder (one conv per cell).
    #  - "fused": every cell runs as ONE Pallas kernel (both convs + gates +
    #    state in VMEM, ops/pallas/fused_convlstm_step.py) — measured 656 →
    #    880 frames/s on the v5e rollout bench; exact XLA fallback off-TPU.
    #  - "cmajor": fused encoder + channel-major flat-lane DECODER
    #    (ops/pallas/cmajor_convlstm.py): the autoregressive carries stay in
    #    (B, C, SP) layout across the whole rollout, each cell is nine
    #    lane-aligned MXU matmuls (measured 1.225x over the NHWC fused step
    #    at the ceiling-study shape). Requires W%128==0, hidden%8==0 and
    #    head_in_scan; degrades to "fused" elsewhere. Inference-oriented:
    #    its backward routes through the exact NHWC reference step.
    cell_impl: str = "fused"
    unroll: int = 1
    # rematerialize per-step activations in the backward pass: the 48-step
    # rollout's residuals exceed HBM at 256px training shapes (measured: 28 GB
    # needed vs 15.75 GB on v5e at B=8); remat trades recompute for memory
    # (SURVEY §5.7 scan-over-layers remat).
    remat: bool = False
    # >1: sqrt-remat the DECODER rollout — group remat_chunk steps into one
    # rematerialized outer-scan step, so only per-chunk carries are saved
    # (remat_chunk× less carry memory, one extra chunk-forward recompute in
    # the backward). Enables 256px b8 training on one 16 GB chip (per-step
    # remat saves ~8 GB of decoder carries alone). Only active with remat.
    remat_chunk: int = 0
    # apply the output head inside the decoder scan: stacks (B,T,H,W,out)
    # frames instead of (B,T,H,W,hidden) states — 5.3x less stacked
    # activation+gradient memory at the production sizes (see _maybe_head).
    head_in_scan: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        forecast_steps: Optional[int] = None,
        train: bool = False,
    ) -> jax.Array:
        del train  # no train-mode state in this core
        steps = forecast_steps if forecast_steps is not None else self.forecast_steps
        b, t, h, w, _ = x.shape
        cdtype = self.dtype or x.dtype
        x = x.astype(cdtype)
        std = self.conv_type == "standard"
        # "cmajor" shares the fused encoder (and the fused decoder wherever
        # the C-major geometry/mode gate below declines the rollout).
        fused = self.cell_impl in ("fused", "cmajor") and std
        split_enc = self.cell_impl in ("split", "hybrid") and std
        split_dec = self.cell_impl == "split" and std

        scan_kwargs = dict(
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            unroll=self.unroll,
        )

        def step_cls(cls):
            return nn.remat(cls, prevent_cse=False) if self.remat else cls

        # The param-tree layout (nested decoder/steps vs flat) must be STATIC:
        # derive it from the configured forecast_steps, never the call-time
        # override — otherwise apply(v, x, forecast_steps=k) would look up
        # params in the wrong scope. The runtime chunk size re-divides the
        # actual step count (any divisor gives the identical param tree,
        # since params are broadcast over both scan levels; chunk 1 degrades
        # to per-step outer scan in the nested layout).
        chunked_layout = (
            self.remat
            and self.remat_chunk > 1
            and _largest_divisor_at_most(self.forecast_steps, self.remat_chunk) > 1
        )
        chunk = (
            _largest_divisor_at_most(steps, self.remat_chunk)
            if chunked_layout
            else 1
        )
        init = (
            ConvLSTMCell.init_carry(b, h, w, self.hidden_dim, cdtype),
            ConvLSTMCell.init_carry(b, h, w, self.hidden_dim, cdtype),
        )
        if fused:
            # padded-IO flow: pad the input sequence's W ONCE; h states stay
            # (W+2)-padded across both scans (no per-step pad round-trips).
            xpad = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
            enc_init = (
                FusedConvLSTMCell.init_carry_padded(b, h, w, self.hidden_dim, cdtype),
                FusedConvLSTMCell.init_carry_padded(b, h, w, self.hidden_dim, cdtype),
            )
            enc_cls, enc_args, enc_xs = (
                _EncoderStepFused, (self.hidden_dim, self.dtype), xpad
            )
        elif split_enc:
            # all encoder input-side gate convs in ONE folded batch conv
            xg = InputGateConv(self.hidden_dim, dtype=self.dtype,
                               name="encoder_input_gates")(x)
            enc_init = init
            enc_cls, enc_args, enc_xs = (
                _EncoderStepSplit, (self.hidden_dim, self.dtype), xg
            )
        else:
            enc_init = init
            enc_cls, enc_args, enc_xs = (
                _EncoderStep, (self.hidden_dim, self.conv_type, self.dtype), x
            )
        if chunked_layout:
            # whole-encoder remat (see _EncoderScan): its per-step carries
            # must not stay resident through the decoder backward.
            encoder = nn.remat(_EncoderScan, prevent_cse=False)(
                enc_cls, enc_args, self.unroll, name="encoder"
            )
            (s1, s2), _ = encoder(enc_init, enc_xs)
        else:
            encoder = nn.scan(step_cls(enc_cls), **scan_kwargs)(
                *enc_args, name="encoder"
            )
            (s1, s2), _ = encoder(enc_init, enc_xs)
        encoder_vector = s2[0]  # final hidden state of layer 2 (conv_lstm.py:184-186)

        head_ch = self.out_channels if self.head_in_scan else 0
        if self.cell_impl == "cmajor" and std and not chunked_layout:
            from satflow_tpu.ops.pallas.cmajor_convlstm import (
                cmajor_supported,
                default_block_h,
                from_cmajor_seq,
                to_cmajor,
            )

            if self.head_in_scan and cmajor_supported(h, w, self.hidden_dim):
                bh = default_block_h(h)
                decoder = nn.scan(
                    step_cls(_DecoderStepCMajor), **dict(scan_kwargs, length=steps)
                )(self.hidden_dim, head_ch, bh, h, w, self.dtype, name="decoder")
                # one layout convert per rollout: strip the encoder's W halo,
                # go C-major; zero carries are born in-layout
                v0 = to_cmajor(encoder_vector[:, :, 1:-1], bh)
                zc = jnp.zeros_like(v0)
                _, out_seq = decoder(((zc, zc), (zc, zc), v0), None)
                out = from_cmajor_seq(out_seq, h, w, bh)  # (B, steps, H, W, out)
                return nn.sigmoid(out)
        if fused:
            dec_cls, dec_args = _DecoderStepFused, (self.hidden_dim, self.dtype,
                                                    head_ch)
        elif split_dec:
            dec_cls, dec_args = _DecoderStepSplit, (self.hidden_dim, self.dtype,
                                                    head_ch)
        else:
            dec_cls, dec_args = _DecoderStep, (self.hidden_dim, self.conv_type,
                                               self.dtype, head_ch)
        if chunked_layout:
            # sqrt remat: outer scan of rematerialized chunk modules; only the
            # per-chunk carries are saved for the backward (see _DecoderChunk).
            decoder = nn.scan(
                nn.remat(_DecoderChunk, prevent_cse=False),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
                length=steps // chunk,
            )(dec_cls, dec_args, chunk, self.unroll, name="decoder")
        else:
            dec_scan_kwargs = dict(scan_kwargs, length=steps)
            decoder = nn.scan(step_cls(dec_cls), **dec_scan_kwargs)(
                *dec_args, name="decoder"
            )
        if fused:
            dec_init = (
                FusedConvLSTMCell.init_carry_padded(b, h, w, self.hidden_dim, cdtype),
                FusedConvLSTMCell.init_carry_padded(b, h, w, self.hidden_dim, cdtype),
                encoder_vector,  # padded h from the encoder
            )
        else:
            dec_init = (
                ConvLSTMCell.init_carry(b, h, w, self.hidden_dim, cdtype),
                ConvLSTMCell.init_carry(b, h, w, self.hidden_dim, cdtype),
                encoder_vector,
            )
        # (1,3,3) Conv3d head == per-frame 3x3 conv (conv_lstm.py:163-169,
        # 198-202) — applied per scan step (head_in_scan) or folded over B·T.
        _, out_seq = decoder(dec_init, None)
        if chunked_layout:
            # (B, n_chunks, chunk, H, W, C) -> (B, steps, H, W, C)
            out_seq = out_seq.reshape(b, steps, *out_seq.shape[3:])
        if self.head_in_scan:
            out = out_seq  # (B, steps, H, W, out) — head applied in-scan
        else:
            hidden_seq = out_seq  # (B, steps, H, W, hidden)
            frames = hidden_seq.reshape(b * steps, h, w, self.hidden_dim)
            frames = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                             dtype=self.dtype, name="head")(frames)
            out = frames.reshape(b, steps, h, w, self.out_channels)
        # stay in the compute dtype: a (B,T,H,W,C) f32 upcast costs gigabytes
        # of activation memory at training shapes; losses upcast locally.
        return nn.sigmoid(out)


@register_model
class EncoderDecoderConvLSTM(BaseModel):
    """Registered task model (reference conv_lstm.py:14 registry entry)."""

    def __init__(
        self,
        hidden_dim: int = 64,
        input_channels: int = 12,
        out_channels: int = 1,
        forecast_steps: int = 48,
        lr: float = 1e-3,
        visualize: bool = False,
        loss: str = "mse",
        pretrained: bool = False,
        conv_type: str = "standard",
        cell_impl: str = "fused",
        unroll: int = 1,
        remat: bool = True,
        remat_chunk: int = 0,
        head_in_scan: bool = True,
        dtype: Any = None,
    ):
        self.hidden_dim = hidden_dim
        self.conv_type = conv_type
        self.cell_impl = cell_impl
        self.unroll = unroll
        self.remat = remat
        self.remat_chunk = remat_chunk
        self.head_in_scan = head_in_scan
        self.dtype = dtype
        super().__init__(
            forecast_steps=forecast_steps,
            lr=lr,
            loss=loss,
            visualize=visualize,
            input_channels=input_channels,
            output_channels=out_channels,
            pretrained=pretrained,
        )

    def build_module(self) -> nn.Module:
        return ConvLSTMCore(
            hidden_dim=self.hidden_dim,
            out_channels=self.output_channels,
            forecast_steps=self.forecast_steps,
            conv_type=self.conv_type,
            cell_impl=self.cell_impl,
            unroll=self.unroll,
            remat=self.remat,
            remat_chunk=self.remat_chunk,
            head_in_scan=self.head_in_scan,
            dtype=self.dtype,
        )

    def prepare_batch(self, batch):
        x, y = batch
        if isinstance(x, dict):
            x = x["sat_data"]
        if isinstance(y, dict):
            y = y["sat_data"]
        # Model predicts out_channels; compare against the first out_channels
        # target channels (the reference trains out_channels=1 cloud-mask heads).
        if y.shape[-1] != self.output_channels:
            y = y[..., : self.output_channels]
        return x, y

    # -- spatial (H-axis) parallelism ---------------------------------------

    def enable_spatial(self, mesh, axis: str = "model") -> None:
        """Train/infer with the rollout H-sharded over ``mesh[axis]``.

        Routes forward/loss through
        :func:`satflow_tpu.parallel.spatial.convlstm_spatial_forward`
        (shard_map + per-step ppermute halo exchange, fused Pallas cells
        intact per shard) — the scale-out path for geometries whose rollout
        activations exceed one chip's HBM (full-disk 3712px MSG frames).
        Wired from ``Trainer(spatial="DxM")`` / ``run.py trainer.spatial=2x4``.
        """
        if self.cell_impl != "fused":
            raise ValueError(
                "spatial parallelism requires cell_impl='fused' "
                f"(got {self.cell_impl!r})"
            )
        self.spatial_mesh = mesh
        self.spatial_axis = axis

    def _spatial_forward(self, params, x):
        from satflow_tpu.parallel.spatial import convlstm_spatial_forward

        return convlstm_spatial_forward(
            params, x, self.forecast_steps, self.spatial_mesh,
            axis=self.spatial_axis, dtype=self.dtype,
        )

    def forward(self, variables, x, rng=None, train=False):
        if getattr(self, "spatial_mesh", None) is not None:
            return self._spatial_forward(variables["params"], x)
        return super().forward(variables, x, rng=rng, train=train)

    def loss(self, params, state, batch, rng, train=True):
        if getattr(self, "spatial_mesh", None) is None:
            return super().loss(params, state, batch, rng, train=train)
        x, y = self.prepare_batch(batch)
        y_hat = self._spatial_forward(params, x)
        loss = self.criterion(y_hat, y)
        metrics = {"loss": loss, **self.frame_metrics(y_hat, y)}
        return loss, (metrics, state)

    @classmethod
    def from_config(cls, config):
        return cls(
            hidden_dim=config.get("num_hidden", 64),
            input_channels=config.get("in_channels", 12),
            out_channels=config.get("out_channels", 1),
            forecast_steps=config.get("forecast_steps", 1),
            lr=config.get("lr", 1e-3),
        )

    def adapt_restored_params(self, params):
        """Relocate params between checkpoint layouts:

        - the output head moves between the top level (head_in_scan=False, the
          r1 layout) and decoder[...]/head (head_in_scan=True);
        - the chunked decoder (remat_chunk>1) nests the step params one level
          deeper (decoder/steps/...) than the per-step layouts — params are
          broadcast over both scan levels, so relocation is pure dict movement.
        """
        params = dict(params)
        decoder = dict(params.get("decoder", {}))
        encoder = dict(params.get("encoder", {}))
        chunked = (
            self.remat
            and self.remat_chunk > 1
            and _largest_divisor_at_most(self.forecast_steps, self.remat_chunk) > 1
        )
        # normalize the scan-step params to the flat (unchunked) layout
        if "steps" in decoder:
            decoder = dict(decoder.pop("steps"))
        if "steps" in encoder:
            encoder = dict(encoder.pop("steps"))
        if self.head_in_scan and "head" in params and "head" not in decoder:
            decoder["head"] = params.pop("head")
        elif not self.head_in_scan and "head" in decoder and "head" not in params:
            params["head"] = decoder.pop("head")
        if chunked:
            decoder = {"steps": decoder}
            encoder = {"steps": encoder}
        params["decoder"] = decoder
        params["encoder"] = encoder
        return params
