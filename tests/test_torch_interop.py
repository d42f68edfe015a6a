"""Torch->flax checkpoint interop tests (VERDICT r1 #5).

Round-trips inline torch state_dicts — in the reference's exact parameter
naming — into flax params and asserts matching forwards, unskipped on CPU.
Covers the reference's ``create_model("hf_hub:...")`` pretrained-loading
surface (reference satflow/models/__init__.py:1-7, tests/test_models.py:79-102).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from satflow_tpu.core.registry import create_model  # noqa: E402
from satflow_tpu.interop import (  # noqa: E402
    load_torch_convlstm,
    load_torch_perceiver,
)
import satflow_tpu.models  # noqa: F401, E402

torch.manual_seed(0)


# -----------------------------------------------------------------------------
# Inline torch EncoderDecoderConvLSTM in the reference's naming/math
# (reference satflow/models/conv_lstm.py:120-228, layers/ConvLSTM.py:7-64).
# -----------------------------------------------------------------------------


class TorchConvLSTMCell(tnn.Module):
    def __init__(self, input_dim, hidden_dim):
        super().__init__()
        self.hidden_dim = hidden_dim
        self.conv = tnn.Conv2d(input_dim + hidden_dim, 4 * hidden_dim, 3, padding=1)

    def forward(self, x, state):
        h, c = state
        gates = self.conv(torch.cat([x, h], dim=1))
        i, f, o, g = torch.split(gates, self.hidden_dim, dim=1)
        c = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(g)
        h = torch.sigmoid(o) * torch.tanh(c)
        return h, c


class TorchConvLSTM(tnn.Module):
    def __init__(self, input_channels, hidden_dim, out_channels):
        super().__init__()
        self.hidden_dim = hidden_dim
        self.encoder_1_convlstm = TorchConvLSTMCell(input_channels, hidden_dim)
        self.encoder_2_convlstm = TorchConvLSTMCell(hidden_dim, hidden_dim)
        self.decoder_1_convlstm = TorchConvLSTMCell(hidden_dim, hidden_dim)
        self.decoder_2_convlstm = TorchConvLSTMCell(hidden_dim, hidden_dim)
        self.decoder_CNN = tnn.Conv3d(hidden_dim, out_channels, (1, 3, 3),
                                      padding=(0, 1, 1))

    def forward(self, x, future_steps):
        b, t, _, hh, ww = x.shape
        z = torch.zeros(b, self.hidden_dim, hh, ww)
        h1, c1, h2, c2 = z, z.clone(), z.clone(), z.clone()
        h3, c3, h4, c4 = z.clone(), z.clone(), z.clone(), z.clone()
        for ti in range(t):
            h1, c1 = self.encoder_1_convlstm(x[:, ti], (h1, c1))
            h2, c2 = self.encoder_2_convlstm(h1, (h2, c2))
        v = h2
        outs = []
        for _ in range(future_steps):
            h3, c3 = self.decoder_1_convlstm(v, (h3, c3))
            h4, c4 = self.decoder_2_convlstm(h3, (h4, c4))
            v = h4
            outs.append(h4)
        y = torch.stack(outs, 1).permute(0, 2, 1, 3, 4)  # (B, hid, T, H, W)
        return torch.sigmoid(self.decoder_CNN(y))  # (B, out, T, H, W)


class TorchWrapper(tnn.Module):
    """Gives the state_dict the reference's ``model.`` prefix."""

    def __init__(self, core):
        super().__init__()
        self.model = core


@pytest.mark.parametrize("cell_impl", ["concat", "split", "hybrid", "fused"])
def test_convlstm_torch_state_dict_roundtrip(cell_impl):
    b, t, hh, ww, cin, hid, cout, steps = 2, 3, 8, 8, 4, 6, 2, 3
    tmodel = TorchWrapper(TorchConvLSTM(cin, hid, cout)).eval()
    state_dict = tmodel.state_dict()

    fmodel = create_model(
        "encoderdecoderconvlstm", input_channels=cin, out_channels=cout,
        hidden_dim=hid, forecast_steps=steps, cell_impl=cell_impl, remat=False,
    )
    variables = load_torch_convlstm(fmodel, state_dict)

    x = np.random.default_rng(0).standard_normal((b, t, hh, ww, cin)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel.model(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)), steps)
    ref = ref.numpy().transpose(0, 2, 3, 4, 1)  # (B, T, H, W, out)

    got = np.asarray(fmodel.forward(variables, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_convlstm_shape_mismatch_raises():
    tmodel = TorchWrapper(TorchConvLSTM(4, 6, 2))
    fmodel = create_model(
        "encoderdecoderconvlstm", input_channels=4, out_channels=2,
        hidden_dim=8, forecast_steps=2, cell_impl="concat",  # hidden 8 != 6
    )
    with pytest.raises(ValueError, match="shape mismatch"):
        load_torch_convlstm(fmodel, tmodel.state_dict())


# -----------------------------------------------------------------------------
# Inline torch PerceiverIO core in lucidrains naming
# -----------------------------------------------------------------------------


class TorchAttention(tnn.Module):
    def __init__(self, q_dim, kv_dim, heads, dim_head):
        super().__init__()
        self.heads, self.dim_head = heads, dim_head
        inner = heads * dim_head
        self.to_q = tnn.Linear(q_dim, inner, bias=False)
        self.to_k = tnn.Linear(kv_dim, inner, bias=False)
        self.to_v = tnn.Linear(kv_dim, inner, bias=False)
        self.to_out = tnn.Linear(inner, q_dim)

    def forward(self, q_in, kv_in):
        b, m, _ = q_in.shape
        n = kv_in.shape[1]
        h, d = self.heads, self.dim_head
        q = self.to_q(q_in).view(b, m, h, d)
        k = self.to_k(kv_in).view(b, n, h, d)
        v = self.to_v(kv_in).view(b, n, h, d)
        logits = torch.einsum("bmhd,bnhd->bhmn", q * d**-0.5, k)
        attn = logits.softmax(dim=-1)
        out = torch.einsum("bhmn,bnhd->bmhd", attn, v)
        return self.to_out(out.reshape(b, m, h * d))


class TorchPreNormAttn(tnn.Module):
    def __init__(self, q_dim, kv_dim, heads, dim_head):
        super().__init__()
        self.norm = tnn.LayerNorm(q_dim, eps=1e-6)
        self.norm_context = tnn.LayerNorm(kv_dim, eps=1e-6)
        self.fn = TorchAttention(q_dim, kv_dim, heads, dim_head)

    def forward(self, x, context):
        return self.fn(self.norm(x), self.norm_context(context))


class TorchSelfAttn(tnn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.fn = TorchAttention(dim, dim, heads, dim_head)

    def forward(self, x):
        h = self.norm(x)
        return self.fn(h, h)


class TorchFF(tnn.Module):
    def __init__(self, dim, mult=2):
        super().__init__()
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.fn = tnn.Module()
        self.fn.net = tnn.Sequential(
            # flax nn.gelu defaults to the tanh approximation
            tnn.Linear(dim, dim * mult), tnn.GELU(approximate="tanh"),
            tnn.Linear(dim * mult, dim)
        )

    def forward(self, x):
        return self.fn.net(self.norm(x))


class TorchPerceiverIO(tnn.Module):
    """Core-math replica of MultiPerceiverIO with lucidrains state_dict keys."""

    def __init__(self, dim, queries_dim, logits_dim, depth, num_latents,
                 latent_dim, cross_heads, latent_heads, cross_dim_head,
                 latent_dim_head):
        super().__init__()
        self.latents = tnn.Parameter(torch.randn(num_latents, latent_dim) * 0.02)
        self.cross_attend_blocks = tnn.ModuleList([
            TorchPreNormAttn(latent_dim, dim, cross_heads, cross_dim_head),
            TorchFF(latent_dim),
        ])
        self.layers = tnn.ModuleList([
            tnn.ModuleList([
                TorchSelfAttn(latent_dim, latent_heads, latent_dim_head),
                TorchFF(latent_dim),
            ])
            for _ in range(depth)
        ])
        self.decoder_cross_attn = TorchPreNormAttn(
            queries_dim, latent_dim, cross_heads, cross_dim_head
        )
        self.decoder_ff = TorchFF(queries_dim)
        self.to_logits = tnn.Linear(queries_dim, logits_dim)

    def forward(self, context, queries):
        b = context.shape[0]
        z = self.latents.unsqueeze(0).expand(b, -1, -1)
        z = z + self.cross_attend_blocks[0](z, context)
        z = z + self.cross_attend_blocks[1](z)
        for attn, ff in self.layers:
            z = z + attn(z)
            z = z + ff(z)
        out = self.decoder_cross_attn(queries, z)
        out = queries + out
        out = out + self.decoder_ff(out)
        return self.to_logits(out)


def test_perceiver_torch_state_dict_roundtrip():
    from satflow_tpu.interop.torch_weights import _set_path, linear_kernel, _np
    from satflow_tpu.nn.perceiver import InputModality, MultiPerceiverIO

    dim, qdim, logits, depth = 16, 16, 5, 2
    n_lat, lat_dim = 8, 24
    mod = InputModality(name="sat", input_channels=3, input_axis=1,
                        num_freq_bands=4, max_freq=4.0, fourier_encode=False)
    core = MultiPerceiverIO(
        modalities=(mod,), dim=dim, queries_dim=qdim, logits_dim=logits,
        depth=depth, num_latents=n_lat, latent_dim=lat_dim, cross_heads=2,
        latent_heads=2, cross_dim_head=8, latent_dim_head=8,
    )
    b, n_tok, n_q = 2, 6, 7
    inputs = {"sat": np.random.default_rng(1).standard_normal((b, n_tok, 3)).astype(np.float32)}
    queries = np.random.default_rng(2).standard_normal((b, n_q, qdim)).astype(np.float32)
    variables = core.init(jax.random.PRNGKey(0), inputs, jnp.asarray(queries))

    tcore = TorchPerceiverIO(dim, qdim, logits, depth, n_lat, lat_dim,
                             cross_heads=2, latent_heads=2, cross_dim_head=8,
                             latent_dim_head=8).eval()
    params = load_torch_perceiver(variables["params"], core, tcore.state_dict())

    # The modality projection/embedding and query projection are flax-side
    # preprocessors with no torch counterpart; sync them torch-ward for the
    # numerical comparison.
    tproj = tnn.Linear(3, dim)
    tquery_proj = tnn.Linear(qdim, qdim)
    with torch.no_grad():
        tproj.weight.copy_(torch.from_numpy(np.asarray(params["proj_sat"]["kernel"]).T))
        tproj.bias.copy_(torch.from_numpy(np.asarray(params["proj_sat"]["bias"])))
        tquery_proj.weight.copy_(
            torch.from_numpy(np.asarray(params["query_proj"]["kernel"]).T)
        )
        tquery_proj.bias.copy_(
            torch.from_numpy(np.asarray(params["query_proj"]["bias"]))
        )
        mod_emb = torch.from_numpy(np.asarray(params["modality_emb"]))

    with torch.no_grad():
        context = tproj(torch.from_numpy(inputs["sat"])) + mod_emb[0]
        q_proj = tquery_proj(torch.from_numpy(queries))
        ref = tcore(context, q_proj).numpy()

    got = np.asarray(core.apply({"params": params}, inputs, jnp.asarray(queries)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_create_model_torch_prefix_loads_lightning_ckpt(tmp_path):
    """create_model("torch:<path.ckpt>") rebuilds from hyper_parameters and
    converts the weights — the reference's pretrained-checkpoint surface."""
    cin, hid, cout, steps = 3, 5, 2, 2
    tmodel = TorchWrapper(TorchConvLSTM(cin, hid, cout)).eval()
    ckpt_path = str(tmp_path / "ref.ckpt")
    torch.save(
        {
            "state_dict": tmodel.state_dict(),
            "hyper_parameters": {
                "input_channels": cin, "hidden_dim": hid, "out_channels": cout,
                "forecast_steps": steps, "lr": 1e-3, "conv_type": "standard",
            },
        },
        ckpt_path,
    )
    model = create_model(f"torch:{ckpt_path}")
    assert model.hidden_dim == hid and model.forecast_steps == steps
    assert model.restored_variables is not None

    x = np.random.default_rng(3).standard_normal((1, 2, 8, 8, cin)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel.model(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)), steps)
    ref = ref.numpy().transpose(0, 2, 3, 4, 1)
    got = np.asarray(model.forward(model.restored_variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_fused_kv_split():
    from satflow_tpu.interop.torch_weights import _split_fused_kv

    w = np.arange(24, dtype=np.float32).reshape(6, 4)
    sd = {"decoder_cross_attn.fn.to_kv.weight": w}
    out = _split_fused_kv(sd)
    np.testing.assert_array_equal(out["decoder_cross_attn.fn.to_k.weight"], w[:3])
    np.testing.assert_array_equal(out["decoder_cross_attn.fn.to_v.weight"], w[3:])


def test_create_model_hf_hub_prefix_mocked(tmp_path, monkeypatch):
    """create_model("hf_hub:<repo>") exercised OFFLINE by mocking
    huggingface_hub.snapshot_download — the reference's hub surface
    (reference tests/test_models.py:79-102, skipped there for network).
    The snapshot contains a reference-format Lightning .ckpt, so this covers
    the hub-download -> .ckpt-detect -> torch-convert chain end to end."""
    import huggingface_hub

    cin, hid, cout, steps = 3, 5, 2, 2
    tmodel = TorchWrapper(TorchConvLSTM(cin, hid, cout)).eval()
    snapshot = tmp_path / "snapshot"
    snapshot.mkdir()
    torch.save(
        {
            "state_dict": tmodel.state_dict(),
            "hyper_parameters": {
                "input_channels": cin, "hidden_dim": hid, "out_channels": cout,
                "forecast_steps": steps, "lr": 1e-3,
            },
        },
        str(snapshot / "model.ckpt"),
    )

    calls = {}

    def fake_snapshot_download(repo_id, **kwargs):
        calls["repo_id"] = repo_id
        return str(snapshot)

    monkeypatch.setattr(huggingface_hub, "snapshot_download",
                        fake_snapshot_download)
    model = create_model("hf_hub:openclimatefix/fake-convlstm")
    assert calls["repo_id"] == "openclimatefix/fake-convlstm"
    assert model.hidden_dim == hid and model.restored_variables is not None

    x = np.random.default_rng(5).standard_normal((1, 2, 8, 8, cin)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel.model(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)), steps)
    ref = ref.numpy().transpose(0, 2, 3, 4, 1)
    got = np.asarray(model.forward(model.restored_variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_create_model_hf_hub_prefix_satflow_checkpoint(tmp_path, monkeypatch):
    """hf_hub: snapshots that are satflow_tpu checkpoint dirs (hparams.json)
    load through the native Orbax path instead of the torch converter."""
    import huggingface_hub

    import satflow_tpu.models  # noqa: F401
    from satflow_tpu.data.fake import FakeDataset
    from satflow_tpu.train.checkpoint import save_checkpoint
    from satflow_tpu.train.state import TrainState

    import optax

    model = create_model(
        "encoderdecoderconvlstm", input_channels=12, out_channels=2,
        hidden_dim=4, forecast_steps=2,
    )
    ds = FakeDataset(history_minutes=15, forecast_minutes=10, length=1)
    batch = ds[0]
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    params, model_state = model.split_variables(variables)
    state = TrainState.create(params, model_state, optax.adam(1e-3))
    ckpt_dir = str(tmp_path / "snapshot")
    save_checkpoint(ckpt_dir, state, model)

    monkeypatch.setattr(huggingface_hub, "snapshot_download",
                        lambda repo_id, **kw: ckpt_dir)
    loaded = create_model("hf_hub:openclimatefix/fake-native")
    assert loaded.hidden_dim == 4 and loaded.restored_variables is not None
    x, _ = batch
    y = np.asarray(loaded.forward(loaded.restored_variables,
                                  jnp.asarray(x["sat_data"])))
    assert y.shape[1] == 2 and np.isfinite(y).all()


def test_hf_optical_flow_pretrained_mapping(monkeypatch):
    """HuggingFacePerceiver(pretrained=True) maps a real HF-schema
    PerceiverForOpticalFlow state_dict onto the JAX core OFFLINE (tiny config,
    from_pretrained monkeypatched) — reference perceiverio.py:46-91's intended
    capability, which its own code never delivered (SURVEY §2.8 defect 7)."""
    import transformers
    from transformers import PerceiverConfig, PerceiverForOpticalFlow

    from satflow_tpu.data import consts
    from satflow_tpu.models.hf_perceiver import HuggingFacePerceiver

    cfg = PerceiverConfig(
        num_latents=16, d_latents=32, d_model=64, num_blocks=1,
        num_self_attends_per_block=2, num_self_attention_heads=2,
        num_cross_attention_heads=1, qk_channels=32, v_channels=32,
        train_size=[8, 8], hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = PerceiverForOpticalFlow(cfg).eval()
    captured = {}

    def fake_from_pretrained(name, **kw):
        captured["name"] = name
        return hf

    monkeypatch.setattr(transformers.PerceiverForOpticalFlow,
                        "from_pretrained", fake_from_pretrained)
    model = HuggingFacePerceiver(
        pretrained=True, train_size=8, forecast_steps=2,
        input_channels=3, sat_channels=3, num_freq_bands=4,
    )
    assert captured["name"] == "deepmind/optical-flow-perceiver"
    # geometry derived from the checkpoint: 322-dim tokens (d_model 64 +
    # 258 fourier), 16x32 latents, depth 2
    assert model.dim == 322 and model.queries_dim == 322
    assert model.num_latents == 16 and model.latent_dim == 32
    assert model.depth == 2 and model.qkv_bias and not model.decoder_query_residual
    assert model.flow_channels == 2

    params = model.restored_variables["params"]
    core = params["core"]["steps"]["core"]
    sd = hf.state_dict()
    np.testing.assert_allclose(
        np.asarray(core["latents"]),
        sd["perceiver.embeddings.latents"].numpy(), atol=1e-6)
    # one attention projection, layout-transposed: torch (qk, d) -> (d, h, dh)
    w = sd["perceiver.encoder.self_attends.1.attention.self.query.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(core["latent1"]["attn"]["to_q"]["kernel"]),
        w.T.reshape(32, 2, 16), atol=1e-6)
    b = sd["perceiver.encoder.self_attends.1.attention.self.query.bias"].numpy()
    np.testing.assert_allclose(
        np.asarray(core["latent1"]["attn"]["to_q"]["bias"]),
        b.reshape(2, 16), atol=1e-6)
    # decoder head -> to_logits
    np.testing.assert_allclose(
        np.asarray(core["to_logits"]["kernel"]),
        sd["perceiver.decoder.decoder.final_layer.weight"].numpy().T, atol=1e-6)

    x = np.random.default_rng(0).standard_normal((1, 6, 8, 8, 3)).astype(np.float32)
    inputs, _ = model.prepare_batch(({consts.SATELLITE_DATA: x}, x))
    y = np.asarray(model.module.apply(model.restored_variables, inputs))
    assert y.shape == (1, 2, 8, 8, 3) and np.isfinite(y).all()

    # hparams round-trip rebuilds the derived geometry without the hub
    from satflow_tpu.train.checkpoint import _ctor_kwargs

    hp = model.hparams()
    assert hp["pretrained"] is False and hp["depth"] == 2 and hp["dim"] == 322
    rebuilt = HuggingFacePerceiver(**_ctor_kwargs(hp.pop("class"), hp))
    assert rebuilt.dim == 322 and rebuilt.num_latents == 16
    assert rebuilt.qkv_bias and not rebuilt.decoder_query_residual
