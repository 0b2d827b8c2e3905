"""ONNX graph -> flax import parity, verified against torch oracles.

torch.onnx.export is unavailable here (needs the absent ``onnx`` package),
so these tests do what the exporter would: build torch twins of the five
reference model graphs (main.py:43-62), run them as numeric oracles, and
serialize their state_dicts into REAL ONNX files via
weights/onnx_graph.OnnxGraphBuilder using torch's canonical export
patterns — Conv/BatchNormalization nodes, Gemm(transB=1) for 2-D Linear,
MatMul+Add for 3-D Linear, Gather for Embedding, and both LSTM styles
(single ONNX LSTM op in iofc gate order; decomposed packed Gemms in torch
ifgo order). Tensor names are deliberately meaningless: the importer must
map by structure alone (weights/graph_import.py).
"""

from __future__ import annotations

import jax
import numpy as np
import pytest
import torch
import torch.nn as tnn

from stroke_derenderer_tpu.weights.onnx_graph import OnnxGraphBuilder

torch.manual_seed(0)


# --------------------- ONNX emit helpers (torch patterns) ---------------------


def _np(t):
    return t.detach().numpy()


def emit_conv(b, x, m: tnn.Conv2d | tnn.ConvTranspose2d):
    w = b.add_init(_np(m.weight))
    ins = [x, w]
    if m.bias is not None:
        ins.append(b.add_init(_np(m.bias)))
    op = "ConvTranspose" if isinstance(m, tnn.ConvTranspose2d) else "Conv"
    return b.add_node(op, ins, strides=list(m.stride),
                      pads=list(m.padding) * 2)


def emit_bn(b, x, m: tnn.BatchNorm2d):
    ins = [x, b.add_init(_np(m.weight)), b.add_init(_np(m.bias)),
           b.add_init(_np(m.running_mean)), b.add_init(_np(m.running_var))]
    return b.add_node("BatchNormalization", ins, epsilon=m.eps)


def emit_linear_gemm(b, x, m: tnn.Linear, out=None):
    ins = [x, b.add_init(_np(m.weight)), b.add_init(_np(m.bias))]
    return b.add_node("Gemm", ins, [out] if out else None,
                      alpha=1.0, beta=1.0, transB=1)


def emit_linear_matmul(b, x, m: tnn.Linear):
    """torch Linear applied to a rank-3 tensor."""
    y = b.add_node("MatMul", [x, b.add_init(_np(m.weight.t().contiguous()))])
    return b.add_node("Add", [y, b.add_init(_np(m.bias))])


def emit_lstm_op(b, x_cat, h, c, m: tnn.LSTMCell):
    """Single ONNX LSTM node (gate order iofc)."""
    H = m.hidden_size

    def ifgo_to_iofc(w):
        i, f, g, o = (w[k * H:(k + 1) * H] for k in range(4))
        return np.concatenate([i, o, f, g], 0)

    W = ifgo_to_iofc(_np(m.weight_ih))[None]       # (1, 4H, in)
    R = ifgo_to_iofc(_np(m.weight_hh))[None]       # (1, 4H, H)
    B = np.concatenate([ifgo_to_iofc(_np(m.bias_ih)),
                        ifgo_to_iofc(_np(m.bias_hh))], 0)[None]
    xs = b.add_node("Unsqueeze", [x_cat], axes=[0])
    y = b.add_node("LSTM", [xs, b.add_init(W), b.add_init(R), b.add_init(B),
                            "", h, c],
                   outputs=["lstm_y", "lstm_h", "lstm_c"], hidden_size=H)
    del y
    h2 = b.add_node("Squeeze", ["lstm_h"], axes=[0])
    c2 = b.add_node("Squeeze", ["lstm_c"], axes=[0])
    return h2, c2


def emit_lstm_gemms(b, x_cat, h, c, m: tnn.LSTMCell):
    """Decomposed LSTMCell: two packed Gemms (torch ifgo order) + gate math
    the importer ignores."""
    H = m.hidden_size
    g1 = b.add_node("Gemm", [x_cat, b.add_init(_np(m.weight_ih)),
                             b.add_init(_np(m.bias_ih))], transB=1)
    g2 = b.add_node("Gemm", [h, b.add_init(_np(m.weight_hh)),
                             b.add_init(_np(m.bias_hh))], transB=1)
    gates = b.add_node("Add", [g1, g2])
    i = b.add_node("Sigmoid", [b.add_node("Slice", [gates])])
    f = b.add_node("Sigmoid", [b.add_node("Slice", [gates])])
    g = b.add_node("Tanh", [b.add_node("Slice", [gates])])
    o = b.add_node("Sigmoid", [b.add_node("Slice", [gates])])
    c2 = b.add_node("Add", [b.add_node("Mul", [f, c]),
                            b.add_node("Mul", [i, g])])
    h2 = b.add_node("Mul", [o, b.add_node("Tanh", [c2])])
    return h2, c2


# ------------------------------ torch twins ------------------------------


class TConvBlock(tnn.Module):
    def __init__(self, cin, f):
        super().__init__()
        self.c1 = tnn.Conv2d(cin, f, 3, padding=1, bias=False)
        self.b1 = tnn.BatchNorm2d(f)
        self.c2 = tnn.Conv2d(f, f, 3, padding=1, bias=False)
        self.b2 = tnn.BatchNorm2d(f)

    def forward(self, x):
        x = torch.relu(self.b1(self.c1(x)))
        return torch.relu(self.b2(self.c2(x)))

    def emit(self, b, x):
        x = b.add_node("Relu", [emit_bn(b, emit_conv(b, x, self.c1), self.b1)])
        return b.add_node("Relu", [emit_bn(b, emit_conv(b, x, self.c2), self.b2)])


class TGate(tnn.Module):
    def __init__(self, f, inter, gate_bn=False):
        super().__init__()
        self.wg = tnn.Conv2d(f, inter, 1)
        self.wx = tnn.Conv2d(f, inter, 1)
        self.psi = tnn.Conv2d(inter, 1, 1)
        # Public attention-UNet impls put BN inside the gates; the importer
        # must FOLD those into the convs (this architecture has no slot).
        self.bn_g = tnn.BatchNorm2d(inter) if gate_bn else None
        self.bn_x = tnn.BatchNorm2d(inter) if gate_bn else None
        self.bn_p = tnn.BatchNorm2d(1) if gate_bn else None

    def forward(self, g, x):
        a = self.wg(g)
        bxx = self.wx(x)
        if self.bn_g is not None:
            a, bxx = self.bn_g(a), self.bn_x(bxx)
        p = self.psi(torch.relu(a + bxx))
        if self.bn_p is not None:
            p = self.bn_p(p)
        return x * torch.sigmoid(p)

    def emit(self, b, g, x):
        a = emit_conv(b, g, self.wg)
        bxx = emit_conv(b, x, self.wx)
        if self.bn_g is not None:
            a, bxx = emit_bn(b, a, self.bn_g), emit_bn(b, bxx, self.bn_x)
        p = emit_conv(b, b.add_node("Relu", [b.add_node("Add", [a, bxx])]),
                      self.psi)
        if self.bn_p is not None:
            p = emit_bn(b, p, self.bn_p)
        return b.add_node("Mul", [x, b.add_node("Sigmoid", [p])])


class TUNet(tnn.Module):
    def __init__(self, features=(8, 16), bottleneck=32, gate_bn=False):
        super().__init__()
        self.features = features
        cin = 3
        self.down = tnn.ModuleList()
        for f in features:
            self.down.append(TConvBlock(cin, f))
            cin = f
        self.mid = TConvBlock(cin, bottleneck)
        cin = bottleneck
        self.ups, self.gates, self.blocks = (tnn.ModuleList() for _ in range(3))
        for f in reversed(features):
            self.ups.append(tnn.ConvTranspose2d(cin, f, 2, stride=2))
            self.gates.append(TGate(f, max(f // 2, 4), gate_bn))
            self.blocks.append(TConvBlock(2 * f, f))
            cin = f
        self.head = tnn.Conv2d(cin, 1, 1)

    def forward(self, x):
        skips = []
        for blk in self.down:
            x = blk(x)
            skips.append(x)
            x = torch.max_pool2d(x, 2)
        x = self.mid(x)
        for up, gate, blk, skip in zip(self.ups, self.gates, self.blocks,
                                       reversed(skips)):
            x = up(x)
            gated = gate(x, skip)
            x = blk(torch.cat([gated, x], 1))
        return torch.sigmoid(self.head(x))

    def emit(self, b):
        b.add_input("input", (1, 3, 32, 96))
        x = "input"
        skips = []
        for blk in self.down:
            x = blk.emit(b, x)
            skips.append(x)
            x = b.add_node("MaxPool", [x], kernel_shape=[2, 2], strides=[2, 2])
        x = self.mid.emit(b, x)
        for up, gate, blk, skip in zip(self.ups, self.gates, self.blocks,
                                       reversed(skips)):
            x = emit_conv(b, x, up)
            gated = gate.emit(b, x, skip)
            x = blk.emit(b, b.add_node("Concat", [gated, x], axis=1))
        y = emit_conv(b, x, self.head)
        b.add_node("Sigmoid", [y], ["output"])
        b.add_output("output", (1, 1, 32, 96))


class TBasicBlock(tnn.Module):
    def __init__(self, cin, f, stride):
        super().__init__()
        self.c1 = tnn.Conv2d(cin, f, 3, stride, 1, bias=False)
        self.b1 = tnn.BatchNorm2d(f)
        self.c2 = tnn.Conv2d(f, f, 3, 1, 1, bias=False)
        self.b2 = tnn.BatchNorm2d(f)
        self.proj = self.bp = None
        if cin != f or stride != 1:
            self.proj = tnn.Conv2d(cin, f, 1, stride, bias=False)
            self.bp = tnn.BatchNorm2d(f)

    def forward(self, x):
        y = self.b2(self.c2(torch.relu(self.b1(self.c1(x)))))
        r = self.bp(self.proj(x)) if self.proj is not None else x
        return torch.relu(y + r)

    def emit(self, b, x):
        y = b.add_node("Relu", [emit_bn(b, emit_conv(b, x, self.c1), self.b1)])
        y = emit_bn(b, emit_conv(b, y, self.c2), self.b2)
        r = (emit_bn(b, emit_conv(b, x, self.proj), self.bp)
             if self.proj is not None else x)
        return b.add_node("Relu", [b.add_node("Add", [y, r])])


class TResNetTiny(tnn.Module):
    """Twin of models/encoder.py ARCHS['tiny']: stem 8, stages (1,1,1,1)."""

    def __init__(self):
        super().__init__()
        self.stem = tnn.Conv2d(3, 8, 7, 2, 3, bias=False)
        self.bn = tnn.BatchNorm2d(8)
        self.blocks = tnn.ModuleList()
        cin = 8
        for i in range(4):
            f = 8 * (2 ** i)
            self.blocks.append(TBasicBlock(cin, f, 2 if i > 0 else 1))
            cin = f

    def forward(self, x):
        x = torch.relu(self.bn(self.stem(x)))
        x = torch.max_pool2d(x, 3, 2, 1)
        for blk in self.blocks:
            x = blk(x)
        return x

    def emit(self, b, size=56):
        b.add_input("input", (1, 3, size, size))
        x = b.add_node("Relu", [emit_bn(b, emit_conv(b, "input", self.stem),
                                        self.bn)])
        x = b.add_node("MaxPool", [x], kernel_shape=[3, 3], strides=[2, 2],
                       pads=[1, 1, 1, 1])
        for blk in self.blocks:
            x = blk.emit(b, x)
        b.add_node("Identity", [x], ["output"])
        b.add_output("output", (1, 64, size // 16, size // 16))


class TDecoder(tnn.Module):
    def __init__(self, vocab=115, embed_dim=16, att_dim=24, dec_dim=20,
                 enc_dim=64):
        super().__init__()
        self.embedding = tnn.Embedding(vocab, embed_dim)
        self.enc_att = tnn.Linear(enc_dim, att_dim)
        self.dec_att = tnn.Linear(dec_dim, att_dim)
        self.full_att = tnn.Linear(att_dim, 1)
        self.init_h = tnn.Linear(enc_dim, dec_dim)
        self.init_c = tnn.Linear(enc_dim, dec_dim)
        self.f_beta = tnn.Linear(dec_dim, enc_dim)
        self.lstm = tnn.LSTMCell(embed_dim + enc_dim, dec_dim)
        self.fc = tnn.Linear(dec_dim, vocab)

    def step(self, enc, emb, h, c):
        att = self.full_att(
            torch.relu(self.enc_att(enc) + self.dec_att(h)[:, None]))
        alpha = torch.softmax(att.squeeze(-1), 1)
        awe = (alpha[:, :, None] * enc).sum(1)
        awe = torch.sigmoid(self.f_beta(h)) * awe
        h, c = self.lstm(torch.cat([emb, awe], 1), (h, c))
        return self.fc(h), h, c

    def emit_init_hc(self, b, enc_dim):
        b.add_input("input", (1, enc_dim))
        emit_linear_gemm(b, "input", self.init_h, out="output_h")
        emit_linear_gemm(b, "input", self.init_c, out="output_c")
        b.add_output("output_h", (1, self.init_h.out_features))
        b.add_output("output_c", (1, self.init_c.out_features))

    def emit_embedding(self, b):
        b.add_input("input", (1,), elem_type=7)
        b.add_node("Gather", [b.add_init(_np(self.embedding.weight)),
                              "input"], ["output"])
        b.add_output("output", (1, self.embedding.embedding_dim))

    def emit_iter(self, b, n_pos, lstm_style):
        enc_dim = self.enc_att.in_features
        b.add_input("input_enc", (1, n_pos, enc_dim))
        b.add_input("input_emb", (1, self.embedding.embedding_dim))
        b.add_input("input_h", (1, self.init_h.out_features))
        b.add_input("input_c", (1, self.init_h.out_features))
        a1 = emit_linear_matmul(b, "input_enc", self.enc_att)
        a2 = emit_linear_gemm(b, "input_h", self.dec_att)
        a2u = b.add_node("Unsqueeze", [a2], axes=[1])
        e = emit_linear_matmul(
            b, b.add_node("Relu", [b.add_node("Add", [a1, a2u])]),
            self.full_att)
        alpha = b.add_node("Softmax", [b.add_node("Squeeze", [e], axes=[2])],
                           axis=1)
        au = b.add_node("Unsqueeze", [alpha], axes=[2])
        awe = b.add_node("ReduceSum", [b.add_node("Mul", [au, "input_enc"])],
                         axes=[1], keepdims=0)
        gate = b.add_node("Sigmoid", [emit_linear_gemm(b, "input_h",
                                                       self.f_beta)])
        awe = b.add_node("Mul", [gate, awe])
        cat = b.add_node("Concat", ["input_emb", awe], axis=1)
        if lstm_style == "lstm_op":
            h2, c2 = emit_lstm_op(b, cat, "input_h", "input_c", self.lstm)
        else:
            h2, c2 = emit_lstm_gemms(b, cat, "input_h", "input_c", self.lstm)
        emit_linear_gemm(b, h2, self.fc, out="output_pred")
        b.add_node("Identity", [h2], ["output_h"])
        b.add_node("Identity", [c2], ["output_c"])
        for name, dim in (("output_pred", self.fc.out_features),
                          ("output_h", self.init_h.out_features),
                          ("output_c", self.init_h.out_features)):
            b.add_output(name, (1, dim))


# ------------------------------- tests -------------------------------


def _randomize_bn(model):
    """Non-trivial running stats so a mean/var mapping bug cannot hide."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)


@pytest.mark.parametrize("gate_bn", [False, True])
def test_binarizer_graph_parity(tmp_path, gate_bn):
    import jax.numpy as jnp

    from stroke_derenderer_tpu.config import BinarizerConfig
    from stroke_derenderer_tpu.weights.graph_import import map_binarizer_graph
    from stroke_derenderer_tpu.weights.store import build_binarizer_model

    twin = TUNet(gate_bn=gate_bn).eval()
    _randomize_bn(twin)
    b = OnnxGraphBuilder("binarizer")
    twin.emit(b)
    path = tmp_path / "binarizer.onnx"
    b.save(path)

    x = torch.rand(2, 3, 32, 96)
    with torch.no_grad():
        oracle = twin(x).numpy()

    cfg, variables = map_binarizer_graph(
        path, BinarizerConfig(compute_dtype="float32"))
    assert cfg.features == (8, 16) and cfg.bottleneck == 32
    assert cfg.norm == "batch"
    model = build_binarizer_model(cfg)
    got = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got)[..., 0], oracle[:, 0],
                               atol=2e-4)


def test_encoder_graph_parity(tmp_path):
    import jax.numpy as jnp

    from stroke_derenderer_tpu.models.encoder import ResNetEncoder
    from stroke_derenderer_tpu.weights.graph_import import map_encoder_graph

    twin = TResNetTiny().eval()
    _randomize_bn(twin)
    b = OnnxGraphBuilder("encoder")
    twin.emit(b)
    path = tmp_path / "encoder.onnx"
    b.save(path)

    x = torch.randn(2, 3, 56, 56)
    with torch.no_grad():
        oracle = twin(x).numpy()

    arch, norm, variables = map_encoder_graph(path)
    assert arch == "tiny" and norm == "batch"
    enc = ResNetEncoder(arch=arch, dtype=jnp.float32, norm="batch")
    got = enc.apply(jax.tree_util.tree_map(jnp.asarray, variables),
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), oracle,
                               atol=2e-4)


@pytest.mark.parametrize("lstm_style", ["lstm_op", "gemms"])
def test_decoder_graph_parity(tmp_path, lstm_style):
    import jax.numpy as jnp

    from stroke_derenderer_tpu.models.decoder import AttentiveDecoder
    from stroke_derenderer_tpu.weights.graph_import import map_decoder_graphs

    twin = TDecoder().eval()
    b1, b2, b3 = (OnnxGraphBuilder(n) for n in ("init_hc", "emb", "iter"))
    twin.emit_init_hc(b1, enc_dim=64)
    twin.emit_embedding(b2)
    twin.emit_iter(b3, n_pos=16, lstm_style=lstm_style)
    p1, p2, p3 = (tmp_path / f"{n}.onnx"
                  for n in ("decoder_init_hc", "decoder_embedding",
                            "decoder_iter"))
    b1.save(p1), b2.save(p2), b3.save(p3)

    dims, variables, _ = map_decoder_graphs(p1, p2, p3)
    assert dims == {"vocab_size": 115, "embed_dim": 16, "attention_dim": 24,
                    "decoder_dim": 20, "encoder_dim": 64}

    dec = AttentiveDecoder(vocab_size=115, embed_dim=16, attention_dim=24,
                           decoder_dim=20, encoder_dim=64,
                           dtype=jnp.float32)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    enc = torch.randn(3, 16, 64)
    toks = torch.tensor([5, 60, 110])
    with torch.no_grad():
        h = twin.init_h(enc.mean(1))
        c = twin.init_c(enc.mean(1))
        emb = twin.embedding(toks)
        o_logits, o_h, o_c = twin.step(enc, emb, h, c)

    enc_j = jnp.asarray(enc.numpy())
    h_j, c_j = dec.apply(variables, enc_j, method="init_state")
    np.testing.assert_allclose(np.asarray(h_j), h.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_j), c.numpy(), atol=1e-4)
    emb_j = dec.apply(variables, jnp.asarray(toks.numpy()), method="embed")
    np.testing.assert_allclose(np.asarray(emb_j), emb.numpy(), atol=1e-5)
    proj = dec.apply(variables, enc_j, method="project_encoding")
    logits, h2, c2, _ = dec.apply(variables, enc_j, proj, emb_j, h_j, c_j,
                                  method="step")
    np.testing.assert_allclose(np.asarray(logits), o_logits.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(h2), o_h.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(c2), o_c.numpy(), atol=2e-4)


def test_import_reference_models_turnkey(tmp_path):
    """Full main.py:43-62 model-dir layout -> native model dir the CLI
    loads, with forwards matching the torch oracles."""
    import json

    import jax.numpy as jnp

    from stroke_derenderer_tpu.pipeline import Binarizer, StrokeEstimator
    from stroke_derenderer_tpu.weights.graph_import import (
        import_reference_models,
    )

    onnx_dir = tmp_path / "onnx"
    onnx_dir.mkdir()
    unet = TUNet().eval()
    _randomize_bn(unet)
    bu = OnnxGraphBuilder("binarizer")
    unet.emit(bu)
    bu.save(onnx_dir / "binarizer.onnx")

    enc = TResNetTiny().eval()
    _randomize_bn(enc)
    be = OnnxGraphBuilder("encoder")
    enc.emit(be, size=56)
    be.save(onnx_dir / "encoder.onnx")

    dec = TDecoder().eval()
    b1, b2, b3 = (OnnxGraphBuilder(n) for n in ("i", "e", "t"))
    dec.emit_init_hc(b1, enc_dim=64)
    dec.emit_embedding(b2)
    dec.emit_iter(b3, n_pos=16, lstm_style="lstm_op")
    b1.save(onnx_dir / "decoder_init_hc.onnx")
    b2.save(onnx_dir / "decoder_embedding.onnx")
    b3.save(onnx_dir / "decoder_iter.onnx")

    # The reference's config JSONs carry pipeline constants only
    # (evaluate_binarize.py:30-45, evaluate_strokes.py:35-50).
    (onnx_dir / "configs_binarizer.json").write_text(
        json.dumps({"height": 32, "width": 96, "overlap": 16}))
    (onnx_dir / "configs_strokes.json").write_text(
        json.dumps({"image_size": 56, "max_length": 24,
                    "encode_image_size": 4}))

    out_dir = tmp_path / "native"
    bin_cfg, bin_vars, se_cfg, enc_vars, _, _ = import_reference_models(
        onnx_dir, out_dir)
    assert bin_cfg.height == 32 and bin_cfg.features == (8, 16)
    assert se_cfg.encoder_arch == "tiny" and se_cfg.decoder_dim == 20
    assert se_cfg.vocab_size == 115

    # Numeric parity at float32 compute.
    import dataclasses

    from stroke_derenderer_tpu.models.encoder import ResNetEncoder
    from stroke_derenderer_tpu.weights.store import build_binarizer_model

    x = torch.rand(1, 3, 32, 96)
    with torch.no_grad():
        bin_oracle = unet(x).numpy()
    model = build_binarizer_model(
        dataclasses.replace(bin_cfg, compute_dtype="float32"))
    got = model.apply(jax.tree_util.tree_map(jnp.asarray, bin_vars),
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got)[..., 0], bin_oracle[:, 0],
                               atol=2e-4)

    g = torch.randn(2, 3, 56, 56)
    with torch.no_grad():
        enc_oracle = enc(g).numpy()
    encoder = ResNetEncoder(arch=se_cfg.encoder_arch, dtype=jnp.float32,
                            norm="batch")
    fm = encoder.apply(jax.tree_util.tree_map(jnp.asarray, enc_vars),
                       jnp.asarray(g.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(fm).transpose(0, 3, 1, 2),
                               enc_oracle, atol=2e-4)

    # The exported dir loads through the standard session constructors and
    # carries the inferred architecture in its config JSONs.
    from stroke_derenderer_tpu.cli import initialize_sessions
    binarizer, estimator = initialize_sessions(out_dir)
    assert binarizer.config.features == (8, 16)
    assert binarizer.config.norm == "batch"
    assert estimator.config.encoder_arch == "tiny"
    assert estimator.config.encoder_norm == "batch"

    # Turnkey: -models pointed at the RAW reference ONNX dir (no msgpack
    # files) must import on the fly and run e2e (cli._sessions_from_onnx).
    binarizer2, estimator2 = initialize_sessions(onnx_dir)
    assert binarizer2.config.features == (8, 16)
    line = np.full((40, 200, 3), 255, np.uint8)
    line[18:21, 20:180] = 0
    mask = binarizer2.binarize_image(line)
    assert mask.shape[0] == 32 and set(np.unique(mask)) <= {0, 255}
    strokes = estimator2.process_image(line[:32, :, 0] < 128)
    assert isinstance(strokes, list)
