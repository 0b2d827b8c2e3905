"""ONNX wire-format importer tests (synthetic protobuf; no onnx package)."""

import struct

import numpy as np

from stroke_derenderer_tpu.weights import importer


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def _tensor_proto(name: str, arr: np.ndarray, use_raw: bool = True) -> bytes:
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, _varint(d))
    dtype_code = {np.float32: 1, np.int64: 7, np.float16: 10}[arr.dtype.type]
    msg += _field(2, 0, _varint(dtype_code))
    msg += _len_delim(8, name.encode())
    if use_raw:
        msg += _len_delim(9, arr.tobytes())
    else:
        msg += _len_delim(4, struct.pack(f"<{arr.size}f",
                                         *arr.astype(np.float32).ravel()))
    return msg


def _onnx_bytes(tensors: dict[str, np.ndarray], use_raw=True) -> bytes:
    graph = b"".join(_len_delim(5, _tensor_proto(n, a, use_raw))
                     for n, a in tensors.items())
    # Add an unrelated field the parser must skip (graph name, field 2).
    graph += _len_delim(2, b"g")
    return _len_delim(7, graph) + _field(1, 0, _varint(8))  # ir_version noise


def test_raw_data_roundtrip(tmp_path, rng):
    tensors = {
        "conv.weight": rng.normal(size=(4, 3, 3, 3)).astype(np.float32),
        "fc.bias": rng.normal(size=(7,)).astype(np.float32),
        "ids": np.arange(6, dtype=np.int64).reshape(2, 3),
    }
    p = tmp_path / "m.onnx"
    p.write_bytes(_onnx_bytes(tensors))
    out = importer.read_onnx_initializers(p)
    assert set(out) == set(tensors)
    for k in tensors:
        assert np.array_equal(out[k], tensors[k])


def test_float_data_roundtrip(tmp_path, rng):
    tensors = {"w": rng.normal(size=(2, 5)).astype(np.float32)}
    p = tmp_path / "m.onnx"
    p.write_bytes(_onnx_bytes(tensors, use_raw=False))
    out = importer.read_onnx_initializers(p)
    np.testing.assert_allclose(out["w"], tensors["w"])


def test_layout_converters(rng):
    w = rng.normal(size=(8, 3, 5, 7)).astype(np.float32)
    assert importer.torch_conv_to_flax(w).shape == (5, 7, 3, 8)
    lin = rng.normal(size=(4, 6)).astype(np.float32)
    assert importer.torch_linear_to_flax(lin).shape == (6, 4)


def test_lstm_converter_matches_flax(rng):
    """Converted torch LSTMCell weights must produce identical outputs in
    flax.linen.LSTMCell."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import torch

    in_dim, hidden = 6, 5
    cell_t = torch.nn.LSTMCell(in_dim, hidden)
    x = rng.normal(size=(2, in_dim)).astype(np.float32)
    h0 = rng.normal(size=(2, hidden)).astype(np.float32)
    c0 = rng.normal(size=(2, hidden)).astype(np.float32)
    with torch.no_grad():
        ht, ct = cell_t(torch.from_numpy(x),
                        (torch.from_numpy(h0), torch.from_numpy(c0)))

    params = importer.torch_lstm_to_flax(
        cell_t.weight_ih.detach().numpy(), cell_t.weight_hh.detach().numpy(),
        cell_t.bias_ih.detach().numpy(), cell_t.bias_hh.detach().numpy())
    cell_f = nn.LSTMCell(hidden)
    template = cell_f.init(jax.random.PRNGKey(0),
                           (jnp.asarray(c0), jnp.asarray(h0)), jnp.asarray(x))
    # Ensure we built every param the flax cell expects.
    assert set(template["params"]) == set(params)
    (c1, h1), y = cell_f.apply({"params": jax.tree.map(jnp.asarray, params)},
                               (jnp.asarray(c0), jnp.asarray(h0)), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(h1), ht.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), ct.numpy(), rtol=1e-5, atol=1e-5)


def test_wire_parser_against_independent_protobuf(tmp_path, rng):
    """Cross-check the hand-rolled ONNX wire parser against an INDEPENDENT
    serializer: a minimal ONNX-subset .proto compiled with protoc and
    serialized by google.protobuf (field numbers/wire types from the public
    onnx.proto). Guards against self-consistent-but-wrong parsing, which a
    roundtrip through our own writer cannot catch."""
    import shutil
    import subprocess
    import sys
    import pytest
    protoc = shutil.which("protoc")
    if protoc is None:
        pytest.skip("protoc not available")
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf not available")

    (tmp_path / "onnx_mini.proto").write_text("""
syntax = "proto3";
package onnx_mini;
message TensorProto {
  repeated int64 dims = 1;
  int32 data_type = 2;
  repeated float float_data = 4 [packed = true];
  repeated int64 int64_data = 7 [packed = true];
  string name = 8;
  bytes raw_data = 9;
  repeated double double_data = 10 [packed = true];
}
message GraphProto {
  string name = 2;
  repeated TensorProto initializer = 5;
}
message ModelProto {
  int64 ir_version = 1;
  GraphProto graph = 7;
}
""")
    subprocess.run([protoc, f"--python_out={tmp_path}", "onnx_mini.proto"],
                   cwd=tmp_path, check=True)
    sys.path.insert(0, str(tmp_path))
    try:
        import onnx_mini_pb2 as pb
    finally:
        sys.path.pop(0)

    want = {
        "conv.weight": rng.normal(size=(4, 3, 3, 3)).astype(np.float32),
        "fc.bias": rng.normal(size=(7,)).astype(np.float32),
        "ids": rng.integers(-5, 5, size=(2, 3)).astype(np.int64),
        "dbl": rng.normal(size=(3,)).astype(np.float64),
    }
    m = pb.ModelProto()
    m.ir_version = 8
    m.graph.name = "g"
    t = m.graph.initializer.add()   # raw_data f32
    t.name = "conv.weight"; t.data_type = 1
    t.dims.extend(want["conv.weight"].shape)
    t.raw_data = want["conv.weight"].tobytes()
    t = m.graph.initializer.add()   # float_data field
    t.name = "fc.bias"; t.data_type = 1
    t.dims.extend(want["fc.bias"].shape)
    t.float_data.extend(want["fc.bias"].tolist())
    t = m.graph.initializer.add()   # int64_data field
    t.name = "ids"; t.data_type = 7
    t.dims.extend(want["ids"].shape)
    t.int64_data.extend(want["ids"].ravel().tolist())
    t = m.graph.initializer.add()   # double_data field
    t.name = "dbl"; t.data_type = 11
    t.dims.extend(want["dbl"].shape)
    t.double_data.extend(want["dbl"].tolist())

    path = tmp_path / "model.onnx"
    path.write_bytes(m.SerializeToString())
    got = importer.read_onnx_initializers(path)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k].reshape(got[k].shape))
        assert got[k].shape == want[k].shape
