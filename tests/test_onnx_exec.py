"""Generic ONNX->JAX executor (models/convert/onnx_exec) numerics.

Oracle strategy: graphs are synthesized with tests/helpers_onnx (the image
has no `onnx` package) and outputs are compared against torch functional
ops (conv/pool/rnn/norm — the exact kernels onnxruntime matches, reference
requirements.txt:6-7) or hand-written numpy for the rest.
"""
import math

import numpy as np
import pytest

from audio_classification_tpu.models.convert.onnx_exec import (
    OnnxModel, UnsupportedOnnxOp, supported_ops)
from audio_classification_tpu.models.convert.onnx_import import (
    load_onnx_graph)

from helpers_onnx import GraphBuilder, Subgraph, graph_bytes, node, value_info

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(0)


def _run(tmp_path, builder, feeds, inputs=None, jit=False):
    path = builder.write(tmp_path / "m.onnx", inputs=inputs)
    m = OnnxModel(path, jit=jit)
    out = m(**feeds)
    return {k: np.asarray(v) for k, v in out.items()}, m


def _f32(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


# ------------------------------------------------------------------- convs

@pytest.mark.parametrize("stride,dil,groups", [(1, 1, 1), (2, 2, 1), (1, 1, 2)])
def test_conv1d_matches_torch(tmp_path, stride, dil, groups):
    x, w, bias = _f32(2, 4, 21), _f32(6, 4 // groups, 5), _f32(6)
    b = GraphBuilder()
    b.conv(w, bias, strides=[stride], pads=[2, 2], dilations=[dil],
           group=groups)
    out, _ = _run(tmp_path, b, {"input": x})
    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(bias),
        stride=stride, padding=2, dilation=dil, groups=groups).numpy()
    np.testing.assert_allclose(list(out.values())[0], ref, atol=2e-5)


def test_conv2d_same_upper_matches_torch(tmp_path):
    x, w, bias = _f32(1, 3, 13, 9), _f32(5, 3, 3, 3), _f32(5)
    b = GraphBuilder()
    b.conv(w, bias, strides=[2, 2], auto_pad=b"SAME_UPPER")
    out, _ = _run(tmp_path, b, {"input": x})
    # SAME_UPPER with odd total padding puts the extra cell at the end.
    xp = torch.nn.functional.pad(torch.from_numpy(x), (1, 1, 1, 1))
    ref = torch.nn.functional.conv2d(
        xp, torch.from_numpy(w), torch.from_numpy(bias), stride=2).numpy()
    np.testing.assert_allclose(list(out.values())[0], ref, atol=2e-5)


def test_conv_transpose1d_matches_torch(tmp_path):
    x, w, bias = _f32(2, 6, 10), _f32(6, 4, 5), _f32(4)
    b = GraphBuilder()
    b.op("ConvTranspose", [b.add_init("w", w), b.add_init("b", bias)],
         strides=[3], pads=[2, 2], output_padding=[1])
    out, _ = _run(tmp_path, b, {"input": x})
    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(bias),
        stride=3, padding=2, output_padding=1).numpy()
    np.testing.assert_allclose(list(out.values())[0], ref, atol=2e-5)


@pytest.mark.parametrize("ceil_mode", [0, 1])
def test_maxpool_matches_torch(tmp_path, ceil_mode):
    x = _f32(2, 3, 17)
    b = GraphBuilder()
    b.op("MaxPool", kernel_shape=[4], strides=[3], pads=[1, 1],
         ceil_mode=ceil_mode)
    out, _ = _run(tmp_path, b, {"input": x})
    ref = torch.nn.functional.max_pool1d(
        torch.from_numpy(x), 4, stride=3, padding=1,
        ceil_mode=bool(ceil_mode)).numpy()
    np.testing.assert_allclose(list(out.values())[0], ref, atol=1e-6)


@pytest.mark.parametrize("include_pad", [0, 1])
def test_avgpool_matches_torch(tmp_path, include_pad):
    x = _f32(2, 3, 16)
    b = GraphBuilder()
    b.op("AveragePool", kernel_shape=[4], strides=[2], pads=[1, 1],
         count_include_pad=include_pad)
    out, _ = _run(tmp_path, b, {"input": x})
    ref = torch.nn.functional.avg_pool1d(
        torch.from_numpy(x), 4, stride=2, padding=1,
        count_include_pad=bool(include_pad)).numpy()
    np.testing.assert_allclose(list(out.values())[0], ref, atol=1e-6)


def test_global_average_pool(tmp_path):
    x = _f32(2, 5, 7, 3)
    b = GraphBuilder()
    b.op("GlobalAveragePool")
    out, _ = _run(tmp_path, b, {"input": x})
    np.testing.assert_allclose(
        list(out.values())[0], x.mean(axis=(2, 3), keepdims=True), atol=1e-6)


# ------------------------------------------------------------------- norms

def test_batchnorm_matches_torch(tmp_path):
    x = _f32(2, 5, 9)
    scale, bias, mean = _f32(5), _f32(5), _f32(5)
    var = np.abs(_f32(5)) + 0.5
    b = GraphBuilder()
    b.batchnorm(scale, bias, mean, var)
    out, _ = _run(tmp_path, b, {"input": x})
    ref = torch.nn.functional.batch_norm(
        torch.from_numpy(x), torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5).numpy()
    np.testing.assert_allclose(list(out.values())[0], ref, atol=1e-5)


def test_layernorm_matches_torch(tmp_path):
    x = _f32(2, 7, 12)
    scale, bias = _f32(12), _f32(12)
    b = GraphBuilder()
    b.layernorm(scale, bias)
    out, _ = _run(tmp_path, b, {"input": x})
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (12,), torch.from_numpy(scale),
        torch.from_numpy(bias)).numpy()
    np.testing.assert_allclose(list(out.values())[0], ref, atol=1e-5)


def test_instancenorm_matches_torch(tmp_path):
    x = _f32(2, 4, 11)
    scale, bias = _f32(4), _f32(4)
    b = GraphBuilder()
    b.op("InstanceNormalization",
         [b.add_init("s", scale), b.add_init("b", bias)])
    out, _ = _run(tmp_path, b, {"input": x})
    ref = torch.nn.functional.instance_norm(
        torch.from_numpy(x), weight=torch.from_numpy(scale),
        bias=torch.from_numpy(bias)).numpy()
    np.testing.assert_allclose(list(out.values())[0], ref, atol=1e-5)


# -------------------------------------------------------------- recurrence

def _onnx_lstm_weights(cell: "torch.nn.LSTM", layer: int, reverse: bool):
    """torch gate order (i,f,g,o) -> ONNX (i,o,f,c)."""
    sfx = f"_l{layer}{'_reverse' if reverse else ''}"
    H = cell.hidden_size

    def reorder(w):
        i, f, g, o = w.detach().numpy().reshape(4, H, -1)
        return np.concatenate([i, o, f, g], axis=0)

    W = reorder(getattr(cell, f"weight_ih{sfx}"))
    R = reorder(getattr(cell, f"weight_hh{sfx}"))
    Wb = reorder(getattr(cell, f"bias_ih{sfx}").reshape(-1, 1))[:, 0]
    Rb = reorder(getattr(cell, f"bias_hh{sfx}").reshape(-1, 1))[:, 0]
    return W, R, np.concatenate([Wb, Rb])


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_matches_torch(tmp_path, bidirectional):
    T, B, I, H = 7, 3, 5, 4
    torch.manual_seed(0)
    cell = torch.nn.LSTM(I, H, bidirectional=bidirectional)
    dirs = [(0, False)] + ([(0, True)] if bidirectional else [])
    Ws, Rs, Bs = zip(*(_onnx_lstm_weights(cell, 0, rev) for _, rev in dirs))
    W, R, Bias = (np.stack(a).astype(np.float32) for a in (Ws, Rs, Bs))
    x = _f32(T, B, I)
    h0 = _f32(len(dirs), B, H)
    c0 = _f32(len(dirs), B, H)

    b = GraphBuilder()
    b.op("LSTM", [b.add_init("w", W), b.add_init("r", R),
                  b.add_init("b", Bias), "", b.add_init("h0", h0),
                  b.add_init("c0", c0)],
         hidden_size=H,
         direction=b"bidirectional" if bidirectional else b"forward")
    # LSTM's first output [T, D, B, H] is the builder's current value.
    out, _ = _run(tmp_path, b, {"input": x})
    y = list(out.values())[0]

    ref, _ = cell(torch.from_numpy(x),
                  (torch.from_numpy(h0), torch.from_numpy(c0)))
    ref = ref.detach().numpy()  # [T, B, D*H]
    D = len(dirs)
    got = np.moveaxis(y, 1, 2).reshape(T, B, D * H)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_lstm_sequence_lens_matches_packed_torch(tmp_path):
    T, B, I, H = 6, 3, 4, 5
    torch.manual_seed(1)
    cell = torch.nn.LSTM(I, H)
    W, R, Bias = (np.stack([a]).astype(np.float32)
                  for a in _onnx_lstm_weights(cell, 0, False))
    x = _f32(T, B, I)
    lens = np.array([6, 3, 1], np.int32)

    b = GraphBuilder()
    b.op("LSTM", [b.add_init("w", W), b.add_init("r", R),
                  b.add_init("b", Bias), b.add_init("lens", lens)],
         hidden_size=H, direction=b"forward")
    y_name = b.value
    b.nodes[-1] = node("LSTM", ["input", *list(b.init)[:4]],
                       [y_name, "yh", "yc"], hidden_size=H,
                       direction=b"forward")
    path = b.write(tmp_path / "m.onnx",
                   outputs=[(y_name, np.float32, []), ("yh", np.float32, [])])
    m = OnnxModel(path, jit=False)
    out = m(input=x)
    y = np.asarray(out[y_name])[:, 0]  # [T, B, H]
    yh = np.asarray(out["yh"])[0]

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), lens.tolist())
    yp, (hT, _) = cell(packed)
    ref, _ = torch.nn.utils.rnn.pad_packed_sequence(yp, total_length=T)
    np.testing.assert_allclose(y, ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(yh, hT.detach().numpy()[0], atol=1e-5)


def test_gru_matches_torch(tmp_path):
    T, B, I, H = 5, 2, 3, 4
    torch.manual_seed(2)
    cell = torch.nn.GRU(I, H)

    def reorder(w):  # torch gates (r,z,n) -> ONNX (z,r,h)
        r, z, n = w.detach().numpy().reshape(3, H, -1)
        return np.concatenate([z, r, n], axis=0)

    W = np.stack([reorder(cell.weight_ih_l0)]).astype(np.float32)
    R = np.stack([reorder(cell.weight_hh_l0)]).astype(np.float32)
    Wb = reorder(cell.bias_ih_l0.reshape(-1, 1))[:, 0]
    Rb = reorder(cell.bias_hh_l0.reshape(-1, 1))[:, 0]
    Bias = np.stack([np.concatenate([Wb, Rb])]).astype(np.float32)
    x = _f32(T, B, I)

    b = GraphBuilder()
    b.op("GRU", [b.add_init("w", W), b.add_init("r", R),
                 b.add_init("b", Bias)],
         hidden_size=H, linear_before_reset=1)  # torch semantics
    out, _ = _run(tmp_path, b, {"input": x})
    y = list(out.values())[0][:, 0]
    ref, _ = cell(torch.from_numpy(x))
    np.testing.assert_allclose(y, ref.detach().numpy(), atol=1e-5)


# ---------------------------------------------------- shapes, folding, jit

def test_shape_chain_folds_to_static_reshape_under_jit(tmp_path):
    """The exporter idiom Shape->Gather->Concat->Reshape must compile."""
    b = GraphBuilder()
    b.raw("Shape", ["input"], ["shp"])
    b.raw("Gather", ["shp", b.add_init("i0", np.array([0], np.int64))],
          ["d0"], axis=0)
    b.raw("Concat", ["d0", b.add_init("m1", np.array([-1], np.int64))],
          ["tgt"], axis=0)
    b.raw("Reshape", ["input", "tgt"], ["flat"])
    b.value = "flat"
    x = _f32(3, 4, 5)
    out, _ = _run(tmp_path, b, {"input": x}, jit=True)
    assert out["flat"].shape == (3, 20)
    np.testing.assert_allclose(out["flat"], x.reshape(3, 20))


def test_slice_split_gather_pad(tmp_path):
    x = _f32(2, 10)
    b = GraphBuilder()
    b.raw("Slice", ["input", *(b.add_init(n, np.array(v, np.int64))
                               for n, v in [("s", [1]), ("e", [2 ** 62]),
                                            ("a", [1]), ("st", [2])])],
          ["sl"])
    b.raw("Gather", ["sl", b.add_init("gi", np.array([-1, 0], np.int64))],
          ["ga"], axis=1)
    b.raw("Pad", ["ga", b.add_init("p", np.array([0, 1, 0, 2], np.int64))],
          ["pd"], mode=b"constant")
    b.value = "pd"
    out, _ = _run(tmp_path, b, {"input": x})
    sl = x[:, 1::2]
    ga = sl[:, [-1, 0]]
    ref = np.pad(ga, [(0, 0), (1, 2)])
    np.testing.assert_allclose(out["pd"], ref)


def test_transpose_concat_expand_tile_where(tmp_path):
    x = _f32(2, 3)
    b = GraphBuilder()
    b.raw("Transpose", ["input"], ["t"], perm=[1, 0])
    b.raw("Concat", ["t", "t"], ["c"], axis=1)
    b.raw("Greater", ["c", b.add_init("z", np.zeros((), np.float32))], ["g"])
    b.raw("Where", ["g", "c", b.add_init("nn", np.full((), -1.0, np.float32))],
          ["w"])
    b.value = "w"
    out, _ = _run(tmp_path, b, {"input": x})
    c = np.concatenate([x.T, x.T], axis=1)
    np.testing.assert_allclose(out["w"], np.where(c > 0, c, -1.0))


def test_reduce_mean_l2_argmax(tmp_path):
    x = _f32(3, 4, 5)
    b = GraphBuilder()
    b.op("ReduceMean", axes=[1], keepdims=1)
    out, _ = _run(tmp_path, b, {"input": x})
    np.testing.assert_allclose(list(out.values())[0],
                               x.mean(axis=1, keepdims=True), atol=1e-6)
    b = GraphBuilder()
    b.op("ReduceL2", axes=[2], keepdims=0)
    out, _ = _run(tmp_path, b, {"input": x})
    np.testing.assert_allclose(list(out.values())[0],
                               np.sqrt((x ** 2).sum(axis=2)), atol=1e-5)
    b = GraphBuilder()
    b.op("ArgMax", axis=1, keepdims=0)
    out, _ = _run(tmp_path, b, {"input": x})
    np.testing.assert_array_equal(list(out.values())[0], x.argmax(axis=1))


def test_gemm_softmax_erf_gelu_chain(tmp_path):
    x = _f32(4, 6)
    w, bias = _f32(8, 6), _f32(8)
    b = GraphBuilder()
    b.gemm(w, bias)
    b.op("Erf")
    b.op("Softmax", axis=-1)
    out, _ = _run(tmp_path, b, {"input": x})
    z = x @ w.T + bias
    e = np.vectorize(math.erf)(z)
    ref = np.exp(e) / np.exp(e).sum(-1, keepdims=True)
    np.testing.assert_allclose(list(out.values())[0], ref, atol=1e-5)


# ------------------------------------------------------------ quantization

def test_dequantize_per_axis(tmp_path):
    w = RNG.integers(-127, 127, (4, 6), dtype=np.int8)
    scale = np.abs(_f32(4)) + 0.01
    zp = RNG.integers(-10, 10, 4).astype(np.int8)
    b = GraphBuilder()
    b.raw("DequantizeLinear",
          ["input", b.add_init("s", scale), b.add_init("z", zp)],
          ["dq"], axis=0)
    b.value = "dq"
    path = b.write(tmp_path / "m.onnx", inputs=[("input", np.int8, [4, 6])])
    m = OnnxModel(path, jit=False)
    out = np.asarray(m(input=w)["dq"])
    ref = (w.astype(np.float32) - zp[:, None]) * scale[:, None]
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_dynamic_quantize_matmul_integer_approximates_float(tmp_path):
    x = _f32(5, 12)
    wq = RNG.integers(-127, 127, (12, 7), dtype=np.int8)
    wscale = np.float32(0.05)
    b = GraphBuilder()
    b.raw("DynamicQuantizeLinear", ["input"], ["xq", "xs", "xzp"])
    b.raw("MatMulInteger",
          ["xq", b.add_init("w", wq), "xzp",
           b.add_init("wzp", np.zeros((), np.int8))], ["mi"])
    b.raw("Cast", ["mi"], ["mf"], to=1)
    b.raw("Mul", ["mf", "xs"], ["m1"])
    b.raw("Mul", ["m1", b.add_init("ws", np.asarray(wscale))], ["y"])
    b.value = "y"
    out, _ = _run(tmp_path, b, {"input": x})
    ref = x @ (wq.astype(np.float32) * wscale)
    # Dynamic uint8 quantization of x bounds the error loosely; exact
    # per-op semantics are covered by test_dequantize_per_axis.
    np.testing.assert_allclose(out["y"], ref, atol=1.0)
    assert float(np.mean(np.abs(out["y"] - ref))) < 0.2


@pytest.mark.parametrize("a_dtype", [np.uint8, np.int8])
@pytest.mark.parametrize("jit", [False, True])
def test_matmul_integer_zero_points_bit_exact(tmp_path, a_dtype, jit):
    """The s8 MXU path's algebraic zero-point expansion must be
    bit-identical to the naive int32 upcast form (it is integer math:
    (a-za)(b-zb) = ab - za*colsum(b) - zb*rowsum(a) + K*za*zb)."""
    lo, hi = (0, 255) if a_dtype == np.uint8 else (-127, 127)
    a = RNG.integers(lo, hi, (2, 5, 12), dtype=a_dtype)
    w = RNG.integers(-127, 127, (12, 7), dtype=np.int8)
    azp = np.asarray(131 if a_dtype == np.uint8 else -9, a_dtype)
    bzp = np.asarray(3, np.int8)
    b = GraphBuilder()
    b.raw("MatMulInteger",
          ["input", b.add_init("w", w),
           b.add_init("azp", azp), b.add_init("bzp", bzp)], ["mi"])
    b.value = "mi"
    out, _ = _run(tmp_path, b, {"input": a},
                  inputs=[("input", a_dtype, list(a.shape))], jit=jit)
    ref = ((a.astype(np.int32) - np.int32(azp))
           @ (w.astype(np.int32) - np.int32(bzp)))
    np.testing.assert_array_equal(out["mi"], ref)
    assert out["mi"].dtype == np.int32


@pytest.mark.parametrize("jit", [False, True])
def test_matmul_integer_per_column_weight_zp(tmp_path, jit):
    """ORT per-channel weight quantization: b zero point is a [N] vector."""
    a = RNG.integers(0, 255, (4, 10), dtype=np.uint8)
    w = RNG.integers(-127, 127, (10, 6), dtype=np.int8)
    azp = np.asarray(77, np.uint8)
    bzp = RNG.integers(-8, 8, 6).astype(np.int8)
    b = GraphBuilder()
    b.raw("MatMulInteger",
          ["input", b.add_init("w", w),
           b.add_init("azp", azp), b.add_init("bzp", bzp)], ["mi"])
    b.value = "mi"
    out, _ = _run(tmp_path, b, {"input": a},
                  inputs=[("input", np.uint8, list(a.shape))], jit=jit)
    ref = ((a.astype(np.int32) - 77)
           @ (w.astype(np.int32) - bzp.astype(np.int32)[None, :]))
    np.testing.assert_array_equal(out["mi"], ref)


@pytest.mark.parametrize("jit", [False, True])
def test_qlinear_matmul_matches_emulation(tmp_path, jit):
    a = RNG.integers(0, 255, (3, 8), dtype=np.uint8)
    w = RNG.integers(-127, 127, (8, 5), dtype=np.int8)
    a_s, w_s, y_s = np.float32(0.02), np.float32(0.1), np.float32(0.05)
    a_zp, w_zp, y_zp = np.uint8(120), np.int8(4), np.uint8(128)
    b = GraphBuilder()
    b.raw("QLinearMatMul",
          ["input", b.add_init("as", a_s), b.add_init("azp", a_zp),
           b.add_init("w", w), b.add_init("ws", w_s), b.add_init("wzp", w_zp),
           b.add_init("ys", y_s), b.add_init("yzp", y_zp)], ["y"])
    b.value = "y"
    out, _ = _run(tmp_path, b, {"input": a},
                  inputs=[("input", np.uint8, list(a.shape))], jit=jit)
    acc = (a.astype(np.int32) - 120) @ (w.astype(np.int32) - 4)
    ref = np.clip(np.round(acc.astype(np.float32) * (0.02 * 0.1 / 0.05))
                  + 128, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out["y"], ref)
    assert out["y"].dtype == np.uint8


@pytest.mark.parametrize("jit", [False, True])
def test_conv_integer_matches_torch_int(tmp_path, jit):
    """uint8 x / int8 w with nonzero zero points; torch float64 conv of the
    shifted operands is an exact integer oracle (products fit 53 bits)."""
    x = RNG.integers(0, 255, (2, 3, 17), dtype=np.uint8)
    w = RNG.integers(-127, 127, (5, 3, 4), dtype=np.int8)
    xzp = np.uint8(101)
    wzp = RNG.integers(-6, 6, 5).astype(np.int8)  # per-output-channel
    b = GraphBuilder()
    b.raw("ConvInteger",
          ["input", b.add_init("w", w),
           b.add_init("xzp", xzp), b.add_init("wzp", wzp)], ["y"],
          strides=[2], pads=[1, 1])
    b.value = "y"
    out, _ = _run(tmp_path, b, {"input": x},
                  inputs=[("input", np.uint8, list(x.shape))], jit=jit)
    # ORT pads with x_zero_point (dequantized zero): shift first, pad 0.
    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x.astype(np.float64)) - 101.0,
        torch.from_numpy(w.astype(np.float64))
        - torch.from_numpy(wzp.astype(np.float64))[:, None, None],
        stride=2, padding=1).numpy().astype(np.int32)
    np.testing.assert_array_equal(out["y"], ref)
    assert out["y"].dtype == np.int32


@pytest.mark.parametrize("jit", [False, True])
def test_qlinear_conv_with_bias_per_channel_scale(tmp_path, jit):
    x = RNG.integers(0, 255, (1, 2, 15), dtype=np.uint8)
    w = RNG.integers(-127, 127, (4, 2, 3), dtype=np.int8)
    bias = RNG.integers(-2000, 2000, 4).astype(np.int32)
    x_s, y_s = np.float32(0.04), np.float32(0.1)
    w_s = (np.abs(RNG.standard_normal(4)) * 0.05 + 0.01).astype(np.float32)
    x_zp, y_zp = np.uint8(114), np.uint8(128)
    w_zp = np.zeros(4, np.int8)
    b = GraphBuilder()
    b.raw("QLinearConv",
          ["input", b.add_init("xs", x_s), b.add_init("xzp", x_zp),
           b.add_init("w", w), b.add_init("ws", w_s), b.add_init("wzp", w_zp),
           b.add_init("ys", y_s), b.add_init("yzp", y_zp),
           b.add_init("bias", bias)], ["y"], pads=[1, 1])
    b.value = "y"
    out, _ = _run(tmp_path, b, {"input": x},
                  inputs=[("input", np.uint8, list(x.shape))], jit=jit)
    acc = torch.nn.functional.conv1d(
        torch.from_numpy(x.astype(np.float64)) - 114.0,
        torch.from_numpy(w.astype(np.float64)),
        torch.from_numpy(bias.astype(np.float64)),
        padding=1).numpy()
    ref = np.clip(np.round(acc * (x_s * w_s / y_s)[None, :, None])
                  + 128, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out["y"], ref)
    assert out["y"].dtype == np.uint8


@pytest.mark.parametrize("jit", [False, True])
def test_qlinear_add_matches_emulation(tmp_path, jit):
    a = RNG.integers(0, 255, (2, 9), dtype=np.uint8)
    c = RNG.integers(0, 255, (2, 9), dtype=np.uint8)
    b = GraphBuilder()
    b.raw("QLinearAdd",
          ["input", b.add_init("as", np.float32(0.02)), b.add_init("az", np.uint8(10)),
           b.add_init("c", c), b.add_init("cs", np.float32(0.03)), b.add_init("cz", np.uint8(20)),
           b.add_init("ys", np.float32(0.05)), b.add_init("yz", np.uint8(7))], ["y"])
    b.value = "y"
    out, _ = _run(tmp_path, b, {"input": a},
                  inputs=[("input", np.uint8, list(a.shape))], jit=jit)
    f = (a.astype(np.float32) - 10) * 0.02 + (c.astype(np.float32) - 20) * 0.03
    ref = np.clip(np.round(f / 0.05) + 7, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out["y"], ref)


@pytest.mark.parametrize("jit", [False, True])
@pytest.mark.parametrize("quantized_out", [True, False])
def test_qgemm_matches_emulation(tmp_path, jit, quantized_out):
    a = RNG.integers(0, 255, (3, 6), dtype=np.uint8)
    w = RNG.integers(-127, 127, (4, 6), dtype=np.int8)  # transB layout
    bias = RNG.integers(-500, 500, 4).astype(np.int32)
    b = GraphBuilder()
    inits = [("as", np.float32(0.02)), ("az", np.uint8(99)), ("w", w),
             ("ws", np.float32(0.07)), ("wz", np.int8(2)), ("bias", bias)]
    if quantized_out:
        inits += [("ys", np.float32(0.2)), ("yz", np.uint8(128))]
    names = ["input"] + [b.add_init(k, v) for k, v in inits]
    b.raw("QGemm", names, ["y"], transB=1, alpha=1.0)
    b.value = "y"
    out, _ = _run(tmp_path, b, {"input": a},
                  inputs=[("input", np.uint8, list(a.shape))], jit=jit)
    acc = (a.astype(np.int64) - 99) @ (w.astype(np.int64).T - 2) + bias
    f = acc.astype(np.float32) * (0.02 * 0.07)
    if quantized_out:
        ref = np.clip(np.round(f / 0.2) + 128, 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(out["y"], ref)
    else:
        np.testing.assert_allclose(out["y"], f, rtol=1e-6)


@pytest.mark.parametrize("jit", [False, True])
def test_static_quant_cnn_chain(tmp_path, jit):
    """A statically-quantized CNN block end to end (the shape of an int8
    ERes2Net export): QuantizeLinear -> QLinearConv -> QLinearSigmoid ->
    QLinearGlobalAveragePool -> DequantizeLinear, vs float within
    quantization tolerance."""
    x = (RNG.standard_normal((1, 2, 30)).astype(np.float32) * 0.4)
    w = RNG.integers(-100, 100, (3, 2, 3), dtype=np.int8)
    ws = np.float32(0.01)
    b = GraphBuilder()
    xs = b.add_init("xs", np.float32(1 / 64))
    xz = b.add_init("xz", np.uint8(128))
    cs = b.add_init("cs", np.float32(1 / 32))
    cz = b.add_init("cz", np.uint8(128))
    ss = b.add_init("ss", np.float32(1 / 256))
    sz = b.add_init("sz", np.uint8(0))
    ps = b.add_init("ps", np.float32(1 / 256))
    pz = b.add_init("pz", np.uint8(0))
    b.raw("QuantizeLinear", ["input", xs, xz], ["xq"])
    b.raw("QLinearConv",
          ["xq", xs, xz, b.add_init("w", w), b.add_init("ws", ws),
           b.add_init("wz", np.int8(0)), cs, cz],
          ["cq"], pads=[1, 1])
    b.raw("QLinearSigmoid", ["cq", cs, cz, ss, sz], ["sq"])
    b.raw("QLinearGlobalAveragePool", ["sq", ss, sz, ps, pz], ["pq"])
    b.raw("DequantizeLinear", ["pq", ps, pz], ["y"])
    b.value = "y"
    out, _ = _run(tmp_path, b, {"input": x},
                  inputs=[("input", np.float32, list(x.shape))], jit=jit)
    conv = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w.astype(np.float32) * ws),
        padding=1).numpy()
    ref = (1.0 / (1.0 + np.exp(-conv))).mean(-1, keepdims=True)
    np.testing.assert_allclose(out["y"], ref, atol=0.03)


# ------------------------------------------------------------ control flow

def test_if_constant_condition_inlines(tmp_path):
    then_g = graph_bytes(
        [node("Mul", ["outer", "outer"], ["sq"])], {},
        outputs=[value_info("sq", np.float32, [])], name=b"then")
    else_g = graph_bytes(
        [node("Neg", ["outer"], ["ng"])], {},
        outputs=[value_info("ng", np.float32, [])], name=b"else")
    b = GraphBuilder()
    b.raw("Identity", ["input"], ["outer"])
    b.raw("If", [b.add_init("c", np.array(True))], ["y"],
          then_branch=Subgraph(then_g), else_branch=Subgraph(else_g))
    b.value = "y"
    x = _f32(3)
    out, _ = _run(tmp_path, b, {"input": x})
    np.testing.assert_allclose(out["y"], x * x)


def test_if_traced_condition_uses_lax_cond(tmp_path):
    then_g = graph_bytes(
        [node("Mul", ["outer", "outer"], ["sq"])], {},
        outputs=[value_info("sq", np.float32, [])], name=b"then")
    else_g = graph_bytes(
        [node("Neg", ["outer"], ["ng"])], {},
        outputs=[value_info("ng", np.float32, [])], name=b"else")
    b = GraphBuilder()
    b.raw("Identity", ["input"], ["outer"])
    b.raw("ReduceSum", ["input"], ["s"], keepdims=0)
    b.raw("Greater", ["s", b.add_init("z", np.zeros((), np.float32))], ["c"])
    b.raw("If", ["c"], ["y"],
          then_branch=Subgraph(then_g), else_branch=Subgraph(else_g))
    b.value = "y"
    x = np.abs(_f32(3)) + 1.0
    out, _ = _run(tmp_path, b, {"input": x}, jit=True)
    np.testing.assert_allclose(out["y"], x * x, atol=1e-6)
    out2 = OnnxModel(b.write(tmp_path / "m2.onnx"), jit=True)(input=-x)
    np.testing.assert_allclose(np.asarray(out2["y"]), x, atol=1e-6)


def test_loop_constant_trip_unrolls(tmp_path):
    # body: (iter, cond, acc) -> (cond, acc + outer_step, acc_scan)
    body = graph_bytes(
        [node("Add", ["acc_in", "outer_step"], ["acc_out"]),
         node("Identity", ["cond_in"], ["cond_out"]),
         node("Identity", ["acc_out"], ["scan0"])],
        {},
        inputs=[value_info("it", np.int64, []),
                value_info("cond_in", np.bool_, []),
                value_info("acc_in", np.float32, [])],
        outputs=[value_info("cond_out", np.bool_, []),
                 value_info("acc_out", np.float32, []),
                 value_info("scan0", np.float32, [])],
        name=b"body")
    b = GraphBuilder()
    b.raw("Identity", ["input"], ["outer_step"])
    b.raw("Loop", [b.add_init("M", np.array(4, np.int64)),
                   b.add_init("c", np.array(True)), b.add_init(
                       "acc0", np.zeros((2,), np.float32))],
          ["acc_final", "trace"], body=Subgraph(body))
    b.value = "acc_final"
    x = _f32(2)
    path = b.write(tmp_path / "m.onnx",
                   outputs=[("acc_final", np.float32, []),
                            ("trace", np.float32, [])])
    m = OnnxModel(path, jit=False)
    out = m(input=x)
    np.testing.assert_allclose(np.asarray(out["acc_final"]), 4 * x, atol=1e-6)
    assert np.asarray(out["trace"]).shape == (4, 2)


# ------------------------------------------------------------------ signal

def test_stft_matches_numpy(tmp_path):
    sig = _f32(2, 64)
    win = np.hanning(16).astype(np.float32)
    b = GraphBuilder()
    b.raw("STFT", ["input", b.add_init("fs", np.array(8, np.int64)),
                   b.add_init("w", win)], ["spec"], onesided=1)
    b.value = "spec"
    out, _ = _run(tmp_path, b, {"input": sig})
    frames = np.stack([sig[:, i * 8: i * 8 + 16] for i in range(7)], axis=1)
    ref = np.fft.rfft(frames * win, axis=-1)
    got = out["spec"]
    np.testing.assert_allclose(got[..., 0], ref.real, atol=1e-4)
    np.testing.assert_allclose(got[..., 1], ref.imag, atol=1e-4)


# --------------------------------------------------------------- full model

def test_small_cnn_classifier_matches_torch(tmp_path):
    """conv-bn-relu-pool-conv-relu-gap-flatten-gemm, end to end vs torch."""
    torch.manual_seed(3)
    tm = torch.nn.Sequential(
        torch.nn.Conv1d(2, 8, 5, stride=2, padding=2),
        torch.nn.BatchNorm1d(8),
        torch.nn.ReLU(),
        torch.nn.MaxPool1d(2, stride=2),
        torch.nn.Conv1d(8, 16, 3, padding=1, groups=2),
        torch.nn.ReLU(),
        torch.nn.AdaptiveAvgPool1d(1),
        torch.nn.Flatten(),
        torch.nn.Linear(16, 4),
    ).eval()
    x = _f32(3, 2, 40)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    c1, bn, _, _, c2, _, _, _, fc = tm
    b = GraphBuilder()
    b.conv(c1.weight.detach().numpy(), c1.bias.detach().numpy(),
           strides=[2], pads=[2, 2])
    b.batchnorm(bn.weight.detach().numpy(), bn.bias.detach().numpy(),
                bn.running_mean.numpy(), bn.running_var.numpy())
    b.relu()
    b.op("MaxPool", kernel_shape=[2], strides=[2])
    b.conv(c2.weight.detach().numpy(), c2.bias.detach().numpy(),
           pads=[1, 1], group=2)
    b.relu()
    b.op("GlobalAveragePool")
    b.op("Flatten")
    b.gemm(fc.weight.detach().numpy(), fc.bias.detach().numpy())
    out, m = _run(tmp_path, b, {"input": x}, jit=True)
    np.testing.assert_allclose(list(out.values())[0], ref, atol=1e-4)

    # Param reload: zeroing the classifier bias shifts outputs, no recompile.
    params = dict(m.params)
    fc_b = [k for k, v in params.items() if v.shape == (4,)]
    assert fc_b
    params[fc_b[0]] = np.zeros(4, np.float32)
    out2 = np.asarray(list(m(params=params, input=x).values())[0])
    np.testing.assert_allclose(out2, ref - fc.bias.detach().numpy(),
                               atol=1e-4)


# --------------------------------------------------------------------- api

def test_onnx_model_api_errors(tmp_path):
    b = GraphBuilder()
    b.relu()
    path = b.write(tmp_path / "m.onnx")
    m = OnnxModel(path, jit=False)
    with pytest.raises(TypeError, match="missing graph inputs"):
        m()
    with pytest.raises(TypeError, match="unknown graph inputs"):
        m(input=np.zeros(2, np.float32), bogus=1)
    assert "Relu" in m.describe()
    assert "Conv" in supported_ops()


def test_unsupported_op_raises_with_name(tmp_path):
    b = GraphBuilder()
    b.op("TotallyMadeUpOp")
    path = b.write(tmp_path / "m.onnx")
    m = OnnxModel(path, jit=False)
    with pytest.raises(UnsupportedOnnxOp, match="TotallyMadeUpOp"):
        m(input=np.zeros(2, np.float32))
    assert "UNSUPPORTED" in m.describe()


def test_value_info_roundtrip(tmp_path):
    b = GraphBuilder()
    b.relu()
    path = b.write(tmp_path / "m.onnx",
                   inputs=[("input", np.float32, [2, "T", 80])],
                   outputs=[(b.value, np.float32, [2, "T", 80])])
    g = load_onnx_graph(path)
    assert g.input_names == ["input"]
    vi = g.inputs[0]
    assert vi.dtype == np.float32 and vi.shape == [2, "T", 80]
    assert len(g.outputs) == 1


# ---------------------------------------------------- nd gather/scatter/rev

def test_reverse_sequence_matches_numpy(tmp_path):
    """ReverseSequence — the op bidirectional-RNN exports wrap their
    backward pass in (silero/wenet style)."""
    x = _f32(3, 7, 2)
    lens = np.array([7, 4, 1], np.int64)
    b = GraphBuilder()
    b.raw("ReverseSequence", ["input", "lens"], ["out"],
          batch_axis=0, time_axis=1)
    b.value = "out"
    out, _ = _run(tmp_path, b, {"input": x, "lens": lens},
                  inputs=[("input", np.float32, [3, 7, 2]),
                          ("lens", np.int64, [3])])
    ref = x.copy()
    for i, l in enumerate(lens):
        ref[i, :l] = x[i, :l][::-1]
    np.testing.assert_allclose(out["out"], ref, atol=0)

    # default layout: time-major (time_axis=0, batch_axis=1)
    xt = np.ascontiguousarray(x.transpose(1, 0, 2))
    b2 = GraphBuilder()
    b2.raw("ReverseSequence", ["input", "lens"], ["out"])
    b2.value = "out"
    out2, _ = _run(tmp_path, b2, {"input": xt, "lens": lens},
                   inputs=[("input", np.float32, [7, 3, 2]),
                           ("lens", np.int64, [3])])
    np.testing.assert_allclose(out2["out"], ref.transpose(1, 0, 2), atol=0)
    outj, _ = _run(tmp_path, b2, {"input": xt, "lens": lens},
                   inputs=[("input", np.float32, [7, 3, 2]),
                           ("lens", np.int64, [3])], jit=True)
    np.testing.assert_allclose(outj["out"], ref.transpose(1, 0, 2), atol=0)


def test_gather_nd_matches_numpy(tmp_path):
    x = _f32(4, 5, 6)
    idx = np.array([[1, 2], [3, 0], [0, 4]], np.int64)  # [3, 2] -> [3, 6]
    b = GraphBuilder()
    b.raw("GatherND", ["input", "idx"], ["out"])
    b.value = "out"
    out, _ = _run(tmp_path, b, {"input": x, "idx": idx},
                  inputs=[("input", np.float32, [4, 5, 6]),
                          ("idx", np.int64, [3, 2])])
    np.testing.assert_allclose(out["out"], x[idx[:, 0], idx[:, 1]], atol=0)
    outj, _ = _run(tmp_path, b, {"input": x, "idx": idx},
                   inputs=[("input", np.float32, [4, 5, 6]),
                           ("idx", np.int64, [3, 2])], jit=True)
    np.testing.assert_allclose(outj["out"], x[idx[:, 0], idx[:, 1]], atol=0)


def test_gather_nd_batch_dims(tmp_path):
    x = _f32(2, 5, 3)
    idx = np.array([[[1], [4]], [[0], [2]]], np.int64)  # [2, 2, 1], bd=1
    b = GraphBuilder()
    b.raw("GatherND", ["input", "idx"], ["out"], batch_dims=1)
    b.value = "out"
    out, _ = _run(tmp_path, b, {"input": x, "idx": idx},
                  inputs=[("input", np.float32, [2, 5, 3]),
                          ("idx", np.int64, [2, 2, 1])])
    ref = np.stack([x[0, [1, 4]], x[1, [0, 2]]])
    np.testing.assert_allclose(out["out"], ref, atol=0)


def test_scatter_nd_set_and_add(tmp_path):
    x = _f32(5, 3)
    idx = np.array([[1], [3]], np.int64)
    upd = _f32(2, 3)
    for red, want in (
        (None, None),   # replace
        ("add", None),
    ):
        b = GraphBuilder()
        kw = {"reduction": red} if red else {}
        b.raw("ScatterND", ["input", "idx", "upd"], ["out"], **kw)
        b.value = "out"
        out, _ = _run(tmp_path, b, {"input": x, "idx": idx, "upd": upd},
                      inputs=[("input", np.float32, [5, 3]),
                              ("idx", np.int64, [2, 1]),
                              ("upd", np.float32, [2, 3])])
        ref = x.copy()
        if red == "add":
            ref[[1, 3]] += upd
        else:
            ref[[1, 3]] = upd
        np.testing.assert_allclose(out["out"], ref, atol=1e-6)
        outj, _ = _run(tmp_path, b, {"input": x, "idx": idx, "upd": upd},
                       inputs=[("input", np.float32, [5, 3]),
                               ("idx", np.int64, [2, 1]),
                               ("upd", np.float32, [2, 3])], jit=True)
        np.testing.assert_allclose(outj["out"], ref, atol=1e-6)
