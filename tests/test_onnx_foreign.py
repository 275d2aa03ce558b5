"""The numpy ONNX interpreter on a FOREIGN graph: ops and attribute
forms our own exporter never emits (Slice/Gather/Shape/Cast/Gemm/...,
both attr-style and input-tensor-style axes). Guards against the
"coverage is exactly what the exporter emits" trap — a third-party
(e.g. raw ultralytics) export uses this vocabulary around the same
backbone ops."""
import numpy as np

from xrseg_tpu.io.onnx_exec import run_onnx
from xrseg_tpu.io.onnx_export import (_G, _fb, _fs, _fv, _tensor_proto,
                                      _value_info)


def _write_model(g: _G, path: str, inputs, outputs) -> str:
    graph = b"".join(_fb(1, n) for n in g.nodes)
    graph += _fs(2, "foreign_test_graph")
    graph += b"".join(_fb(5, t) for t in g.inits)
    for name, shape in inputs:
        graph += _fb(11, _value_info(name, shape))
    for name, shape in outputs:
        graph += _fb(12, _value_info(name, shape))
    model = _fv(1, 8) + _fs(2, "someone_else") + \
        _fb(8, _fs(1, "") + _fv(2, 13)) + _fb(7, graph)
    with open(path, "wb") as f:
        f.write(model)
    return path


def test_foreign_op_vocabulary(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 3, 8, 8)).astype(np.float32)
    w = rng.normal(0, 0.1, (192, 4)).astype(np.float32)
    bias = rng.normal(0, 1, (4,)).astype(np.float32)

    g = _G()
    # elementwise chain: Div -> Pow -> Clip(attrs-free, input bounds) ->
    # Sqrt -> Neg -> Exp
    two = g.init("two", np.asarray(2.0, np.float32))
    y = g.n("Div", ["images", two])
    y = g.n("Pow", [y, two])
    y = g.n("Clip", [y, g.init("lo", np.asarray(0.0, np.float32)),
                     g.init("hi", np.asarray(4.0, np.float32))])
    y = g.n("Sqrt", [y])
    y = g.n("Exp", [g.n("Neg", [y])])
    # Unsqueeze (input-form axes) then Squeeze (attr-form axes)
    y = g.n("Unsqueeze", [y, g.init("ax", np.asarray([0], np.int64))])
    g.n("Squeeze", [y], axes=[0], out_names=["out_chain"])

    # Shape -> Gather -> Range(0, H, 1) -> Cast float32
    sh = g.n("Shape", ["images"])
    h = g.n("Gather", [sh, g.init("i2", np.asarray(2, np.int64))])
    r = g.n("Range", [g.init("z", np.asarray(0, np.int64)), h,
                      g.init("one", np.asarray(1, np.int64))])
    g.n("Cast", [r], to=1, out_names=["out_range"])

    # Slice (input-form starts/ends/axes/steps, negative step axis left out)
    g.n("Slice", ["images",
                  g.init("st", np.asarray([0, 2], np.int64)),
                  g.init("en", np.asarray([2, 7], np.int64)),
                  g.init("sax", np.asarray([2, 3], np.int64)),
                  g.init("sst", np.asarray([1, 2], np.int64))],
        out_names=["out_slice"])

    # Flatten -> Gemm (transB=1 with alpha/beta)
    f = g.n("Flatten", ["images"], axis=1)
    g.n("Gemm", [f, g.init("w", w.T.copy()), g.init("b", bias)],
        alpha=1.0, beta=1.0, transB=1, out_names=["out_gemm"])

    # ReduceMax (attr axes) / ArgMax keepdims=0 / GlobalAveragePool
    g.n("ReduceMax", ["images"], axes=[2, 3], keepdims=1,
        out_names=["out_rmax"])
    am = g.n("ArgMax", ["images"], axis=1, keepdims=0)
    g.n("Cast", [am], to=1, out_names=["out_argmax"])
    g.n("GlobalAveragePool", ["images"], out_names=["out_gap"])

    # Where(Greater) / LeakyRelu / Expand
    gt = g.n("Greater", ["images", g.init("zz", np.asarray(0.0, np.float32))])
    g.n("Where", [gt, "images", g.n("Neg", ["images"])],
        out_names=["out_abs"])
    g.n("LeakyRelu", ["images"], alpha=0.1, out_names=["out_lrelu"])
    gap2 = g.n("GlobalAveragePool", ["images"])
    g.n("Expand", [gap2, g.init("esh", np.asarray([1, 3, 2, 2], np.int64))],
        out_names=["out_expand"])

    path = _write_model(g, str(tmp_path / "foreign.onnx"),
                        [("images", (1, 3, 8, 8))],
                        [("out_chain", (1, 3, 8, 8)),
                         ("out_range", (8,)),
                         ("out_slice", (1, 3, 2, 3)),
                         ("out_gemm", (1, 4)),
                         ("out_rmax", (1, 3, 1, 1)),
                         ("out_argmax", (1, 8, 8)),
                         ("out_gap", (1, 3, 1, 1)),
                         ("out_abs", (1, 3, 8, 8)),
                         ("out_lrelu", (1, 3, 8, 8)),
                         ("out_expand", (1, 3, 2, 2))])
    out = run_onnx(path, {"images": x})

    np.testing.assert_allclose(
        out["out_chain"],
        np.exp(-np.sqrt(np.clip((x / 2) ** 2, 0, 4))), rtol=1e-6)
    np.testing.assert_array_equal(out["out_range"],
                                  np.arange(8, dtype=np.float32))
    np.testing.assert_array_equal(out["out_slice"], x[:, :, 0:2, 2:7:2])
    np.testing.assert_allclose(out["out_gemm"],
                               x.reshape(1, -1) @ w + bias, rtol=1e-5)
    np.testing.assert_array_equal(out["out_rmax"],
                                  x.max(axis=(2, 3), keepdims=True))
    np.testing.assert_array_equal(out["out_argmax"], x.argmax(axis=1))
    np.testing.assert_allclose(out["out_gap"],
                               x.mean(axis=(2, 3), keepdims=True),
                               rtol=1e-6)
    np.testing.assert_array_equal(out["out_abs"], np.abs(x))
    np.testing.assert_allclose(out["out_lrelu"],
                               np.where(x >= 0, x, 0.1 * x), rtol=1e-6)
    np.testing.assert_allclose(
        out["out_expand"],
        np.broadcast_to(x.mean(axis=(2, 3), keepdims=True), (1, 3, 2, 2)),
        rtol=1e-6)


def test_foreign_constant_op(tmp_path):
    """Constant (embedded TensorProto attribute) — common in third-party
    graphs, never emitted by our exporter (it uses initializers)."""
    g = _G()
    c = g.n("Constant", [], value=np.asarray([[1.5, -2.0]], np.float32))
    g.n("Add", ["images", c], out_names=["out"])
    path = _write_model(g, str(tmp_path / "const.onnx"),
                        [("images", (1, 2))], [("out", (1, 2))])
    x = np.asarray([[10.0, 20.0]], np.float32)
    out = run_onnx(path, {"images": x})
    np.testing.assert_allclose(out["out"],
                               [[11.5, 18.0]], rtol=1e-6)
