"""Op-level semantics of the ONNX→JAX interpreter (metrics/onnx_jax.py).

Covers the ONNX-spec corners the committed DNSMOS graphs happen not to
exercise: optional-input Clip, default pool strides (1, not kernel),
count_include_pad=0 average pooling, Reduce* axes-as-input (opset 18),
axes-omitted Squeeze, and SAME_LOWER conv padding. Graphs are built as
parsed-node dicts directly (the image has no onnx package to serialize
protos with).
"""

import jax.numpy as jnp
import numpy as np

from sonicsim_tpu.metrics.onnx_jax import OnnxJaxModel


def _model(nodes, inputs, outputs, inits=None):
    m = OnnxJaxModel.__new__(OnnxJaxModel)
    m.nodes = nodes
    m.inits = {k: jnp.asarray(v) for k, v in (inits or {}).items()}
    m.input_names = inputs
    m.output_names = outputs
    return m


def test_clip_min_only_two_inputs():
    # opset 11+: Clip(x, min) with no max input must still clip below.
    m = _model(
        [{"op": "Clip", "inputs": ["x", "lo"], "outputs": ["y"], "attrs": {}}],
        ["x"], ["y"], inits={"lo": np.float32(0.0)},
    )
    x = np.array([-2.0, -0.5, 1.5], np.float32)
    np.testing.assert_allclose(np.asarray(m(x)[0]), [0.0, 0.0, 1.5])


def test_maxpool_default_stride_is_one():
    m = _model(
        [{"op": "MaxPool", "inputs": ["x"], "outputs": ["y"],
          "attrs": {"kernel_shape": [1, 3]}}],
        ["x"], ["y"],
    )
    x = np.arange(4, dtype=np.float32).reshape(1, 1, 1, 4)
    out = np.asarray(m(x)[0])
    assert out.shape == (1, 1, 1, 2)  # stride 1, not stride 3
    np.testing.assert_allclose(out.ravel(), [2.0, 3.0])


def test_averagepool_excludes_padding_by_default():
    m = _model(
        [{"op": "AveragePool", "inputs": ["x"], "outputs": ["y"],
          "attrs": {"kernel_shape": [1, 3], "pads": [0, 1, 0, 1]}}],
        ["x"], ["y"],
    )
    x = np.array([3.0, 6.0, 9.0], np.float32).reshape(1, 1, 1, 3)
    # count_include_pad=0 (default): border means divide by the number of
    # REAL cells (2, 3, 2), not the kernel size.
    np.testing.assert_allclose(np.asarray(m(x)[0]).ravel(), [4.5, 6.0, 7.5])


def test_averagepool_count_include_pad():
    m = _model(
        [{"op": "AveragePool", "inputs": ["x"], "outputs": ["y"],
          "attrs": {"kernel_shape": [1, 3], "pads": [0, 1, 0, 1],
                    "count_include_pad": 1}}],
        ["x"], ["y"],
    )
    x = np.array([3.0, 6.0, 9.0], np.float32).reshape(1, 1, 1, 3)
    np.testing.assert_allclose(np.asarray(m(x)[0]).ravel(), [3.0, 6.0, 5.0])


def test_reduce_mean_axes_as_input():
    # opset 18: axes arrive as input 2, not as an attribute.
    m = _model(
        [{"op": "ReduceMean", "inputs": ["x", "ax"], "outputs": ["y"],
          "attrs": {}}],
        ["x"], ["y"], inits={"ax": np.array([-1], np.int64)},
    )
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    out = np.asarray(m(x)[0])
    assert out.shape == (2, 1)
    np.testing.assert_allclose(out.ravel(), [1.0, 4.0])


def test_reduce_max_axes_as_input():
    m = _model(
        [{"op": "ReduceMax", "inputs": ["x", "ax"], "outputs": ["y"],
          "attrs": {"keepdims": 0}}],
        ["x"], ["y"], inits={"ax": np.array([0], np.int64)},
    )
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    np.testing.assert_allclose(np.asarray(m(x)[0]), [3.0, 4.0, 5.0])


def test_squeeze_all_unit_dims_when_axes_omitted():
    m = _model(
        [{"op": "Squeeze", "inputs": ["x"], "outputs": ["y"], "attrs": {}}],
        ["x"], ["y"],
    )
    x = np.zeros((1, 3, 1), np.float32)
    assert np.asarray(m(x)[0]).shape == (3,)


def test_conv_same_lower_vs_upper():
    # in=5, k=2, stride=2 -> 1 surplus pad cell: UPPER puts it at the end,
    # LOWER at the beginning (hand-checked sums below).
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32).reshape(1, 1, 5)
    w = np.ones((1, 1, 2), np.float32)

    def run(auto_pad):
        m = _model(
            [{"op": "Conv", "inputs": ["x", "w"], "outputs": ["y"],
              "attrs": {"kernel_shape": [2], "strides": [2],
                        "auto_pad": auto_pad}}],
            ["x"], ["y"], inits={"w": w},
        )
        return np.asarray(m(x)[0]).ravel()

    np.testing.assert_allclose(run("SAME_UPPER"), [3.0, 7.0, 5.0])
    np.testing.assert_allclose(run("SAME_LOWER"), [1.0, 5.0, 9.0])
