"""Torch↔flax conversion: numeric parity of conv/bn/pool arithmetic and key mapping.

These tests pin the layout/padding semantics that checkpoint fidelity depends on
(SURVEY.md hard part #4: matching torch pixel semantics exactly).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from yolo_puncture_tpu.nn.common import ConvBN, max_pool_same
from yolo_puncture_tpu.utils.torch_convert import (
    convert_tensor,
    map_yolo_key,
)

rng = np.random.default_rng(0)


def _convbn_torch(cin, cout, k, s, groups=1):
    conv = tnn.Conv2d(cin, cout, k, s, k // 2, groups=groups, bias=False)
    bn = tnn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.uniform_(-0.5, 0.5)
    bn.running_mean.data.uniform_(-0.2, 0.2)
    bn.running_var.data.uniform_(0.5, 1.5)
    conv.eval()
    bn.eval()
    return conv, bn


@pytest.mark.parametrize("cin,cout,k,s,groups", [
    (8, 16, 3, 1, 1),
    (8, 16, 3, 2, 1),   # stride-2 even input: the padding-parity trap
    (16, 16, 1, 1, 1),
    (16, 16, 3, 2, 16),  # depthwise
    (16, 16, 7, 1, 16),  # large-kernel depthwise (RepVGGDW)
])
def test_convbn_matches_torch(cin, cout, k, s, groups):
    conv, bn = _convbn_torch(cin, cout, k, s, groups)
    x = rng.normal(size=(1, cin, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tnn.functional.silu(bn(conv(torch.from_numpy(x)))).numpy()

    mod = ConvBN(cout, k, s, groups=groups)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    p = variables["params"]
    p["conv"]["kernel"] = convert_tensor(
        "conv.weight", conv.weight.detach().numpy(), p["conv"]["kernel"].shape
    )
    p["bn"]["scale"] = bn.weight.detach().numpy()
    p["bn"]["bias"] = bn.bias.detach().numpy()
    stats = variables["batch_stats"]
    stats["bn"]["mean"] = bn.running_mean.numpy()
    stats["bn"]["var"] = bn.running_var.numpy()

    out = mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_conv_transpose_matches_torch():
    ct = tnn.ConvTranspose2d(8, 8, 2, 2, 0, bias=True)
    x = rng.normal(size=(1, 8, 7, 7)).astype(np.float32)
    with torch.no_grad():
        ref = ct(torch.from_numpy(x)).numpy()

    from flax import linen as nn

    mod = nn.ConvTranspose(8, (2, 2), strides=(2, 2), padding="VALID")
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    k = convert_tensor(
        "upsample.weight", ct.weight.detach().numpy(), variables["params"]["kernel"].shape
    )
    variables = {"params": {"kernel": k, "bias": ct.bias.detach().numpy()}}
    out = mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_maxpool_matches_torch():
    x = rng.normal(size=(1, 4, 10, 10)).astype(np.float32)
    with torch.no_grad():
        ref = tnn.MaxPool2d(5, 1, 2)(torch.from_numpy(x)).numpy()
    out = max_pool_same(jnp.asarray(x.transpose(0, 2, 3, 1)), 5)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-6)


@pytest.mark.parametrize("tkey,path,kind", [
    ("model.0.conv.weight", ("model_0", "conv"), "kernel"),
    ("model.0.bn.weight", ("model_0", "bn"), "scale"),
    ("model.0.bn.running_mean", ("model_0", "bn"), "mean"),
    ("model.2.m.0.cv1.conv.weight", ("model_2", "m_0", "cv1", "conv"), "kernel"),
    ("model.22.cv2.1.0.conv.weight", ("model_22", "cv2_1", "c0", "conv"), "kernel"),
    ("model.22.cv2.1.2.weight", ("model_22", "cv2_1", "c2"), "kernel"),
    ("model.22.cv2.1.2.bias", ("model_22", "cv2_1", "c2"), "bias"),
    (
        "model.23.cv3.0.0.1.bn.running_var",
        ("model_23", "cv3_0", "c0_1", "bn"),
        "var",
    ),
    (
        "model.23.one2one_cv3.2.1.0.conv.weight",
        ("model_23", "one2one_cv3_2", "c1_0", "conv"),
        "kernel",
    ),
    ("model.22.proto.cv1.conv.weight", ("model_22", "proto", "cv1", "conv"), "kernel"),
    ("model.22.proto.upsample.weight", ("model_22", "proto", "upsample"), "kernel"),
    ("model.8.m.0.cv1.0.conv.weight", ("model_8", "m_0", "cv1_0", "conv"), "kernel"),
    ("model.10.attn.qkv.conv.weight", ("model_10", "attn", "qkv", "conv"), "kernel"),
    ("model.10.ffn.0.conv.weight", ("model_10", "ffn_0", "conv"), "kernel"),
    ("model.6.m.0.m.1.cv2.bn.weight", ("model_6", "m_0", "m_1", "cv2", "bn"), "scale"),
])
def test_map_yolo_key(tkey, path, kind):
    assert map_yolo_key(tkey) == (path, kind)


def test_map_yolo_key_skips():
    assert map_yolo_key("model.23.dfl.conv.weight") is None
    assert map_yolo_key("model.0.bn.num_batches_tracked") is None


def test_full_model_conversion_roundtrip():
    """Build a torch-style state dict from the flax template by inverse-mapping a
    few known keys, convert, and check values landed in the right leaves."""
    from yolo_puncture_tpu.models.yolo import YOLOModel
    from yolo_puncture_tpu.utils.torch_convert import convert_yolo_state_dict

    model = YOLOModel(version="v8", scale="n", nc=1, task="segment")
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    k0 = np.asarray(template["params"]["model_0"]["conv"]["kernel"])  # (3,3,3,16)
    sd = {
        "model.0.conv.weight": np.arange(np.prod(k0.shape), dtype=np.float32).reshape(
            k0.shape[3], k0.shape[2], k0.shape[0], k0.shape[1]
        ),
        "model.0.bn.weight": np.full((k0.shape[3],), 2.0, np.float32),
        "model.0.bn.running_var": np.full((k0.shape[3],), 3.0, np.float32),
    }
    variables, report = convert_yolo_state_dict(sd, template)
    assert not report["unmatched_torch_keys"]
    got = np.asarray(variables["params"]["model_0"]["conv"]["kernel"])
    np.testing.assert_array_equal(got, sd["model.0.conv.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["model_0"]["bn"]["scale"]), 2.0
    )
    np.testing.assert_array_equal(
        np.asarray(variables["batch_stats"]["model_0"]["bn"]["var"]), 3.0
    )


def test_square_linear_weight_transposed():
    """Square torch Linear weights MUST be transposed (a same-shape early
    return would silently load W where W.T belongs — SAM's dim→dim attention
    projections hit exactly this)."""
    import numpy as np
    from yolo_puncture_tpu.utils.torch_convert import convert_tensor

    W = np.arange(9, dtype=np.float32).reshape(3, 3)
    np.testing.assert_array_equal(
        convert_tensor("blocks.0.attn.proj.weight", W, (3, 3)), W.T
    )
    # embedding tables are already (num, dim) in both frameworks — no transpose
    E = np.arange(12, dtype=np.float32).reshape(4, 3)
    np.testing.assert_array_equal(
        convert_tensor("tok_embedding.weight", E, (4, 3)), E
    )
