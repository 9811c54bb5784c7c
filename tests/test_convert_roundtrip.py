"""Full-model checkpoint round trip: flax → torch-named state dict → flax.

Proves every leaf of every YOLO variant converts losslessly (checkpoint-fidelity
guarantee for the reference's fine-tuned weights, SURVEY.md hard part #4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_puncture_tpu.models.yolo import YOLOModel
from yolo_puncture_tpu.utils.torch_convert import (
    convert_yolo_state_dict,
    export_yolo_state_dict,
)


@pytest.mark.parametrize("version,scale,task", [
    ("v8", "n", "segment"),
    ("v10", "n", "segment"),
    ("v10", "s", "segment"),
    ("v11", "n", "segment"),
    ("v11", "n", "detect"),
])
def test_full_roundtrip_lossless(version, scale, task):
    model = YOLOModel(version=version, scale=scale, nc=1, task=task)
    rng = jax.random.PRNGKey(42)
    template = model.init(rng, jnp.zeros((1, 64, 64, 3), jnp.float32))
    # randomize all leaves so a faulty mapping can't hide behind zeros
    leaves, treedef = jax.tree.flatten(template)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    rand = [
        jax.random.normal(k, l.shape, l.dtype)
        if jnp.issubdtype(l.dtype, jnp.floating)
        else l
        for k, l in zip(keys, leaves)
    ]
    variables = jax.tree.unflatten(treedef, rand)

    sd = export_yolo_state_dict(variables)
    restored, report = convert_yolo_state_dict(sd, template, strict=False)

    assert not report["unmatched_torch_keys"], report["unmatched_torch_keys"][:5]
    assert not report["unfilled_flax_leaves"], report["unfilled_flax_leaves"][:5]

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables)[0],
        jax.tree_util.tree_flatten_with_path(restored)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, err_msg=str(pa)
        )
