"""Golden-value regression: fixed-seed YOLO forward outputs must stay stable
across refactors (protects the fp32 numeric contract the checkpoint-parity
story depends on — SURVEY.md BASELINE 'fp32 fidelity').

Regenerate (only when an INTENTIONAL numeric change lands):
    see the generation snippet in the git history of this file / PARITY.md.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "yolo_forward_golden.npz")


@pytest.mark.parametrize("name", ["yolov8n-seg", "yolo10n-seg", "yolo11n-seg"])
def test_forward_matches_golden(name):
    from yolo_puncture_tpu import create_model

    data = np.load(GOLDEN)
    x = jnp.asarray(data["input"])
    model = create_model(name, nc=1)
    v = jax.jit(model.init)(jax.random.PRNGKey(7), x)
    out = jax.jit(lambda v, x: model.apply(v, x))(v, x)
    np.testing.assert_allclose(
        np.asarray(out["boxes"]), data[f"{name}_boxes"], rtol=1e-4, atol=1e-3,
        err_msg=f"{name} boxes drifted from golden",
    )
    np.testing.assert_allclose(
        np.asarray(out["probs"]), data[f"{name}_probs"], rtol=1e-4, atol=1e-5,
        err_msg=f"{name} probs drifted from golden",
    )
    np.testing.assert_allclose(
        np.asarray(out["proto"]), data[f"{name}_proto"], rtol=1e-4, atol=1e-4,
        err_msg=f"{name} proto drifted from golden",
    )
