"""Mesh / sharding helpers on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from yolo_puncture_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    replicate,
    shard_batch,
)


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh((4, 2))
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_shard_batch_places_leading_dim():
    mesh = make_mesh((8, 1))
    batch = {"x": np.zeros((16, 4), np.float32), "y": np.zeros((16,), np.int32)}
    sharded = shard_batch(mesh, jax.tree.map(jnp.asarray, batch))
    assert sharded["x"].sharding.spec == P("data", None)
    assert sharded["y"].sharding.spec == P("data")


def test_replicate():
    mesh = make_mesh((8, 1))
    tree = {"w": jnp.ones((4, 4))}
    rep = replicate(mesh, tree)
    assert rep["w"].sharding.spec == P()


def test_param_shardings_splits_large_kernels():
    mesh = make_mesh((4, 2))
    params = {
        "big": jnp.zeros((3, 3, 256, 512)),      # ≥ min_size, 512 % 2 == 0 → TP
        "small": jnp.zeros((3, 3, 8, 16)),
        "vec": jnp.zeros((128,)),
    }
    sh = param_shardings(mesh, params, min_size=2 ** 14)
    assert sh["big"].spec == P(None, None, None, "model")
    assert sh["small"].spec == P()
    assert sh["vec"].spec == P()


def test_sharded_matmul_runs_with_collectives():
    mesh = make_mesh((4, 2))
    x = jax.device_put(
        jnp.ones((8, 256)), jax.sharding.NamedSharding(mesh, P("data", None))
    )
    w = jax.device_put(
        jnp.ones((256, 512)), jax.sharding.NamedSharding(mesh, P(None, "model"))
    )

    @jax.jit
    def f(x, w):
        return jnp.sum(x @ w)

    out = f(x, w)
    assert float(out) == 8 * 256 * 512


def test_trainer_resume_and_ema(tmp_path):
    from yolo_puncture_tpu import create_model
    from yolo_puncture_tpu.train.trainer import Trainer

    model = create_model("yolov8n-seg", nc=1)
    tr = Trainer(model, nc=1, imgsz=64, total_steps=10, warmup_steps=0)
    from tests.test_train import _tiny_batch

    batch = _tiny_batch()
    state = tr.init_state(batch)
    assert state.ema_params is not None
    state, _ = tr.train_step(state, batch)
    path = tr.save_checkpoint(state, str(tmp_path))
    restored = Trainer.load_checkpoint(path)
    assert restored["step"] == 1
    assert "ema_params" in restored
    # EMA actually updated: at step 1 the ramp decay d ≈ 0.0005, so the EMA
    # must have moved from its init copy and lie close to the NEW params
    p_new = np.concatenate([np.ravel(x) for x in jax.tree.leaves(state.params)])
    e_new = np.concatenate([np.ravel(x) for x in jax.tree.leaves(state.ema_params)])
    e_init = np.concatenate(
        [np.ravel(x) for x in jax.tree.leaves(tr.init_state(batch).ema_params)]
    )
    assert np.abs(e_new - e_init).max() > 0          # moved off the init copy
    assert np.abs(e_new - p_new).max() < 1e-2        # ≈ current params at d≈0
    # SGD momentum buffers survive the round trip (resume must not reset them)
    assert restored.get("opt_state") is not None

    # a resumed fit() restores params, EMA, and opt_state from the checkpoint —
    # NOT the fresh random init (a fresh-init EMA would be blended in at the
    # restored-step decay and poison the average)
    class _OneBatch:
        def batches(self, bs):
            yield batch

    tr2 = Trainer(model, nc=1, imgsz=64, total_steps=10, warmup_steps=0, seed=123)
    state2 = tr2.fit(_OneBatch(), epochs=1, resume=path)
    assert int(state2.step) == 2  # 1 restored + 1 new step
    # after ONE resumed step the EMA must stay close to the restored EMA
    # (ramp decay ~0 at step 2 ⇒ ema ≈ new params, which started at restored
    # params) — with a fresh random init it would be far away
    e_new = np.concatenate([np.ravel(x) for x in jax.tree.leaves(state2.ema_params)])
    e_old = np.concatenate([np.ravel(x) for x in jax.tree.leaves(state.ema_params)])
    assert np.abs(e_new - e_old).mean() < 0.1 * (np.abs(e_old).mean() + 1e-8)
