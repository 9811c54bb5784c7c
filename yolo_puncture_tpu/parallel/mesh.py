"""Device-mesh + sharding helpers (the framework's distributed layer).

The reference has no in-repo distributed code (SURVEY.md §2.3); its multi-GPU story
is ultralytics DDP behind a CLI flag.  The TPU-native equivalent is declarative:
pick a Mesh over ICI, annotate shardings with NamedSharding/PartitionSpec, and let
XLA insert the collectives (psum for gradients, all-gather for resharded params).

Axes:
  'data'  — batch/frame/video data parallelism (BASELINE config 5 shards videos)
  'model' — tensor parallelism for wide layers (classifier head, PSA attention,
            proto bank); most YOLO-scale layers stay replicated.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a Mesh over available devices.  Default: all devices on 'data',
    1 on 'model' (pure DP); pass shape=(d, m) for hybrid DP×TP."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a pytree of arrays with the leading dim sharded over ``axis``."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def param_shardings(mesh: Mesh, params, model_axis: str = "model", min_size: int = 2 ** 18):
    """Sharding tree for params: large 2-D+ kernels shard their output-channel dim
    over ``model_axis`` (tensor parallelism); everything else replicates.

    Output-channel sharding keeps each conv/matmul local until the next op needs
    the full activation, where XLA inserts an all-gather over ICI.
    """
    axis_size = mesh.shape[model_axis]

    def spec_for(x):
        if x.ndim >= 2 and x.size >= min_size and x.shape[-1] % axis_size == 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), model_axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def data_parallel_step(
    mesh: Mesh,
    step_fn: Callable,
    donate_state: bool = True,
):
    """jit ``step_fn(state, batch) → (state, metrics)`` with state replicated and
    batch sharded on 'data'.  Gradient psum is implicit: the loss averages over the
    global batch, so XLA emits the all-reduce over ICI."""
    state_sharding = NamedSharding(mesh, P())

    def batch_sharding_for(x):
        return NamedSharding(mesh, P("data", *([None] * (max(x.ndim, 1) - 1))))

    def wrapper(state, batch):
        return step_fn(state, batch)

    return jax.jit(
        wrapper,
        in_shardings=(state_sharding, None),
        out_shardings=(state_sharding, None),
        donate_argnums=(0,) if donate_state else (),
    )
