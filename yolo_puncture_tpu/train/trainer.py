"""Fine-tune trainer: pjit data-parallel SGD with warmup, orbax checkpoints.

Replaces the reference's delegated ``yolo train`` CLI (SURVEY.md §2.2 'YOLO
train/val CLI'; ultralytics defaults: SGD momentum 0.937, weight decay 5e-4,
3-epoch warmup, linear lr decay lr0→lr0·lrf).  The train step — forward, loss
(train/losses.py), grads, optimizer update, BN-stat update — is ONE jitted
program; with a multi-device mesh the batch shards over 'data' and XLA inserts
the gradient all-reduce over ICI (parallel/mesh.py design).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Any = None  # exponential moving average (ultralytics ModelEMA analog)


def lr_schedule(lr0: float, lrf: float, total_steps: int, warmup_steps: int):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr0 * step / jnp.maximum(warmup_steps, 1)
        frac = jnp.clip(
            (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0, 1
        )
        decay = lr0 * (1.0 - frac) + lr0 * lrf * frac
        return jnp.where(step < warmup_steps, warm, decay)

    return fn


class Trainer:
    def __init__(
        self,
        model,
        nc: int,
        imgsz: int = 640,
        lr0: float = 0.01,
        lrf: float = 0.01,
        momentum: float = 0.937,
        weight_decay: float = 5e-4,
        total_steps: int = 10_000,
        warmup_steps: int = 300,
        hyp: Optional[Dict[str, float]] = None,
        mesh=None,
        ema_decay: float = 0.9999,
        use_ema: bool = True,
        seed: int = 0,
        clip_norm: float = 0.0,
    ):
        self.model = model
        self.nc = nc
        self.imgsz = imgsz
        self.hyp = hyp or {"box": 7.5, "cls": 0.5, "dfl": 1.5, "seg": 1.0}
        self.mesh = mesh
        self.schedule = lr_schedule(lr0, lrf, total_steps, warmup_steps)
        self.tx = optax.chain(
            # optional global-norm gradient clip (ultralytics relies on AMP's
            # GradScaler for spike protection; fp32 SGD at large imgsz needs
            # an explicit bound — the 640² b8 run diverged without one)
            *((optax.clip_by_global_norm(clip_norm),) if clip_norm else ()),
            # ultralytics optimizer grouping: weight decay on ≥2-D kernels
            # only — BN scale/bias and conv/head biases are no-decay groups
            optax.add_decayed_weights(
                weight_decay,
                mask=lambda params: jax.tree.map(lambda p: p.ndim >= 2, params),
            ),
            optax.sgd(learning_rate=self.schedule, momentum=momentum, nesterov=True),
        )
        self.ema_decay = ema_decay
        self.use_ema = use_ema
        self._seed = seed
        self._step_fn = None

    def init_state(self, example_batch) -> TrainState:
        variables = self.model.init(
            jax.random.PRNGKey(self._seed), jnp.asarray(example_batch["images"][:1])
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            ema_params=jax.tree.map(jnp.copy, params) if self.use_ema else None,
        )

    def _build_step(self):
        from yolo_puncture_tpu.train.losses import detection_loss

        model, nc, hyp = self.model, self.nc, self.hyp
        tx = self.tx

        def loss_fn(params, batch_stats, batch):
            # uint8-over-the-wire: train_step ships images as uint8 and masks
            # as uint8 (4× less host→device traffic — the remote-tunnel
            # transport additionally never frees its per-transfer host staging
            # buffers, so bytes shipped ≈ bytes leaked; measured 37 MB/step at
            # 640² b8 fp32, the OOM that killed the r4 2000-step run at 128 GB
            # RSS).  Dtypes are static at trace time, so this is free.
            batch = dict(batch)
            if batch["images"].dtype == jnp.uint8:
                batch["images"] = batch["images"].astype(jnp.float32) / 255.0
            if "gt_masks" in batch and batch["gt_masks"].dtype == jnp.uint8:
                batch["gt_masks"] = batch["gt_masks"].astype(jnp.float32)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out, updates = model.apply(
                variables, batch["images"], train=True, mutable=["batch_stats"]
            )
            total, losses = detection_loss(out, batch, nc=nc, hyp=hyp)
            return total, (losses, updates.get("batch_stats", {}))

        def step(state: TrainState, batch):
            (loss, (losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema = state.ema_params
            if ema is not None:
                # ultralytics ModelEMA ramp: d = decay·(1 − e^(−step/2000))
                d = self.ema_decay * (1.0 - jnp.exp(-(state.step + 1) / 2000.0))
                ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema, params)
            new_state = TrainState(
                params=params,
                batch_stats=new_stats if new_stats else state.batch_stats,
                opt_state=opt_state,
                step=state.step + 1,
                ema_params=ema,
            )
            metrics = {k: v for k, v in losses.items()}
            metrics["lr"] = self.schedule(state.step)
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics

        # with a mesh, sharding follows the inputs (train_step device_puts the
        # batch on 'data'); XLA inserts the gradient all-reduce automatically
        self._step_fn = jax.jit(step, donate_argnums=(0,))
        return self._step_fn

    @staticmethod
    def _quantize_for_transfer(batch):
        """Ship images/masks as uint8 (cast back inside the jitted step).

        Lossless for the augmentation pipeline's output (uint8 canvases
        normalized by /255 → every value is k/255) and for {0,1} mask
        rasters; ≤1/510 rounding error for arbitrary [0,1] floats.  Images
        with values OUTSIDE [0,1] (e.g. standardized inputs) are shipped
        unquantized — blind round-to-uint8 would wrap negatives silently.
        Cuts host→device bytes 4× — and works around the remote tunnel's
        transfer-buffer leak (bytes shipped ≈ host bytes leaked, which
        OOM-killed the 2000-step 640² run at 128 GB RSS)."""
        import numpy as np

        im = batch.get("images")
        out = None
        if (
            isinstance(im, np.ndarray)
            and im.dtype == np.float32
            and im.size
            and 0.0 <= im.min()
            and im.max() <= 1.0
        ):
            out = dict(batch)
            out["images"] = np.round(im * 255.0).astype(np.uint8)
        gm = batch.get("gt_masks")
        if (
            isinstance(gm, np.ndarray)
            and gm.dtype == np.float32
            and gm.size
            and 0.0 <= gm.min()
            and gm.max() <= 1.0
        ):
            out = out if out is not None else dict(batch)
            out["gt_masks"] = np.round(gm).astype(np.uint8)
        return out if out is not None else batch

    def train_step(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        if self._step_fn is None:
            self._build_step()
        batch = self._quantize_for_transfer(batch)
        if self.mesh is not None:
            from yolo_puncture_tpu.parallel.mesh import shard_batch

            batch = shard_batch(self.mesh, jax.tree.map(jnp.asarray, batch))
        else:
            batch = jax.tree.map(jnp.asarray, batch)
        return self._step_fn(state, batch)

    def fit(
        self,
        dataset,
        epochs: int = 1,
        batch_size: int = 8,
        log_every: int = 10,
        ckpt_dir: Optional[str] = None,
        ckpt_every: int = 1000,
        resume: Optional[str] = None,
        close_mosaic: int = 10,
    ) -> TrainState:
        state = None
        step = 0
        restored = self.load_checkpoint(resume) if resume else None
        for epoch in range(epochs):
            # disable mosaic for the final `close_mosaic` epochs so late
            # training sees inference-statistics images; like the ultralytics
            # trainer the reference shells out to, the trigger only exists
            # when the run is longer than the close window
            if (
                close_mosaic
                and epochs > close_mosaic
                and epochs - epoch <= close_mosaic
                and getattr(dataset, "mosaic", 0)
            ):
                dataset.mosaic = 0.0
            for batch in dataset.batches(batch_size):
                if state is None:
                    state = self.init_state(batch)
                    if restored is not None:
                        state = state.replace(
                            params=jax.tree.map(jnp.asarray, restored["params"]),
                            batch_stats=jax.tree.map(
                                jnp.asarray, restored.get("batch_stats", {})
                            ),
                            step=jnp.asarray(restored.get("step", 0), jnp.int32),
                        )
                        if state.ema_params is not None:
                            # restore the EMA (or re-seed it from the restored
                            # params) — leaving the random-init copy would blend
                            # garbage into the EMA at the restored-step decay
                            ema = restored.get("ema_params") or restored["params"]
                            state = state.replace(
                                ema_params=jax.tree.map(jnp.asarray, ema)
                            )
                        if restored.get("opt_state") is not None:
                            from flax import serialization

                            state = state.replace(
                                opt_state=serialization.from_state_dict(
                                    state.opt_state, restored["opt_state"]
                                )
                            )
                        step = int(state.step)
                state, metrics = self.train_step(state, batch)
                step += 1
                if step % log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    print(
                        f"epoch {epoch} step {step}: total={m['total']:.3f} "
                        f"box={m['box']:.3f} cls={m['cls']:.3f} dfl={m['dfl']:.3f}"
                        + (f" seg={m['seg']:.3f}" if "seg" in m else "")
                    )
                if ckpt_dir and step % ckpt_every == 0:
                    self.save_checkpoint(state, ckpt_dir)
        if ckpt_dir and state is not None:
            self.save_checkpoint(state, ckpt_dir)
        return state

    # -- checkpointing (orbax) --------------------------------------------

    def save_checkpoint(self, state: TrainState, ckpt_dir: str):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{int(state.step)}"))
        ckptr = ocp.StandardCheckpointer()
        from flax import serialization

        payload = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "step": int(state.step),
            # SGD momentum buffers (+ schedule count) — resume must not reset
            "opt_state": jax.device_get(serialization.to_state_dict(state.opt_state)),
        }
        if state.ema_params is not None:
            payload["ema_params"] = jax.device_get(state.ema_params)
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        return path

    @staticmethod
    def load_checkpoint(path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path))
