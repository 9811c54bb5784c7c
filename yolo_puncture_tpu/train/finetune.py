"""Fine-tune loops for the auxiliary model families.

The reference ships pre-trained weights for its EfficientNet insertion classifier
(timm .pth.tar) and its U²-Net refiner (u2netp_finetune_70.pth) — trained outside
the repo.  These loops close that gap natively:

  * ``ClassifierFinetuner`` — softmax CE on 380² box crops, the dataset layout
    produced by tools/dataset_gen.py ('cls x y w h' normalized xywh labels).
  * ``UNetFinetuner`` — the standard U²-Net objective: sum of BCE over all seven
    side outputs vs a binary mask (images + PNG masks, e.g. from
    tools/annotation.polygons_to_png).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def recalibrate_batch_stats(model, params, stats_template, batches, **apply_kwargs):
    """Exact BN running-stat recomputation: returns batch_stats equal to the
    (weighted) mean of each BatchNorm's true batch statistics over ``batches``.

    Short finetunes leave high-momentum running averages (0.9–0.99 here, as in
    timm/torch) far from the finetuned activation distribution, so eval-mode
    forward passes see stale normalization even though train-mode loss is low.
    This recovers each layer's per-batch statistics WITHOUT per-model momentum
    knobs: flax BatchNorm in train mode normalizes by batch statistics and only
    *writes* running stats via new = m·old + (1−m)·batch, so two train-mode
    passes with old = 0 and old = 1 see identical activations and the pair of
    updates solves for m and batch exactly (m = new₁ − new₀, batch = new₀/(1−m)).

    batches: iterable of preprocessed input arrays (leading dim = batch).
    apply_kwargs forwarded to model.apply (e.g. train=True is added here).
    """
    zeros = jax.tree.map(jnp.zeros_like, stats_template)
    ones = jax.tree.map(jnp.ones_like, stats_template)

    @jax.jit
    def _solve(params, x):
        _, u0 = model.apply(
            {"params": params, "batch_stats": zeros}, x,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)}, **apply_kwargs,
        )
        _, u1 = model.apply(
            {"params": params, "batch_stats": ones}, x,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)}, **apply_kwargs,
        )
        def leaf(n0, n1):
            m = jnp.clip(n1 - n0, 0.0, 0.9999)  # momentum, recovered per-layer
            return n0 / (1.0 - m)
        return jax.tree.map(leaf, u0["batch_stats"], u1["batch_stats"])

    acc = None
    total = 0
    for x in batches:
        b = _solve(params, x)
        w = x.shape[0]
        b = jax.tree.map(lambda a: np.asarray(a, np.float64) * w, b)
        acc = b if acc is None else jax.tree.map(np.add, acc, b)
        total += w
    if acc is None:
        return stats_template
    return jax.tree.map(
        lambda a, old: jnp.asarray(a / total, old.dtype), acc, stats_template
    )


# ---------------------------------------------------------------------------
# Classifier
# ---------------------------------------------------------------------------

def load_cls_bbox_dataset(root: str, split: str = "train") -> List[Tuple[str, int, Tuple]]:
    """(image_path, cls, xywhn) from the dataset_gen layout."""
    img_dir = os.path.join(root, "images", split)
    lbl_dir = os.path.join(root, "labels", split)
    items = []
    for f in sorted(os.listdir(img_dir)):
        if not f.lower().endswith((".jpg", ".png", ".jpeg")):
            continue
        lbl = os.path.join(lbl_dir, os.path.splitext(f)[0] + ".txt")
        if not os.path.exists(lbl):
            continue
        vals = open(lbl).read().split()
        if len(vals) < 5:
            continue
        cls = int(float(vals[0]))
        xywhn = tuple(map(float, vals[1:5]))
        items.append((os.path.join(img_dir, f), cls, xywhn))
    return items


class ClassifierFinetuner:
    def __init__(self, net, lr: float = 1e-4, seed: int = 0):
        """net: tasks.classify.ClassifierNet."""
        self.net = net
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(net.variables["params"])
        self.rng = np.random.default_rng(seed)

        model = net.model
        input_size = net.input_size

        from yolo_puncture_tpu.models.efficientnet import preprocess_classifier

        def loss_fn(params, batch_stats, images_u8, labels, dropout_rng):
            variables = {"params": params, "batch_stats": batch_stats}
            x = preprocess_classifier(images_u8, input_size, model.dtype)
            logits, updates = model.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            ).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return ce, (acc, updates["batch_stats"])

        @jax.jit
        def step(params, batch_stats, opt_state, images_u8, labels, step_idx):
            # fresh dropout mask each step (a fixed key would drop the SAME
            # units all training, under-training them and defeating dropout)
            dropout_rng = jax.random.fold_in(jax.random.PRNGKey(seed), step_idx)
            (loss, (acc, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, images_u8, labels, dropout_rng)
            updates, opt_state = self.tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss, acc

        self._step = step

    def fit_arrays(self, crops_u8: np.ndarray, labels: np.ndarray,
                   epochs: int = 1, batch_size: int = 16, log_every: int = 20):
        params = self.net.variables["params"]
        stats = self.net.variables.get("batch_stats", {})
        n = len(crops_u8)
        it = 0
        loss = acc = None
        for _ in range(epochs):
            order = self.rng.permutation(n)
            for i in range(0, n - batch_size + 1, batch_size):
                idx = order[i : i + batch_size]
                params, stats, self.opt_state, loss, acc = self._step(
                    params, stats, self.opt_state,
                    jnp.asarray(crops_u8[idx]), jnp.asarray(labels[idx]),
                    jnp.asarray(it, jnp.int32),
                )
                it += 1
                if log_every and it % log_every == 0:
                    print(f"cls step {it}: loss {float(loss):.4f} acc {float(acc):.3f}")
        if stats:
            from yolo_puncture_tpu.models.efficientnet import preprocess_classifier

            model, size = self.net.model, self.net.input_size
            stats = recalibrate_batch_stats(
                model, params, stats,
                (
                    preprocess_classifier(
                        jnp.asarray(crops_u8[i : i + batch_size]), size, model.dtype
                    )
                    for i in range(0, n - batch_size + 1, batch_size)
                ),
            )
        self.net.variables = {"params": params, "batch_stats": stats}
        return (float(loss) if loss is not None else None,
                float(acc) if acc is not None else None)

    @staticmethod
    def crops_from_dataset(root: str, split: str, crop_size: int) -> Tuple[np.ndarray, np.ndarray]:
        import cv2

        from yolo_puncture_tpu.utils.transform import crop_frame

        items = load_cls_bbox_dataset(root, split)
        crops, labels = [], []
        for path, cls, (x, y, w, h) in items:
            img = cv2.imread(path)[..., ::-1]  # RGB
            H, W = img.shape[:2]
            xyxy = ((x - w / 2) * W, (y - h / 2) * H, (x + w / 2) * W, (y + h / 2) * H)
            crop, _ = crop_frame(img, xyxy, crop_size, need_padding=True)
            canvas = np.zeros((crop_size, crop_size, 3), np.uint8)
            canvas[: crop.shape[0], : crop.shape[1]] = crop[:crop_size, :crop_size]
            crops.append(canvas)
            labels.append(cls)
        return np.stack(crops), np.asarray(labels, np.int32)


# ---------------------------------------------------------------------------
# U²-Net
# ---------------------------------------------------------------------------

class UNetFinetuner:
    def __init__(self, predictor, lr: float = 1e-4, seed: int = 0):
        """predictor: tasks.unet.UNetPredictor."""
        self.predictor = predictor
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(predictor.variables["params"])
        self.rng = np.random.default_rng(seed)
        model = predictor.model

        def loss_fn(params, batch_stats, images, masks):
            variables = {"params": params, "batch_stats": batch_stats}
            outs, updates = model.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            # standard U²-Net: sum of BCE over d0..d6 (outputs are sigmoids)
            total = 0.0
            for d in outs:
                p = jnp.clip(d[..., 0].astype(jnp.float32), 1e-6, 1 - 1e-6)
                total = total + (
                    -(masks * jnp.log(p) + (1 - masks) * jnp.log(1 - p))
                ).mean()
            return total, updates["batch_stats"]

        @jax.jit
        def step(params, batch_stats, opt_state, images, masks):
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, images, masks
            )
            updates, opt_state = self.tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        self._step = step

    def fit_arrays(self, images_rgb01: np.ndarray, masks01: np.ndarray,
                   epochs: int = 1, batch_size: int = 4, log_every: int = 20):
        params = self.predictor.variables["params"]
        stats = self.predictor.variables.get("batch_stats", {})
        n = len(images_rgb01)
        it = 0
        loss = None
        for _ in range(epochs):
            order = self.rng.permutation(n)
            for i in range(0, n - batch_size + 1, batch_size):
                idx = order[i : i + batch_size]
                params, stats, self.opt_state, loss = self._step(
                    params, stats, self.opt_state,
                    jnp.asarray(images_rgb01[idx]), jnp.asarray(masks01[idx]),
                )
                it += 1
                if log_every and it % log_every == 0:
                    print(f"u2net step {it}: loss {float(loss):.4f}")
        if stats:
            stats = recalibrate_batch_stats(
                self.predictor.model, params, stats,
                (
                    jnp.asarray(images_rgb01[i : i + batch_size])
                    for i in range(0, n - batch_size + 1, batch_size)
                ),
            )
        self.predictor.variables = {"params": params, "batch_stats": stats}
        return float(loss) if loss is not None else None
