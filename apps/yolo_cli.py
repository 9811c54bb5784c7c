#!/usr/bin/env python
"""`yolo`-style train / val / predict / export CLI.

Replaces the reference's delegated ultralytics console scripts
(docs/quickstart.md:48-64, pyproject.toml:27-29 of the reference):

    python apps/yolo_cli.py train data=datasets/needle model=yolo10s-seg epochs=100 imgsz=640
    python apps/yolo_cli.py val   data=datasets/needle model=ckpt_dir_or_name
    python apps/yolo_cli.py predict model=yolo10s-seg source=img.jpg conf=0.35
    python apps/yolo_cli.py export model=yolo10s-seg format=msgpack

Multi-chip: train shards the batch over all local devices ('data' axis); the
reference's `device=0,…,7` flag maps to the mesh size automatically.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_kv(args):
    out = {}
    for a in args:
        if "=" not in a:
            raise SystemExit(f"expected key=value, got '{a}'")
        k, v = a.split("=", 1)
        out[k] = v
    return out


def cmd_train(kv):
    import jax

    from yolo_puncture_tpu import create_model
    from yolo_puncture_tpu.parallel.mesh import make_mesh
    from yolo_puncture_tpu.train import Trainer
    from yolo_puncture_tpu.train.data import SegDataset

    data = kv.get("data", "datasets/needle")
    model_name = kv.get("model", "yolo10s-seg").replace(".pt", "")
    epochs = int(kv.get("epochs", 100))
    imgsz = int(kv.get("imgsz", 640))
    batch = int(kv.get("batch", 16))
    nc = int(kv.get("nc", 1))
    ckpt = kv.get("project", "runs/train")

    model = create_model(model_name, nc=nc)
    aug = {
        k: float(kv[k])
        for k in ("mosaic", "scale", "translate", "fliplr", "hsv_h", "hsv_s", "hsv_v")
        if k in kv
    }
    ds = SegDataset(
        data, split="train", imgsz=imgsz,
        augment=kv.get("augment", "true").lower() != "false", **aug,
    )
    steps_per_epoch = max(1, len(ds) // batch)
    # data-parallel over the largest device count that divides the batch
    n_dev = len(jax.devices())
    dp = max(d for d in range(1, n_dev + 1) if batch % d == 0 and d <= n_dev)
    mesh = make_mesh((dp, 1), devices=jax.devices()[:dp]) if dp > 1 else None
    trainer = Trainer(
        model, nc=nc, imgsz=imgsz,
        lr0=float(kv.get("lr0", 0.01)),
        total_steps=epochs * steps_per_epoch,
        warmup_steps=min(3 * steps_per_epoch, 1000),
        mesh=mesh,
        clip_norm=float(kv.get("clip", 0.0)),
    )
    state = trainer.fit(
        ds, epochs=epochs, batch_size=batch, ckpt_dir=ckpt,
        close_mosaic=int(kv.get("close_mosaic", 10)),
        ckpt_every=int(kv.get("ckpt_every", 1000)),
        resume=kv.get("resume"),
    )
    print(f"training done: {int(state.step)} steps; checkpoints in {ckpt}")
    return state


def cmd_val(kv):
    import numpy as np

    from yolo_puncture_tpu.predict import YOLO
    from yolo_puncture_tpu.train.data import SegDataset
    from yolo_puncture_tpu.train.metrics import compute_map

    data = kv.get("data", "datasets/needle")
    model_path = kv.get("model", "yolo10s-seg")
    imgsz = int(kv.get("imgsz", 640))
    conf = float(kv.get("conf", 0.001))
    nc = int(kv.get("nc", 1))

    if os.path.isdir(model_path):
        # orbax checkpoint dir from `yolo_cli train` (runs/*/step_N): build the
        # architecture from arch= (the dir name carries no model name) and
        # restore the trained params — EMA weights when present (ultralytics
        # vals the EMA)
        from yolo_puncture_tpu.train import Trainer

        det = YOLO(kv.get("arch", "yolo10s-seg"), nc=nc)
        restored = Trainer.load_checkpoint(model_path)
        # use_ema=true vals the EMA weights (ultralytics default) — but on
        # SHORT runs a high-decay EMA is still near its init; raw params are
        # the honest choice below a few thousand steps
        use_ema = kv.get("use_ema", "false").lower() == "true"
        params = (restored.get("ema_params") if use_ema else None) or restored["params"]
        det.variables = {
            "params": params,
            "batch_stats": restored.get("batch_stats", {}),
        }
    else:
        det = YOLO(model_path, nc=nc)
    ds = SegDataset(data, split="val", imgsz=imgsz, augment=False)
    preds, gts = [], []
    for i in range(len(ds)):
        item = ds.load(i)
        img_u8 = (item["images"][..., ::-1] * 255).astype(np.uint8)  # back to BGR
        r = det.predict(source=img_u8, conf=conf, imgsz=imgsz, retina_masks=True)[0]
        pred = {
            "boxes": r.boxes.xyxy, "scores": r.boxes.conf, "classes": r.boxes.cls,
        }
        if r.masks is not None:
            pred["masks"] = r.masks.data
        preds.append(pred)
        m = item["mask_gt"]
        gt = {
            "boxes": item["gt_bboxes"][m],
            "classes": item["gt_labels"][m].astype(np.float32),
        }
        import cv2

        gt["masks"] = np.stack(
            [
                cv2.resize(g, (imgsz, imgsz), interpolation=cv2.INTER_NEAREST)
                for g in item["gt_masks"][m]
            ]
        ) if m.any() else np.zeros((0, imgsz, imgsz))
        gts.append(gt)
    box_m = compute_map(preds, gts, use_masks=False)
    print(f"box  mAP50={box_m['map50']:.3f} mAP50-95={box_m['map50_95']:.3f}")
    if all("masks" in p for p in preds):
        mask_m = compute_map(preds, gts, use_masks=True)
        print(f"mask mAP50={mask_m['map50']:.3f} mAP50-95={mask_m['map50_95']:.3f}")
    return box_m


def cmd_calibrate(kv):
    """Fit Platt confidence calibration on the val split; write
    calibration.json into the checkpoint dir (predictor.load_calibration).

    Reported conf becomes ≈ P(detection is a TP | raw score), so the
    reference's fixed operating points — conf=0.9 in the UI
    (yolo_seg/app.py:244) and 0.35 in the batch CLI
    (dev_tools/auto_speed_calc.py:152) — sit at sane raw thresholds for a
    from-scratch checkpoint whose confidence scale differs from the
    reference's COCO-pretrained fine-tune.

        python apps/yolo_cli.py calibrate data=... model=runs/x/step_N [use_ema=true]
    """
    import json

    import numpy as np

    from yolo_puncture_tpu.predict import YOLO
    from yolo_puncture_tpu.train import Trainer
    from yolo_puncture_tpu.train.data import SegDataset

    data = kv.get("data", "datasets/needle")
    model_path = kv["model"]
    imgsz = int(kv.get("imgsz", 640))
    nc = int(kv.get("nc", 1))
    det = YOLO(kv.get("arch", "yolo10s-seg"), nc=nc)
    restored = Trainer.load_checkpoint(model_path)
    use_ema = kv.get("use_ema", "true").lower() == "true"
    params = (restored.get("ema_params") if use_ema else None) or restored["params"]
    det.variables = {"params": params, "batch_stats": restored.get("batch_stats", {})}

    def box_iou(b, g):
        ix = max(0.0, min(b[2], g[2]) - max(b[0], g[0]))
        iy = max(0.0, min(b[3], g[3]) - max(b[1], g[1]))
        inter = ix * iy
        ua = ((b[2] - b[0]) * (b[3] - b[1]) + (g[2] - g[0]) * (g[3] - g[1]) - inter)
        return inter / ua if ua > 0 else 0.0

    ds = SegDataset(data, split="val", imgsz=imgsz, augment=False)
    scores, labels, per_img = [], [], []
    for i in range(len(ds)):
        item = ds.load(i)
        img_u8 = (item["images"][..., ::-1] * 255).astype(np.uint8)
        r = det.predict(source=img_u8, conf=float(kv.get("min_conf", 0.001)),
                        imgsz=imgsz, retina_masks=False)[0]
        gts = item["gt_bboxes"][item["mask_gt"]]
        conf = np.asarray(r.boxes.conf)
        xyxy = np.asarray(r.boxes.xyxy)
        taken = np.zeros(len(gts), bool)
        tp_flags = np.zeros(len(conf), bool)
        for j in np.argsort(-conf):
            best, bi = 0.0, -1
            for g in range(len(gts)):
                if not taken[g]:
                    v = box_iou(xyxy[j], gts[g])
                    if v > best:
                        best, bi = v, g
            tp = best >= 0.5
            if tp:
                taken[bi] = True
                tp_flags[j] = True
            scores.append(float(conf[j]))
            labels.append(1.0 if tp else 0.0)
        per_img.append((conf, xyxy, tp_flags))

    def dup_rate(raw_thr):
        """Fraction of images with a duplicate — an above-threshold FP box
        overlapping (IoU>0.5) an above-threshold TP box (the v10 o2o head's
        from-scratch artifact, docs/bench_matrix_r4.md)."""
        n_dup = 0
        for conf, xyxy, tp_flags in per_img:
            keep = conf >= raw_thr
            tps = np.where(keep & tp_flags)[0]
            fps = np.where(keep & ~tp_flags)[0]
            if any(box_iou(xyxy[f], xyxy[t]) > 0.5 for f in fps for t in tps):
                n_dup += 1
        return n_dup / max(len(per_img), 1)

    s = np.clip(np.asarray(scores), 1e-6, 1 - 1e-6)
    y = np.asarray(labels)
    x = np.log(s / (1 - s))
    # 1-D logistic fit by Newton (Platt scaling); prior-corrected targets as in
    # Platt 1999 to regularize the tails
    n1, n0 = y.sum(), len(y) - y.sum()
    t = np.where(y > 0.5, (n1 + 1) / (n1 + 2), 1 / (n0 + 2))
    a, b = 1.0, 0.0
    for _ in range(50):
        p = 1 / (1 + np.exp(-(a * x + b)))
        g = np.array([((p - t) * x).sum(), (p - t).sum()])
        w = p * (1 - p)
        H = np.array([[(w * x * x).sum() + 1e-6, (w * x).sum()],
                      [(w * x).sum(), w.sum() + 1e-6]])
        da, db = np.linalg.solve(H, g)
        a, b = a - da, b - db
        if max(abs(da), abs(db)) < 1e-9:
            break
    a, b = float(a), float(b)

    raw_at = {u: round(det._calib_to_raw(u, (a, b)), 4)
              for u in (0.9, 0.5, 0.35, 0.25)}
    dups = {"raw0.25": round(dup_rate(0.25), 4),
            "raw0.5": round(dup_rate(0.5), 4),
            "cal0.9": round(dup_rate(raw_at[0.9]), 4),
            "cal0.35": round(dup_rate(raw_at[0.35]), 4)}
    out = {"a": a, "b": b, "n_det": len(scores), "n_images": len(ds),
           "n_tp": int(y.sum()), "raw_threshold_at_user_conf": raw_at,
           "duplicate_rate": dups}
    path = os.path.join(model_path, "calibration.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"calibration a={a:.4f} b={b:.4f} over {len(scores)} detections "
          f"({int(y.sum())} TP) → {path}")
    print(f"raw thresholds at user conf: {raw_at}")
    print(f"duplicate rate: {dups}")
    return out


def cmd_predict(kv):
    from yolo_puncture_tpu.predict import YOLO

    det = YOLO(kv.get("model", "yolo10s-seg"), nc=int(kv.get("nc", 1)))
    results = det.predict(
        source=kv["source"],
        conf=float(kv.get("conf", 0.25)),
        imgsz=int(kv.get("imgsz", 640)),
        retina_masks=kv.get("retina_masks", "true").lower() == "true",
    )
    for r in results:
        print(f"{r.path or '<array>'}: {len(r.boxes)} instances")
        for i in range(len(r.boxes)):
            print(f"  cls={int(r.boxes.cls[i])} conf={r.boxes.conf[i]:.3f} "
                  f"xyxy={r.boxes.xyxy[i].round(1).tolist()}")
    return results


def cmd_export(kv):
    """Export: msgpack / orbax params, torch-named state dict, or a serving
    GRAPH: serialized StableHLO (jax.export — the TPU analog of the
    reference's onnx/engine export; graph + weights, reloadable without model
    code), TF SavedModel (TF-Serving), or TFLite (edge) via jax2tf."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from yolo_puncture_tpu.predict import YOLO

    det = YOLO(kv.get("model", "yolo10s-seg"), nc=int(kv.get("nc", 1)))
    fmt = kv.get("format", "msgpack")
    out = kv.get("output", f"export_{os.path.basename(det.weights_path)}.{fmt}")
    if fmt == "msgpack":
        with open(out, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(det.variables)))
    elif fmt == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(out), jax.device_get(det.variables), force=True)
        ckptr.wait_until_finished()
    elif fmt == "torch":
        # torch-named state dict (round-trips through utils/torch_convert)
        import pickle

        from yolo_puncture_tpu.utils.torch_convert import export_yolo_state_dict

        sd = export_yolo_state_dict(jax.device_get(det.variables))
        with open(out, "wb") as f:
            pickle.dump(sd, f)
    elif fmt in ("stablehlo", "saved_model", "tflite"):
        imgsz = int(kv.get("imgsz", 640))
        variables = det.variables

        def serve(frames_u8):
            from yolo_puncture_tpu.ops.letterbox import letterbox
            from yolo_puncture_tpu.ops.nms import select_detections

            imgs, r, pad = letterbox(frames_u8, imgsz, dtype=det.model.dtype, bgr_to_rgb=True)
            o = det.model.apply(variables, imgs)
            d = select_detections(
                o, nms_free=det.version == "v10", conf_thres=0.25, max_det=det.max_det
            )
            return d["boxes"], d["scores"], d["classes"]

        B = int(kv.get("batch", 1))
        if fmt == "stablehlo":
            exported = jax.export.export(jax.jit(serve))(
                jax.ShapeDtypeStruct((B, imgsz, imgsz, 3), jnp.uint8)
            )
            with open(out, "wb") as f:
                f.write(exported.serialize())
        else:
            # deployment analog of the reference's `yolo export format=onnx|engine`
            # (README.md:138-163): SavedModel for TF-Serving, TFLite for edge
            import tensorflow as tf
            from jax.experimental import jax2tf

            if fmt == "tflite" and det.version != "v10":
                # the TFLite converter cannot legalize the mhlo.reduce inside
                # batched NMS (v8/v11 postprocess); the NMS-free v10 graph
                # converts and runs end-to-end under the TFLite interpreter
                raise SystemExit(
                    "format=tflite requires an NMS-free v10 model (the v8/v11 "
                    "NMS reduction does not legalize to TFLite); use a yolo10* "
                    "model or format=saved_model"
                )
            tf_fn = tf.function(
                jax2tf.convert(serve, with_gradient=False),
                input_signature=[
                    tf.TensorSpec((B, imgsz, imgsz, 3), tf.uint8, name="frames")
                ],
                autograph=False,
            )
            if fmt == "saved_model":
                module = tf.Module()
                module.serve = tf_fn
                tf.saved_model.save(module, out, signatures=module.serve)
            else:
                converter = tf.lite.TFLiteConverter.from_concrete_functions(
                    [tf_fn.get_concrete_function()]
                )
                # XLA-lowered graphs use ops outside the TFLite builtin set
                converter.target_spec.supported_ops = [
                    tf.lite.OpsSet.TFLITE_BUILTINS,
                    tf.lite.OpsSet.SELECT_TF_OPS,
                ]
                blob = converter.convert()
                with open(out, "wb") as f:
                    f.write(blob)
    else:
        raise SystemExit(
            f"unknown format {fmt} (msgpack|orbax|torch|stablehlo|saved_model|tflite)"
        )
    print(f"exported to {out}")
    return out


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return
    cmd, kv = argv[0], parse_kv(argv[1:])
    return {"train": cmd_train, "val": cmd_val, "predict": cmd_predict,
            "calibrate": cmd_calibrate, "export": cmd_export}[cmd](kv)


if __name__ == "__main__":
    main()
