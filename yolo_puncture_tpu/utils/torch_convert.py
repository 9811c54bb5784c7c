"""Torch-checkpoint → flax-pytree converters.

The reference loads four torch formats (SURVEY.md §5.4): ultralytics ``.pt``
(yolo_seg/app.py:45), raw ``state_dict`` ``.pth`` (unet_segment.py:40-44), timm
``.pth.tar`` (needle_clasify.py:45-56), and torch-hub ``.pth.tar`` with
head-stripping (van.py:277-288).  This module converts all of them into this
framework's NHWC flax variables.

Torch is CPU-only here and used purely as a file reader; all compute stays in JAX.
"""

from __future__ import annotations

import io
import pickle
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Loading torch files without the original class definitions
# ---------------------------------------------------------------------------

class _Stub:
    """Placeholder for unpicklable classes (e.g. ultralytics model wrappers)."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    def __call__(self, *a, **k):  # some reduces call the class
        return self


def _stub_class(module: str, name: str):
    return type(name, (_Stub,), {"__module__": module})


def load_torch_file(path: str):
    """torch.load with missing classes stubbed out."""
    import torch
    import torch.serialization

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        pass

    class StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return _stub_class(module, name)

    return torch.load(
        path,
        map_location="cpu",
        weights_only=False,
        pickle_module=type(
            "M", (), {"Unpickler": StubUnpickler, "load": pickle.load}
        ),
    )


def _walk_module_tree(obj, prefix: str, out: Dict[str, np.ndarray]):
    """Extract parameters/buffers from a (possibly stubbed) nn.Module pickle tree."""
    d = getattr(obj, "__dict__", None)
    if d is None:
        return
    for coll in ("_parameters", "_buffers"):
        for k, v in (d.get(coll) or {}).items():
            if v is not None and hasattr(v, "detach"):
                out[prefix + k] = v.detach().cpu().numpy()
    for k, v in (d.get("_modules") or {}).items():
        _walk_module_tree(v, f"{prefix}{k}.", out)


def extract_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Best-effort flat ``name → ndarray`` from any of the four torch formats."""
    obj = load_torch_file(path)

    def tensors_of(d):
        return {
            k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
            for k, v in d.items()
            if hasattr(v, "detach") or isinstance(v, np.ndarray)
        }

    if isinstance(obj, dict):
        for key in ("state_dict", "model_state_dict", "ema", "model"):
            if key in obj:
                inner = obj[key]
                if isinstance(inner, dict):
                    sd = tensors_of(inner)
                    if sd:
                        return sd
                elif hasattr(inner, "state_dict"):
                    try:
                        return tensors_of(inner.state_dict())
                    except Exception:
                        pass
                # stubbed module tree
                out: Dict[str, np.ndarray] = {}
                _walk_module_tree(inner, "", out)
                if out:
                    return out
        sd = tensors_of(obj)
        if sd:
            return sd
    out = {}
    _walk_module_tree(obj, "", out)
    if out:
        return out
    raise ValueError(f"could not extract a state dict from {path}")


# ---------------------------------------------------------------------------
# Tensor layout conversion
# ---------------------------------------------------------------------------

def convert_tensor(torch_key: str, arr: np.ndarray, target_shape) -> np.ndarray:
    """Transpose a torch tensor to the flax layout expected at the target leaf.

    The rank-specific transpose is attempted FIRST and a same-shape passthrough
    only as a last resort: for SQUARE Linear/Conv weights the torch and flax
    shapes coincide, and an early same-shape return would silently load W
    where W.T belongs (e.g. SAM's dim→dim attention projections)."""
    a = np.asarray(arr)
    ts = tuple(target_shape)
    if a.ndim == 4:
        if "upsample" in torch_key or "output_upscaling" in torch_key:
            # ConvTranspose2d (I, O, kh, kw) → flax (kh, kw, I, O), spatially
            # flipped (flax ConvTranspose cross-correlates the dilated input;
            # torch convolves — verified in test_conv_transpose_matches_torch)
            t = a.transpose(2, 3, 0, 1)[::-1, ::-1]
            if t.shape == ts:
                return np.ascontiguousarray(t)
        t = a.transpose(2, 3, 1, 0)  # Conv2d (O, I/g, kh, kw) → (kh, kw, I/g, O)
        if t.shape == ts:
            return t
    if a.ndim == 2:
        # torch nn.Embedding weight is already (num, dim) == flax Embed layout;
        # everything else 2-D is a Linear (O, I) needing the transpose
        is_embedding = "embed" in torch_key and "patch_embed" not in torch_key
        if not (is_embedding and a.shape == ts):
            t = a.T  # Linear (O, I) → (I, O)
            if t.shape == ts:
                return t
    if a.shape == ts:
        return a
    raise ValueError(
        f"{torch_key}: cannot convert shape {a.shape} → {ts}"
    )


# ---------------------------------------------------------------------------
# YOLO key mapping
# ---------------------------------------------------------------------------

_HEAD_NESTED = re.compile(r"(one2one_)?cv([234])\.(\d+)\.(\d+)\.(\d+)\.(conv|bn)\.")
_HEAD_FLAT = re.compile(r"(one2one_)?cv([234])\.(\d+)\.(\d+)\.(conv|bn)\.")
_HEAD_FINAL = re.compile(r"(one2one_)?cv([234])\.(\d+)\.(\d+)\.(weight|bias)$")
_CIB_SEQ = re.compile(r"cv1\.(\d+)\.")  # CIB Sequential (incl. nested RepVGGDW)
_M_IDX = re.compile(r"(?:^|(?<=\.))m\.(\d+)\.")
_FFN_IDX = re.compile(r"ffn\.(\d+)\.")
_MODEL_IDX = re.compile(r"^model\.(\d+)\.")


def map_yolo_key(key: str) -> Optional[Tuple[Tuple[str, ...], str]]:
    """Map an ultralytics state-dict key to (flax module path, leaf kind).

    leaf kinds: 'kernel' (conv/linear weight), 'bias', 'scale' (bn weight),
    'bn_bias', 'mean', 'var', None (skip, e.g. DFL fixed weights).
    """
    k = key
    if k.endswith("num_batches_tracked"):
        return None
    if ".dfl." in k:
        return None  # DFL is parameter-free here (fixed arange projection)
    k = _MODEL_IDX.sub(lambda m: f"model_{m.group(1)}.", k)
    k = _M_IDX.sub(lambda m: f"m_{m.group(1)}.", k)
    k = _HEAD_NESTED.sub(
        lambda m: f"{m.group(1) or ''}cv{m.group(2)}_{m.group(3)}.c{m.group(4)}_{m.group(5)}.{m.group(6)}.",
        k,
    )
    k = _HEAD_FLAT.sub(
        lambda m: f"{m.group(1) or ''}cv{m.group(2)}_{m.group(3)}.c{m.group(4)}.{m.group(5)}.",
        k,
    )
    k = _HEAD_FINAL.sub(
        lambda m: f"{m.group(1) or ''}cv{m.group(2)}_{m.group(3)}.c{m.group(4)}.{m.group(5)}",
        k,
    )
    k = _CIB_SEQ.sub(lambda m: f"cv1_{m.group(1)}.", k)
    k = _FFN_IDX.sub(lambda m: f"ffn_{m.group(1)}.", k)

    parts = k.split(".")
    leaf = parts[-1]
    path = parts[:-1]
    if len(path) >= 1 and path[-1] == "bn":
        kind = {
            "weight": "scale",
            "bias": "bn_bias",
            "running_mean": "mean",
            "running_var": "var",
        }.get(leaf)
        if kind is None:
            return None
        return tuple(path), kind
    if leaf == "weight":
        return tuple(path), "kernel"
    if leaf == "bias":
        return tuple(path), "bias"
    return None


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def convert_yolo_state_dict(
    sd: Dict[str, np.ndarray], template_variables, strict: bool = False
):
    """Fill a flax variables template from an ultralytics state dict.

    Returns (variables, report) where report lists unmatched torch keys and
    unfilled flax leaves.
    """
    import jax

    params_flat = _flatten(dict(template_variables["params"]))
    stats_flat = _flatten(dict(template_variables.get("batch_stats", {})))
    new_params = dict(params_flat)
    new_stats = dict(stats_flat)
    unmatched, filled = [], set()

    for tkey, arr in sd.items():
        mapped = map_yolo_key(tkey)
        if mapped is None:
            continue
        path, kind = mapped
        if kind in ("kernel", "bias", "scale", "bn_bias"):
            leaf = {"kernel": "kernel", "bias": "bias", "scale": "scale", "bn_bias": "bias"}[kind]
            target = path + (leaf,)
            store = new_params
            tmpl = params_flat
        else:
            target = path + (kind,)
            store = new_stats
            tmpl = stats_flat
        if target not in tmpl:
            unmatched.append(tkey)
            continue
        store[target] = convert_tensor(tkey, arr, tmpl[target].shape).astype(
            np.asarray(tmpl[target]).dtype
        )
        filled.add(("params" if store is new_params else "stats", target))

    unfilled = [p for p in params_flat if ("params", p) not in filled] + [
        p for p in stats_flat if ("stats", p) not in filled
    ]
    report = {"unmatched_torch_keys": unmatched, "unfilled_flax_leaves": unfilled}
    if strict and (unmatched or unfilled):
        raise ValueError(f"conversion mismatch: {report}")
    variables = {"params": _unflatten(new_params)}
    if stats_flat:
        variables["batch_stats"] = _unflatten(new_stats)
    return jax.tree.map(lambda x: x, variables), report


_SEQ_IDX = re.compile(r"\.(\d+)(?=\.)")


def convert_classifier_state_dict(
    sd: Dict[str, np.ndarray], template_variables, strict: bool = False
):
    """Generic converter for EfficientNet / VAN / U2Net style state dicts.

    Key transform: every '.{digit}.' path segment becomes '_{digit}.' (timm
    'blocks.0.1.conv_dw' → 'blocks_0_1.conv_dw'); leaves resolve capability-based
    against the flax template (kernel vs scale vs direct param name).
    """
    import jax

    params_flat = _flatten(dict(template_variables["params"]))
    stats_flat = _flatten(dict(template_variables.get("batch_stats", {})))
    new_params = dict(params_flat)
    new_stats = dict(stats_flat)
    unmatched, filled = [], set()

    for tkey, arr in sd.items():
        if tkey.endswith("num_batches_tracked"):
            continue
        k = _SEQ_IDX.sub(lambda m: f"_{m.group(1)}", tkey)
        parts = tuple(k.split("."))
        path, leaf = parts[:-1], parts[-1]

        candidates = []
        if leaf == "weight":
            candidates = [
                (new_params, params_flat, path + ("kernel",)),
                (new_params, params_flat, path + ("scale",)),   # BN/LayerNorm γ
            ]
        elif leaf == "bias":
            candidates = [(new_params, params_flat, path + ("bias",))]
        elif leaf == "running_mean":
            candidates = [(new_stats, stats_flat, path + ("mean",))]
        elif leaf == "running_var":
            candidates = [(new_stats, stats_flat, path + ("var",))]
        else:  # direct param (layer_scale_1, etc.)
            candidates = [(new_params, params_flat, path + (leaf,))]

        placed = False
        for store, tmpl, target in candidates:
            if target in tmpl:
                store[target] = convert_tensor(tkey, np.asarray(arr), tmpl[target].shape).astype(
                    np.asarray(tmpl[target]).dtype
                )
                filled.add((id(store), target))
                placed = True
                break
        if not placed:
            unmatched.append(tkey)

    unfilled = [p for p in params_flat if (id(new_params), p) not in filled] + [
        p for p in stats_flat if (id(new_stats), p) not in filled
    ]
    report = {"unmatched_torch_keys": unmatched, "unfilled_flax_leaves": unfilled}
    if strict and (unmatched or unfilled):
        raise ValueError(f"conversion mismatch: {report}")
    variables = {"params": _unflatten(new_params)}
    if stats_flat:
        variables["batch_stats"] = _unflatten(new_stats)
    return jax.tree.map(lambda x: x, variables), report


# ---------------------------------------------------------------------------
# SAM (segment-anything) key mapping
# ---------------------------------------------------------------------------

_SAM_RENAMES = [
    (re.compile(r"^image_encoder\.patch_embed\.proj\."), "image_encoder.patch_embed_proj."),
    (re.compile(r"^image_encoder\.blocks\.(\d+)\."), r"image_encoder.block_\1."),
    (re.compile(r"\.mlp\.lin1\."), ".mlp_lin1."),
    (re.compile(r"\.mlp\.lin2\."), ".mlp_lin2."),
    (re.compile(r"^image_encoder\.block_(\d+)\.mlp_lin1\."), r"image_encoder.block_\1.mlp_fc1."),
    (re.compile(r"^image_encoder\.block_(\d+)\.mlp_lin2\."), r"image_encoder.block_\1.mlp_fc2."),
    (re.compile(r"^image_encoder\.neck\.0\."), "image_encoder.neck_conv1."),
    (re.compile(r"^image_encoder\.neck\.1\."), "image_encoder.neck_ln1."),
    (re.compile(r"^image_encoder\.neck\.2\."), "image_encoder.neck_conv2."),
    (re.compile(r"^image_encoder\.neck\.3\."), "image_encoder.neck_ln2."),
    (re.compile(r"^prompt_encoder\.point_embeddings\.(\d)\."), r"prompt_encoder.point_embeddings_\1."),
    (re.compile(r"^prompt_encoder\.mask_downscaling\.0\."), "prompt_encoder.md_conv1."),
    (re.compile(r"^prompt_encoder\.mask_downscaling\.1\."), "prompt_encoder.md_ln1."),
    (re.compile(r"^prompt_encoder\.mask_downscaling\.3\."), "prompt_encoder.md_conv2."),
    (re.compile(r"^prompt_encoder\.mask_downscaling\.4\."), "prompt_encoder.md_ln2."),
    (re.compile(r"^prompt_encoder\.mask_downscaling\.6\."), "prompt_encoder.md_conv3."),
    (re.compile(r"^mask_decoder\.transformer\.layers\.(\d+)\."), r"mask_decoder.layers_\1."),
    (re.compile(r"^mask_decoder\.transformer\."), "mask_decoder."),
    (re.compile(r"^mask_decoder\.output_upscaling\.0\."), "mask_decoder.up1."),
    (re.compile(r"^mask_decoder\.output_upscaling\.1\."), "mask_decoder.up_ln."),
    (re.compile(r"^mask_decoder\.output_upscaling\.3\."), "mask_decoder.up2."),
    (re.compile(r"^mask_decoder\.output_hypernetworks_mlps\.(\d)\.layers\.(\d)\."),
     r"mask_decoder.hyper_\1.layers_\2."),
    (re.compile(r"^mask_decoder\.iou_prediction_head\.layers\.(\d)\."),
     r"mask_decoder.iou_head.layers_\1."),
    # iou/mask tokens are direct params on the flax side (no .weight scope)
    (re.compile(r"^mask_decoder\.iou_token\.weight$"), "mask_decoder.iou_token"),
    (re.compile(r"^mask_decoder\.mask_tokens\.weight$"), "mask_decoder.mask_tokens"),
]


def _sam_resize_pos_embed(arr: np.ndarray, target_shape) -> np.ndarray:
    """(1, g0, g0, C) → (1, g, g, C) bicubic grid interpolation (ViT convention)
    for loading 1024-trained checkpoints into smaller-geometry models."""
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.asarray(arr, np.float32)).permute(0, 3, 1, 2)
    t = F.interpolate(
        t, size=tuple(target_shape[1:3]), mode="bicubic", align_corners=False
    )
    return t.permute(0, 2, 3, 1).numpy()


def _sam_resize_rel_pos(arr: np.ndarray, target_len: int) -> np.ndarray:
    """(L0, hd) → (L, hd) linear interpolation — exactly segment-anything's
    get_rel_pos rescale (F.interpolate mode='linear')."""
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.asarray(arr, np.float32))
    t = F.interpolate(
        t.reshape(1, t.shape[0], -1).permute(0, 2, 1), size=target_len, mode="linear"
    )
    return t.reshape(-1, target_len).permute(1, 0).numpy()


def convert_sam_state_dict(
    sd: Dict[str, np.ndarray], template_variables, strict: bool = False
):
    """Real segment-anything ``sam_vit_*.pth`` state dict → flax SAM variables.

    Handles the full checkpoint: encoder (incl. decomposed rel-pos tables and
    pos_embed, interpolated when the flax model runs a smaller img_size),
    prompt encoder (point/mask embeddings, PE gaussian matrix), and the
    two-way-transformer mask decoder.  Reference loading site:
    /root/reference/yolo_seg/utils/segment_anything.py:79-80.
    """
    import jax

    params_flat = _flatten(dict(template_variables["params"]))
    new_params = dict(params_flat)
    unmatched, filled = [], set()

    for tkey, arr in sd.items():
        k = tkey
        for pat, repl in _SAM_RENAMES:
            k = pat.sub(repl, k)
        parts = tuple(k.split("."))
        leaf = parts[-1]
        path = parts[:-1]
        a = np.asarray(arr)

        candidates = []
        if leaf == "weight":
            candidates = [path + ("kernel",), path + ("scale",), path + ("weight",)]
        elif leaf == "bias":
            candidates = [path + ("bias",)]
        else:
            candidates = [parts]  # direct param (pos_embed, rel_pos_*, tokens, pe matrix)

        placed = False
        for target in candidates:
            if target not in params_flat:
                continue
            tshape = params_flat[target].shape
            if leaf == "pos_embed" and a.shape != tuple(tshape):
                a = _sam_resize_pos_embed(a, tshape)
            elif leaf in ("rel_pos_h", "rel_pos_w") and a.shape != tuple(tshape):
                a = _sam_resize_rel_pos(a, tshape[0])
            new_params[target] = convert_tensor(tkey, a, tshape).astype(
                np.asarray(params_flat[target]).dtype
            )
            filled.add(target)
            placed = True
            break
        if not placed:
            unmatched.append(tkey)

    unfilled = [p for p in params_flat if p not in filled]
    report = {"unmatched_torch_keys": unmatched, "unfilled_flax_leaves": unfilled}
    if strict and (unmatched or unfilled):
        raise ValueError(f"conversion mismatch: {report}")
    return (
        jax.tree.map(lambda x: x, {"params": _unflatten(new_params)}),
        report,
    )


_INV_HEAD_NESTED = re.compile(r"(one2one_)?cv([234])_(\d+)\.c(\d+)_(\d+)\.")
_INV_HEAD_FLAT = re.compile(r"(one2one_)?cv([234])_(\d+)\.c(\d+)\.")
_INV_CIB = re.compile(r"cv1_(\d+)\.")
_INV_M = re.compile(r"(?:^|(?<=\.))m_(\d+)\.")
_INV_FFN = re.compile(r"ffn_(\d+)\.")
_INV_MODEL = re.compile(r"^model_(\d+)\.")


def yolo_flax_path_to_torch_key(path, leaf: str) -> str:
    """Inverse of map_yolo_key: flax module path + leaf → ultralytics key name.

    Used to export checkpoints in torch naming and to verify full-coverage
    conversion (every flax leaf must round-trip).
    """
    k = ".".join(path) + "."
    k = _INV_MODEL.sub(lambda m: f"model.{m.group(1)}.", k)
    k = _INV_HEAD_NESTED.sub(
        lambda m: f"{m.group(1) or ''}cv{m.group(2)}.{m.group(3)}.{m.group(4)}.{m.group(5)}.",
        k,
    )
    k = _INV_HEAD_FLAT.sub(
        lambda m: f"{m.group(1) or ''}cv{m.group(2)}.{m.group(3)}.{m.group(4)}.", k
    )
    k = _INV_CIB.sub(lambda m: f"cv1.{m.group(1)}.", k)
    k = _INV_M.sub(lambda m: f"m.{m.group(1)}.", k)
    k = _INV_FFN.sub(lambda m: f"ffn.{m.group(1)}.", k)
    leaf_map = {
        "kernel": "weight",
        "scale": "weight",
        "bias": "bias",
        "mean": "running_mean",
        "var": "running_var",
    }
    return k + leaf_map[leaf]


def export_yolo_state_dict(variables) -> Dict[str, np.ndarray]:
    """Flax YOLO variables → torch-layout state dict with ultralytics naming."""
    out: Dict[str, np.ndarray] = {}
    for coll, tree in (("params", variables["params"]),
                       ("stats", variables.get("batch_stats", {}))):
        for path, arr in _flatten(dict(tree)).items():
            leaf = path[-1]
            tkey = yolo_flax_path_to_torch_key(path[:-1], leaf)
            a = np.asarray(arr)
            if leaf == "kernel" and a.ndim == 4:
                if path[-2] == "upsample":
                    a = np.ascontiguousarray(a[::-1, ::-1].transpose(2, 3, 0, 1))
                else:
                    a = a.transpose(3, 2, 0, 1)
            elif leaf == "kernel" and a.ndim == 2:
                a = a.T
            out[tkey] = a
    return out


def load_ultralytics_checkpoint(path: str, model, strict: bool = False):
    """End-to-end: torch .pt/.pth file → flax variables for ``model`` (YOLOModel)."""
    import jax
    import jax.numpy as jnp

    sd = extract_state_dict(path)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    variables, report = convert_yolo_state_dict(sd, template, strict=strict)
    n_bad = len(report["unmatched_torch_keys"]) + len(report["unfilled_flax_leaves"])
    if n_bad:
        import warnings

        warnings.warn(
            f"{path}: {len(report['unmatched_torch_keys'])} torch keys unmatched, "
            f"{len(report['unfilled_flax_leaves'])} flax leaves left at init"
        )
    return variables
