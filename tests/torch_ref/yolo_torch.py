"""Independent torch (NCHW, eager) implementation of the YOLO v8/v10/v11 family
with **ultralytics state-dict key naming**.

Purpose (VERDICT.md round-1 item 2): real ultralytics cannot be installed in
this environment (no egress), so this module serves as the independent torch
twin — written from the published ultralytics module semantics, NOT from the
flax code — that (a) emits state dicts with the exact ultralytics key layout
(``model.0.conv.weight``, ``model.22.cv2.0.0.conv.weight``,
``model.23.one2one_cv3.0.0.0.conv.weight``, ...), and (b) computes a full
reference forward so `convert_yolo_state_dict` + the flax `YOLOModel` can be
parity-tested end to end.  Any wiring/key/padding deviation between the flax
model and ultralytics semantics shows up as a forward mismatch here.

Reference behavior contract: SURVEY.md §2.2 "YOLOv10 architecture" /
"YOLO segmentation head" rows; usage sites /root/reference/yolo_seg/app.py:91,
/root/reference/dev_tools/auto_speed_calc.py:62-63.

Only torch.nn primitives are used; no code is shared with yolo_puncture_tpu
except the architecture spec tables (whose correctness is separately pinned by
published param counts in tests/test_models_yolo.py).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F


def autopad(k, p=None, d=1):
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, d=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, autopad(k, p, d), groups=g, dilation=d, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU() if act is True else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class DWConv(Conv):
    def __init__(self, c1, c2, k=1, s=1, d=1, act=True):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), d=d, act=act)


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, k[0], 1)
        self.cv2 = Conv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            Bottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=1.0) for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class C3(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=(1, 3)):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(
            *(Bottleneck(c_, c_, shortcut, g, k=k, e=1.0) for _ in range(n))
        )

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class C3k(C3):
    """C3 with configurable kernel (YOLO11)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__(c1, c2, n, shortcut, g, e, k=(k, k))


class C3k2(C2f):
    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__(c1, c2, n, shortcut, g, e)
        self.m = nn.ModuleList(
            C3k(self.c, self.c, 2, shortcut, g) if c3k
            else Bottleneck(self.c, self.c, shortcut, g)
            for _ in range(n)
        )


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class SCDown(nn.Module):
    def __init__(self, c1, c2, k, s):
        super().__init__()
        self.cv1 = Conv(c1, c2, 1, 1)
        self.cv2 = Conv(c2, c2, k=k, s=s, g=c2, act=False)

    def forward(self, x):
        return self.cv2(self.cv1(x))


class RepVGGDW(nn.Module):
    def __init__(self, ed):
        super().__init__()
        self.conv = Conv(ed, ed, 7, 1, 3, g=ed, act=False)
        self.conv1 = Conv(ed, ed, 3, 1, 1, g=ed, act=False)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.conv(x) + self.conv1(x) + x)


class CIB(nn.Module):
    def __init__(self, c1, c2, shortcut=True, e=0.5, lk=False):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = nn.Sequential(
            Conv(c1, c1, 3, g=c1),
            Conv(c1, 2 * c_, 1),
            RepVGGDW(2 * c_) if lk else Conv(2 * c_, 2 * c_, 3, g=2 * c_),
            Conv(2 * c_, c2, 1),
            Conv(c2, c2, 3, g=c2),
        )
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv1(x)
        return x + y if self.add else y


class C2fCIB(C2f):
    def __init__(self, c1, c2, n=1, shortcut=False, lk=False, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        self.m = nn.ModuleList(
            CIB(self.c, self.c, shortcut, e=1.0, lk=lk) for _ in range(n)
        )


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim ** -0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.qkv = Conv(dim, h, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(B, self.num_heads, self.key_dim * 2 + self.head_dim, N).split(
            [self.key_dim, self.key_dim, self.head_dim], dim=2
        )
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + self.pe(
            v.reshape(B, C, H, W)
        )
        return self.proj(x)


class PSA(nn.Module):
    def __init__(self, c1, c2, e=0.5):
        super().__init__()
        assert c1 == c2
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.attn = Attention(self.c, attn_ratio=0.5, num_heads=max(1, self.c // 64))
        self.ffn = nn.Sequential(
            Conv(self.c, self.c * 2, 1), Conv(self.c * 2, self.c, 1, act=False)
        )

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = b + self.attn(b)
        b = b + self.ffn(b)
        return self.cv2(torch.cat((a, b), 1))


class PSABlock(nn.Module):
    def __init__(self, c, attn_ratio=0.5, num_heads=4, shortcut=True):
        super().__init__()
        self.attn = Attention(c, attn_ratio=attn_ratio, num_heads=num_heads)
        self.ffn = nn.Sequential(Conv(c, c * 2, 1), Conv(c * 2, c, 1, act=False))
        self.add = shortcut

    def forward(self, x):
        x = x + self.attn(x) if self.add else self.attn(x)
        x = x + self.ffn(x) if self.add else self.ffn(x)
        return x


class C2PSA(nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        assert c1 == c2
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.m = nn.Sequential(
            *(PSABlock(self.c, attn_ratio=0.5, num_heads=max(1, self.c // 64))
              for _ in range(n))
        )

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = self.m(b)
        return self.cv2(torch.cat((a, b), 1))


class Proto(nn.Module):
    def __init__(self, c1, c_=256, c2=32):
        super().__init__()
        self.cv1 = Conv(c1, c_, k=3)
        self.upsample = nn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = Conv(c_, c_, k=3)
        self.cv3 = Conv(c_, c2)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class DFL(nn.Module):
    """Fixed arange projection (parameter present in real checkpoints, skipped
    by the converter)."""

    def __init__(self, c1=16):
        super().__init__()
        self.conv = nn.Conv2d(c1, 1, 1, bias=False).requires_grad_(False)
        self.conv.weight.data[:] = torch.arange(c1, dtype=torch.float).view(1, c1, 1, 1)
        self.c1 = c1

    def forward(self, x):
        b, _, a = x.shape
        return self.conv(
            x.view(b, 4, self.c1, a).transpose(2, 1).softmax(1)
        ).view(b, 4, a)


def make_anchors(feats, strides, grid_cell_offset=0.5):
    anchor_points, stride_tensor = [], []
    for f, stride in zip(feats, strides):
        h, w = f.shape[-2:]
        sx = torch.arange(end=w, dtype=torch.float32) + grid_cell_offset
        sy = torch.arange(end=h, dtype=torch.float32) + grid_cell_offset
        sy, sx = torch.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(torch.stack((sx, sy), -1).view(-1, 2))
        stride_tensor.append(torch.full((h * w, 1), float(stride)))
    return torch.cat(anchor_points), torch.cat(stride_tensor)


def dist2bbox(distance, anchor_points, xywh=False, dim=-1):
    lt, rb = distance.chunk(2, dim)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return torch.cat(((x1y1 + x2y2) / 2, x2y2 - x1y1), dim)
    return torch.cat((x1y1, x2y2), dim)


def _box_branch(cin, c2, reg_max):
    return nn.Sequential(Conv(cin, c2, 3), Conv(c2, c2, 3), nn.Conv2d(c2, 4 * reg_max, 1))


def _cls_branch_legacy(cin, c3, nc):
    return nn.Sequential(Conv(cin, c3, 3), Conv(c3, c3, 3), nn.Conv2d(c3, nc, 1))


def _cls_branch_dw(cin, c3, nc):
    return nn.Sequential(
        nn.Sequential(DWConv(cin, cin, 3), Conv(cin, c3, 1)),
        nn.Sequential(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
        nn.Conv2d(c3, nc, 1),
    )


class Detect(nn.Module):
    """v8 ('legacy') / v11 ('dw') / v10 ('dw' + one2one) detect head."""

    def __init__(self, nc, ch, cls_style="legacy", one2one=False):
        super().__init__()
        self.nc = nc
        self.reg_max = 16
        self.stride = (8, 16, 32)
        self.one2one = one2one
        c2 = max(16, ch[0] // 4, self.reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        mk_cls = _cls_branch_legacy if cls_style == "legacy" else _cls_branch_dw
        self.cv2 = nn.ModuleList(_box_branch(x, c2, self.reg_max) for x in ch)
        self.cv3 = nn.ModuleList(mk_cls(x, c3, nc) for x in ch)
        if one2one:
            self.one2one_cv2 = nn.ModuleList(_box_branch(x, c2, self.reg_max) for x in ch)
            self.one2one_cv3 = nn.ModuleList(mk_cls(x, c3, nc) for x in ch)
        self.dfl = DFL(self.reg_max)

    def _decode(self, raw):
        """raw: per-level (B, 4*reg_max + nc, H, W) → (boxes xyxy px, sigmoid probs)."""
        anchors, strides = make_anchors(raw, self.stride)
        B = raw[0].shape[0]
        flat = torch.cat([r.view(B, r.shape[1], -1) for r in raw], 2)
        box, cls = flat.split((self.reg_max * 4, self.nc), 1)
        dbox = dist2bbox(self.dfl(box), anchors.transpose(0, 1).unsqueeze(0), xywh=False, dim=1)
        dbox = dbox * strides.transpose(0, 1)
        return dbox.transpose(1, 2), cls.sigmoid().transpose(1, 2)

    def forward(self, feats):
        cv2, cv3 = (
            (self.one2one_cv2, self.one2one_cv3) if self.one2one else (self.cv2, self.cv3)
        )
        raw = [torch.cat((cv2[i](f), cv3[i](f)), 1) for i, f in enumerate(feats)]
        boxes, probs = self._decode(raw)
        return {"boxes": boxes, "probs": probs}


class Segment(Detect):
    def __init__(self, nc, ch, nm=32, npr=256, cls_style="legacy", one2one=False):
        super().__init__(nc, ch, cls_style=cls_style, one2one=one2one)
        self.nm = nm
        self.proto = Proto(ch[0], npr, nm)
        c4 = max(ch[0] // 4, nm)
        self.cv4 = nn.ModuleList(
            nn.Sequential(Conv(x, c4, 3), Conv(c4, c4, 3), nn.Conv2d(c4, nm, 1))
            for x in ch
        )

    def forward(self, feats):
        out = super().forward(feats)
        B = feats[0].shape[0]
        out["proto"] = self.proto(feats[0])  # (B, nm, H/4, W/4)
        out["coeffs"] = torch.cat(
            [self.cv4[i](f).view(B, self.nm, -1) for i, f in enumerate(feats)], 2
        ).transpose(1, 2)
        return out


# ---------------------------------------------------------------------------
# Spec-driven builder (same yaml-derived graph tables as the flax model; all
# module arithmetic above is independent)
# ---------------------------------------------------------------------------

def make_divisible(x, divisor=8):
    return max(divisor, int(x + divisor / 2) // divisor * divisor)


class YOLOTorch(nn.Module):
    """``model`` is a ModuleList indexed like ultralytics DetectionModel.model,
    so state_dict keys are ``model.{i}.{...}`` — the real checkpoint layout."""

    def __init__(self, version="v8", scale="n", nc=80, task="segment"):
        super().__init__()
        from yolo_puncture_tpu.models.yolo import SCALES, V8_SPEC, V11_SPEC, _v10_spec

        depth, width, max_ch = SCALES[version][scale]
        if version == "v8":
            spec = V8_SPEC
        elif version == "v10":
            spec = _v10_spec(scale)
        else:
            spec = V11_SPEC
        self.spec = spec
        self.version = version

        def scale_ch(c):
            return make_divisible(min(c, max_ch) * width, 8)

        from yolo_puncture_tpu.models.yolo import _V11_FORCE_C3K

        layers = []
        ch: List[int] = [3]
        for i, (frm, n, block, args) in enumerate(spec):
            n_scaled = max(round(n * depth), 1) if n > 1 else n
            cins = [ch[j + 1 if j >= 0 else j] for j in (frm if isinstance(frm, tuple) else (frm,))]
            c1 = cins[0]
            if block == "Conv":
                c, k, s = args
                c2 = scale_ch(c)
                m = Conv(c1, c2, k, s)
            elif block == "C2f":
                c2 = scale_ch(args[0])
                m = C2f(c1, c2, n_scaled, shortcut=args[1])
            elif block == "C2fCIB":
                c2 = scale_ch(args[0])
                lk = args[2] if len(args) > 2 else False
                m = C2fCIB(c1, c2, n_scaled, shortcut=args[1], lk=lk)
            elif block == "C3k2":
                c2 = scale_ch(args[0])
                c3k = args[1] or scale in _V11_FORCE_C3K
                e = args[2] if len(args) > 2 else 0.5
                m = C3k2(c1, c2, n_scaled, c3k=c3k, e=e)
            elif block == "SPPF":
                c2 = scale_ch(args[0])
                m = SPPF(c1, c2, args[1])
            elif block == "SCDown":
                c2 = scale_ch(args[0])
                m = SCDown(c1, c2, args[1], args[2])
            elif block == "PSA":
                c2 = scale_ch(args[0])
                m = PSA(c1, c2)
            elif block == "C2PSA":
                c2 = scale_ch(args[0])
                m = C2PSA(c1, c2, n_scaled)
            elif block == "Upsample":
                c2 = c1
                m = nn.Upsample(scale_factor=2, mode="nearest")
            elif block == "Concat":
                c2 = sum(cins)
                m = nn.Identity()
            elif block == "HEAD":
                one2one = version == "v10"
                cls_style = "legacy" if version == "v8" else "dw"
                if task == "segment":
                    m = Segment(nc, cins, nm=32, npr=scale_ch(256),
                                cls_style=cls_style, one2one=one2one)
                else:
                    m = Detect(nc, cins, cls_style=cls_style, one2one=one2one)
                c2 = 0
            else:
                raise ValueError(block)
            layers.append(m)
            ch.append(c2)
        self.model = nn.ModuleList(layers)

    def forward(self, x):
        saved = {}
        needed = set()
        for frm, _, _, _ in self.spec:
            if isinstance(frm, tuple):
                needed.update(i for i in frm if i != -1)
        out = None
        for i, (frm, n, block, args) in enumerate(self.spec):
            if isinstance(frm, tuple):
                inputs = [x if j == -1 else saved[j] for j in frm]
            else:
                inputs = [x if frm == -1 else saved[frm]]
            if block == "Concat":
                x = torch.cat(inputs, 1)
            elif block == "HEAD":
                out = self.model[i](inputs)
            else:
                x = self.model[i](inputs[0])
            if i in needed:
                saved[i] = x
        return out


@torch.no_grad()
def randomize(model: nn.Module, seed: int = 0):
    """Random weights AND random BN running stats (catches mean/var mapping bugs).

    DFL's fixed arange projection is restored afterwards."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d)):
            m.weight.data = torch.randn(m.weight.shape, generator=g) * 0.05
            if m.bias is not None:
                m.bias.data = torch.randn(m.bias.shape, generator=g) * 0.05
        elif isinstance(m, nn.BatchNorm2d):
            m.weight.data = 1.0 + torch.randn(m.weight.shape, generator=g) * 0.1
            m.bias.data = torch.randn(m.bias.shape, generator=g) * 0.1
            m.running_mean.data = torch.randn(m.running_mean.shape, generator=g) * 0.2
            m.running_var.data = (1.0 + torch.randn(m.running_var.shape, generator=g) * 0.2).abs()
        elif isinstance(m, DFL):
            pass
    for m in model.modules():
        if isinstance(m, DFL):
            m.conv.weight.data[:] = torch.arange(
                m.c1, dtype=torch.float
            ).view(1, m.c1, 1, 1)
    model.eval()
    return model
