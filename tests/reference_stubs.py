"""Test-only stubs that make the UNMODIFIED reference PyTorch model at
/root/reference importable and runnable on CPU in this image.

Two things are missing here: the compiled CUDA extension
(`MultiScaleDeformableAttention`, reference ops/src/vision.cpp:13-16) and
torchvision (backbone.py:22-24, dino.py:22, util/misc.py:25). Both are
replaced with minimal, independently-written CPU implementations so parity
tests can run the real reference code end to end:

- ms_deform_attn_forward: bilinear sampling via F.grid_sample with
  align_corners=False / zeros padding — the exact semantics of the CUDA
  kernel (ms_deform_im2col_cuda.cuh:34-86) and of the reference's own
  pure-PyTorch oracle (ops/functions/ms_deform_attn_func.py:41-61).
- A torchvision stub with the canonical ResNet-50/101 (v1.5: stride on the
  3x3 conv), IntermediateLayerGetter, and a simple nms. Module/parameter
  naming matches torchvision so reference checkpoints load unchanged.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn.functional as F
from torch import nn

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------- MSDA ext

def _ms_deform_attn_forward(value, spatial_shapes, level_start_index,
                            sampling_locations, attention_weights,
                            im2col_step):
    """CPU equivalent of MSDA.ms_deform_attn_forward.

    value: [B, S, H, D]; spatial_shapes: [L, 2] (h, w) int64;
    sampling_locations: [B, Lq, H, L, P, 2] in [0, 1];
    attention_weights: [B, Lq, H, L, P]; returns [B, Lq, H*D].
    """
    B, S, H, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    out = value.new_zeros(B, Lq, H, D)
    start = 0
    for lvl in range(L):
        h, w = int(spatial_shapes[lvl, 0]), int(spatial_shapes[lvl, 1])
        v = (
            value[:, start : start + h * w]
            .permute(0, 2, 3, 1)
            .reshape(B * H, D, h, w)
        )
        grid = sampling_locations[:, :, :, lvl] * 2 - 1  # [B,Lq,H,P,2]
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * H, Lq, P, 2)
        samp = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros",
            align_corners=False,
        )  # [B*H, D, Lq, P]
        wts = (
            attention_weights[:, :, :, lvl]
            .permute(0, 2, 1, 3)
            .reshape(B * H, 1, Lq, P)
        )
        out += (
            (samp * wts).sum(-1).reshape(B, H, D, Lq).permute(0, 3, 1, 2)
        )
        start += h * w
    return out.reshape(B, Lq, H * D)


def _make_msda_module():
    m = types.ModuleType("MultiScaleDeformableAttention")
    m.ms_deform_attn_forward = _ms_deform_attn_forward

    def _backward(*a, **k):
        raise NotImplementedError("CPU stub: forward-only")

    m.ms_deform_attn_backward = _backward
    return m


# ------------------------------------------------------------- torchvision

class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilation=1, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = norm_layer(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = norm_layer(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = norm_layer(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    def __init__(self, layers, norm_layer=None,
                 replace_stride_with_dilation=None, num_classes=1000):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self._norm_layer = norm_layer
        if replace_stride_with_dilation is None:
            replace_stride_with_dilation = [False, False, False]
        self.inplanes = 64
        self.dilation = 1
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2,
                                       dilate=replace_stride_with_dilation[0])
        self.layer3 = self._make_layer(256, layers[2], stride=2,
                                       dilate=replace_stride_with_dilation[1])
        self.layer4 = self._make_layer(512, layers[3], stride=2,
                                       dilate=replace_stride_with_dilation[2])
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512 * 4, num_classes)

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        norm_layer = self._norm_layer
        prev_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                norm_layer(planes * 4),
            )
        blocks_list = [
            _Bottleneck(self.inplanes, planes, stride, downsample,
                        prev_dilation, norm_layer)
        ]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            blocks_list.append(
                _Bottleneck(self.inplanes, planes, dilation=self.dilation,
                            norm_layer=norm_layer)
            )
        return nn.Sequential(*blocks_list)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


class _IntermediateLayerGetter(nn.ModuleDict):
    """Runs top-level children in order, returning the requested ones."""

    def __init__(self, model, return_layers):
        orig = dict(return_layers)
        layers = {}
        remaining = dict(return_layers)
        for name, module in model.named_children():
            layers[name] = module
            if name in remaining:
                del remaining[name]
            if not remaining:
                break
        if remaining:
            raise ValueError(f"layers not found: {list(remaining)}")
        super().__init__(layers)
        self.return_layers = orig

    def forward(self, x):
        out = {}
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


def _nms(boxes, scores, iou_threshold):
    order = scores.argsort(descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0].item()
        keep.append(i)
        if order.numel() == 1:
            break
        rest = order[1:]
        xx1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a_r = (boxes[rest, 2] - boxes[rest, 0]) * (
            boxes[rest, 3] - boxes[rest, 1]
        )
        iou = inter / (a_i + a_r - inter)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.int64)


def _batched_nms(boxes, scores, idxs, iou_threshold):
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.int64)
    offset = boxes.max() + 1
    shifted = boxes + (idxs[:, None].to(boxes) * offset)
    return _nms(shifted, scores, iou_threshold)


def _make_torchvision():
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.15.0"
    tv._is_tracing = lambda: False

    models = types.ModuleType("torchvision.models")

    def resnet50(norm_layer=None, replace_stride_with_dilation=None,
                 pretrained=False, **kw):
        return _ResNet([3, 4, 6, 3], norm_layer,
                       replace_stride_with_dilation)

    def resnet101(norm_layer=None, replace_stride_with_dilation=None,
                  pretrained=False, **kw):
        return _ResNet([3, 4, 23, 3], norm_layer,
                       replace_stride_with_dilation)

    models.resnet50 = resnet50
    models.resnet101 = resnet101

    mutils = types.ModuleType("torchvision.models._utils")
    mutils.IntermediateLayerGetter = _IntermediateLayerGetter
    models._utils = mutils

    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    boxes_mod.box_area = box_area
    ops.box_area = box_area
    boxes_mod.nms = _nms
    boxes_mod.batched_nms = _batched_nms
    ops.boxes = boxes_mod
    ops.nms = _nms
    ops.batched_nms = _batched_nms
    misc_mod = types.ModuleType("torchvision.ops.misc")
    misc_mod.interpolate = F.interpolate
    ops.misc = misc_mod

    tv.models = models
    tv.ops = ops
    tv.transforms = _make_tv_transforms()
    tv.transforms.functional = tv.transforms._functional
    datasets_mod = types.ModuleType("torchvision.datasets")

    class _CocoDetection:  # only subclassed (DAcoco.py:365); never built here
        def __init__(self, *a, **k):
            raise NotImplementedError("stub: no dataset IO in parity tests")

    datasets_mod.CocoDetection = _CocoDetection
    tv.datasets = datasets_mod
    return {
        "torchvision": tv,
        "torchvision.models": models,
        "torchvision.models._utils": mutils,
        "torchvision.ops": ops,
        "torchvision.ops.boxes": boxes_mod,
        "torchvision.ops.misc": misc_mod,
        "torchvision.transforms": tv.transforms,
        "torchvision.transforms.functional": tv.transforms._functional,
        "torchvision.datasets": datasets_mod,
    }


def _make_tv_transforms():
    """torchvision.transforms stub with the EXACT PIL-backend semantics of
    the real library (which, for PIL inputs, delegates to PIL itself:
    Image.resize(BILINEAR), Image.crop, Image.transpose, ImageEnhance,
    HSV-roundtrip hue). Written independently from the torchvision source
    behavior so da_transforms.py/DAcoco.py run live on top.

    Random draws go through the module attribute `_random` (defaults to the
    stdlib random module; uniform-equivalent to torchvision's torch RNG) so
    parity tests can script every draw from a shared tape."""
    import random as _random_mod

    import numpy as np
    from PIL import Image, ImageEnhance, ImageOps

    tvt = types.ModuleType("torchvision.transforms")
    tvt._random = _random_mod

    fn = types.ModuleType("torchvision.transforms.functional")

    def _crop(img, top, left, height, width):
        return img.crop((left, top, left + width, top + height))

    def _hflip(img):
        return img.transpose(Image.FLIP_LEFT_RIGHT)

    def _resize(img, size, **kw):
        # da_transforms always passes an (h, w) sequence (resize():108-117)
        if isinstance(size, int):
            w, h = img.size
            if w < h:
                size = (int(size * h / w), size)
            else:
                size = (size, int(size * w / h))
        oh, ow = size
        return img.resize((ow, oh), Image.BILINEAR)

    def _pad(img, padding, fill=0):
        left, top, right, bottom = padding
        return ImageOps.expand(img, (left, top, right, bottom), fill)

    def _to_tensor(img):
        arr = np.asarray(img, np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.copy()).permute(2, 0, 1)
        return t.float().div(255.0)

    def _normalize(tensor, mean, std, inplace=False):
        mean = torch.as_tensor(mean, dtype=tensor.dtype)
        std = torch.as_tensor(std, dtype=tensor.dtype)
        return (tensor - mean[:, None, None]) / std[:, None, None]

    def _adjust_brightness(img, f):
        return ImageEnhance.Brightness(img).enhance(f)

    def _adjust_contrast(img, f):
        return ImageEnhance.Contrast(img).enhance(f)

    def _adjust_saturation(img, f):
        return ImageEnhance.Color(img).enhance(f)

    def _adjust_hue(img, hue_factor):
        # torchvision PIL path: HSV roundtrip, uint8 wraparound on H
        if img.mode in ("L", "1", "I", "F"):
            return img
        h, s, v = img.convert("HSV").split()
        np_h = np.asarray(h, np.uint8).copy()
        np_h += np.uint8(int(hue_factor * 255) % 256)
        h = Image.fromarray(np_h, "L")
        return Image.merge("HSV", (h, s, v)).convert(img.mode)

    def _to_grayscale(img, num_output_channels=1):
        g = img.convert("L")
        return g.convert("RGB") if num_output_channels == 3 else g

    fn.crop = _crop
    fn.hflip = _hflip
    fn.resize = _resize
    fn.pad = _pad
    fn.to_tensor = _to_tensor
    fn.normalize = _normalize
    fn.adjust_brightness = _adjust_brightness
    fn.adjust_contrast = _adjust_contrast
    fn.adjust_saturation = _adjust_saturation
    fn.adjust_hue = _adjust_hue
    fn.to_grayscale = _to_grayscale
    fn.rgb_to_grayscale = _to_grayscale
    tvt._functional = fn

    class Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, img):
            for t in self.transforms:
                img = t(img)
            return img

    class RandomApply:
        def __init__(self, transforms, p=0.5):
            self.transforms = transforms
            self.p = p

        def __call__(self, img):
            if tvt._random.random() < self.p:
                for t in self.transforms:
                    img = t(img)
            return img

    class RandomGrayscale:
        def __init__(self, p=0.1):
            self.p = p

        def __call__(self, img):
            if tvt._random.random() < self.p:
                return _to_grayscale(img, num_output_channels=3)
            return img

    class ColorJitter:
        """torchvision draw order: application permutation first, then the
        factors in fixed (brightness, contrast, saturation, hue) order,
        each drawn only when its parameter is active."""

        def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
            self.brightness = brightness
            self.contrast = contrast
            self.saturation = saturation
            self.hue = hue

        def __call__(self, img):
            order = [0, 1, 2, 3]
            tvt._random.shuffle(order)
            b = (tvt._random.uniform(max(0, 1 - self.brightness),
                                     1 + self.brightness)
                 if self.brightness > 0 else None)
            c = (tvt._random.uniform(max(0, 1 - self.contrast),
                                     1 + self.contrast)
                 if self.contrast > 0 else None)
            s = (tvt._random.uniform(max(0, 1 - self.saturation),
                                     1 + self.saturation)
                 if self.saturation > 0 else None)
            h = (tvt._random.uniform(-self.hue, self.hue)
                 if self.hue > 0 else None)
            for i in order:
                if i == 0 and b is not None:
                    img = _adjust_brightness(img, b)
                elif i == 1 and c is not None:
                    img = _adjust_contrast(img, c)
                elif i == 2 and s is not None:
                    img = _adjust_saturation(img, s)
                elif i == 3 and h is not None:
                    img = _adjust_hue(img, h)
            return img

    class RandomCrop:
        def __init__(self, size):
            self.size = size

        @staticmethod
        def get_params(img, output_size):
            w, h = img.size
            th, tw = output_size
            if h < th or w < tw:
                raise ValueError("crop larger than input")
            if w == tw and h == th:
                return 0, 0, h, w
            i = tvt._random.randint(0, h - th)
            j = tvt._random.randint(0, w - tw)
            return i, j, th, tw

        def __call__(self, img):
            i, j, th, tw = self.get_params(img, self.size)
            return _crop(img, i, j, th, tw)

    class RandomErasing:
        def __init__(self, *a, **k):
            raise NotImplementedError("stub: unused by the DA pipelines")

    tvt.Compose = Compose
    tvt.RandomApply = RandomApply
    tvt.RandomGrayscale = RandomGrayscale
    tvt.ColorJitter = ColorJitter
    tvt.RandomCrop = RandomCrop
    tvt.RandomErasing = RandomErasing
    return tvt


def _make_timm():
    timm = types.ModuleType("timm")
    tm = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x / keep * mask.floor_()

    layers.DropPath = DropPath
    layers.trunc_normal_ = nn.init.trunc_normal_

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    layers.to_2tuple = to_2tuple
    timm.models = tm
    tm.layers = layers
    return {"timm": timm, "timm.models": tm, "timm.models.layers": layers}


_installed = False


def _patch_to_cpu():
    """Map .to('cuda'...) onto CPU: the reference criterion hardcodes
    .to('cuda') in its zero-DN branches (dino.py:813-818,864-869) and
    dn_components uses .to('cuda') for index tensors (:94,104,113)."""
    orig_to = torch.Tensor.to

    def _is_cuda(d):
        return isinstance(d, (str, torch.device)) and str(d).startswith(
            "cuda"
        )

    def to(self, *args, **kwargs):
        args = tuple("cpu" if _is_cuda(a) else a for a in args)
        if _is_cuda(kwargs.get("device")):
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = to


def install():
    """Install stubs + reference root on sys.path. Idempotent."""
    global _installed
    if _installed:
        return
    sys.modules.setdefault(
        "MultiScaleDeformableAttention", _make_msda_module()
    )
    for name, mod in _make_torchvision().items():
        sys.modules.setdefault(name, mod)
    for name, mod in _make_timm().items():
        sys.modules.setdefault(name, mod)
    # synthetic 'datasets' package: lets parity tests import the reference's
    # datasets/da_transforms.py and DAcoco.py LIVE without executing
    # datasets/__init__.py (which eagerly builds every dataset module and
    # needs pycocotools at import time)
    ds_pkg = types.ModuleType("datasets")
    ds_pkg.__path__ = [REFERENCE_ROOT + "/datasets"]
    sys.modules.setdefault("datasets", ds_pkg)
    # minimal import-time stubs for DAcoco's module-level deps; the stubbed
    # functions are never exercised by the transform parity tests
    pyco_mask = types.ModuleType("pycocotools.mask")

    def _no_coco(*a, **k):
        raise NotImplementedError("pycocotools stub: not used in tests")

    pyco_mask.frPyObjects = _no_coco
    pyco_mask.decode = _no_coco
    pyco = types.ModuleType("pycocotools")
    pyco.mask = pyco_mask
    sys.modules.setdefault("pycocotools", pyco)
    sys.modules.setdefault("pycocotools.mask", pyco_mask)
    addict = types.ModuleType("addict")

    class _AddictDict(dict):  # attribute-style dict (util/slconfig.py:13)
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    addict.Dict = _AddictDict
    sys.modules.setdefault("addict", addict)
    yapf = types.ModuleType("yapf")
    yapf_lib = types.ModuleType("yapf.yapflib")
    yapf_api = types.ModuleType("yapf.yapflib.yapf_api")
    yapf_api.FormatCode = lambda s, style_config=None: (s, True)
    yapf.yapflib = yapf_lib
    yapf_lib.yapf_api = yapf_api
    sys.modules.setdefault("yapf", yapf)
    sys.modules.setdefault("yapf.yapflib", yapf_lib)
    sys.modules.setdefault("yapf.yapflib.yapf_api", yapf_api)
    # the reference hardcodes .cuda() in a few ctors (dino.py:106); make it
    # a no-op so the unmodified code runs on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self
    _patch_to_cpu()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    _installed = True


def make_msda_differentiable():
    """Replace the reference's MSDeformAttnFunction (whose stub backward
    raises) with a plain call into the grid_sample forward, so torch
    autograd differentiates the WHOLE reference model — enables loss/grad
    parity tests (the CUDA backward col2im this stands in for is
    ms_deform_im2col_cuda.cuh:238-300). Call after install() + first
    reference import."""
    install()
    import models.dino.ops.functions.ms_deform_attn_func as func_mod
    import models.dino.ops.modules.ms_deform_attn as mod_mod

    class _DifferentiableMSDA:
        @staticmethod
        def apply(value, shapes, start_index, loc, weights, step):
            return _ms_deform_attn_forward(
                value, shapes, start_index, loc, weights, step
            )

    func_mod.MSDeformAttnFunction = _DifferentiableMSDA
    mod_mod.MSDeformAttnFunction = _DifferentiableMSDA
