"""Import the REFERENCE implementation (/root/reference) as a test oracle.

The strongest parity evidence available in this environment: rather than
comparing against a re-implementation written by the same author, tests run
the reference's own PyTorch modules (transformer, position encoding, COTR
model, RefinementTask, SparseEngine) head-to-head against the cotr_tpu
framework with identical weights.

The reference depends on three packages absent here; this module installs
minimal stand-ins into ``sys.modules`` BEFORE adding /root/reference to the
path:

* ``torchvision`` — version string, ``_is_tracing``,
  ``transforms.functional.{to_tensor,normalize}``,
  ``models.resnet50`` (a torchvision-faithful ResNet-50 graph: same module
  names/shapes as torchvision 0.8, randomly initialized — ``pretrained=True``
  weights are not downloadable here, and parity tests only need *identical*
  weights on both sides, not the ImageNet ones), and
  ``models._utils.IntermediateLayerGetter``.
* ``tables`` — imported at capture.py module scope, used only for HDF5 depth
  reads which these tests never hit.

Nothing from the reference tree is copied; it is imported read-only.
"""

from __future__ import annotations

import sys
import types
from collections import OrderedDict

import numpy as np
import torch
from torch import nn

REFERENCE_ROOT = "/root/reference"


# --------------------------------------------------------------------------
# torchvision-faithful ResNet-50 (module names and shapes match torchvision
# 0.8's resnet50 so that IntermediateLayerGetter and the reference
# checkpoint key layout line up exactly)
# --------------------------------------------------------------------------
class _TVBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 norm_layer=nn.BatchNorm2d):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = norm_layer(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = norm_layer(planes)
        self.conv3 = nn.Conv2d(planes, planes * self.expansion, 1, bias=False)
        self.bn3 = norm_layer(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


class _TVResNet(nn.Module):
    def __init__(self, layers=(3, 4, 6, 3), norm_layer=nn.BatchNorm2d,
                 num_classes=1000):
        super().__init__()
        self._norm_layer = norm_layer
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * _TVBottleneck.expansion, num_classes)

    def _make_layer(self, planes, blocks, stride):
        norm_layer = self._norm_layer
        downsample = None
        out_ch = planes * _TVBottleneck.expansion
        if stride != 1 or self.inplanes != out_ch:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, out_ch, 1, stride=stride, bias=False),
                norm_layer(out_ch))
        layers = [_TVBottleneck(self.inplanes, planes, stride, downsample,
                                norm_layer)]
        self.inplanes = out_ch
        for _ in range(1, blocks):
            layers.append(_TVBottleneck(self.inplanes, planes,
                                        norm_layer=norm_layer))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


def _resnet50(pretrained=False, replace_stride_with_dilation=None,
              norm_layer=None, **kw):
    assert not any(replace_stride_with_dilation or []), \
        "dilation unsupported in the test stub (reference default: off)"
    torch.manual_seed(0)  # deterministic "pretrained" stand-in weights
    return _TVResNet(norm_layer=norm_layer or nn.BatchNorm2d)


class _IntermediateLayerGetter(nn.ModuleDict):
    """Faithful reimplementation of torchvision.models._utils.
    IntermediateLayerGetter (truncate after the last requested child,
    return an OrderedDict of the requested activations)."""

    def __init__(self, model, return_layers):
        orig = dict(return_layers)
        layers = OrderedDict()
        remaining = dict(return_layers)
        for name, module in model.named_children():
            layers[name] = module
            if name in remaining:
                del remaining[name]
            if not remaining:
                break
        assert not remaining, f"layers not found: {remaining}"
        super().__init__(layers)
        self.return_layers = orig

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


# --------------------------------------------------------------------------
# torchvision.transforms.functional subset
# --------------------------------------------------------------------------
def _to_tensor(pic):
    arr = np.asarray(pic)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
    if arr.dtype == np.uint8:
        t = t.float().div(255.0)
    return t


def _normalize(tensor, mean, std, inplace=False):
    if not inplace:
        tensor = tensor.clone()
    mean = torch.as_tensor(mean, dtype=tensor.dtype)
    std = torch.as_tensor(std, dtype=tensor.dtype)
    return tensor.sub_(mean[:, None, None]).div_(std[:, None, None])


def install_stubs():
    # the reference targets numpy<1.24 and uses the removed np.int/np.bool
    # aliases (sparse_engine.py:79,171); restore them for its benefit
    for alias, real in (("int", int), ("bool", bool), ("float", float)):
        if not hasattr(np, alias):
            setattr(np, alias, real)
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.8.2"
    tv._is_tracing = lambda: False

    models = types.ModuleType("torchvision.models")
    models.resnet50 = _resnet50
    mutils = types.ModuleType("torchvision.models._utils")
    mutils.IntermediateLayerGetter = _IntermediateLayerGetter
    models._utils = mutils

    transforms = types.ModuleType("torchvision.transforms")
    tvtf = types.ModuleType("torchvision.transforms.functional")
    tvtf.to_tensor = _to_tensor
    tvtf.normalize = _normalize
    transforms.functional = tvtf

    ops = types.ModuleType("torchvision.ops")
    ops_misc = types.ModuleType("torchvision.ops.misc")
    ops.misc = ops_misc

    tv.models = models
    tv.transforms = transforms
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models._utils"] = mutils
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = tvtf
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.misc"] = ops_misc

    if "tables" not in sys.modules:
        tables = types.ModuleType("tables")

        def _no_tables(*a, **k):
            raise RuntimeError("tables stub: HDF5 depth IO not available")

        tables.open_file = _no_tables
        sys.modules["tables"] = tables


def load_reference():
    """Install stubs, put /root/reference on sys.path, and return the COTR
    reference package namespace (imported lazily by attribute)."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import COTR  # noqa: F401
    return COTR


def build_reference_model(enc_layers=6, dec_layers=6, hidden_dim=256,
                          nheads=8, dim_feedforward=1024, dropout=0.0,
                          seed=0):
    """Build the reference COTR model via its own build() with the same
    argparse surface train_cotr.py produces (options.py:41-51)."""
    load_reference()
    from COTR.models.cotr_model import build

    args = types.SimpleNamespace(
        backbone="resnet50", hidden_dim=hidden_dim, nheads=nheads,
        enc_layers=enc_layers, dec_layers=dec_layers, dropout=dropout,
        dilation=False, layer="layer3", dim_feedforward=dim_feedforward,
        position_embedding="lin_sine", lr_backbone=0.0)
    torch.manual_seed(seed)
    model = build(args)
    model.eval()
    return model
