"""Minimal torch ResNet matching torchvision's structure and state_dict keys.

Test fixture for the ImageNet-converter parity harness: builds a
randomly initialized ResNet whose ``state_dict()`` has exactly the
torchvision key layout that ``models/pretrained.convert_torch_resnet``
consumes, plus a forward that returns the 6-level feature pyramid so the
converted Flax encoder can be diffed NUMERICALLY layer by layer (the
reference always trains from ``encoder_weights='imagenet'``,
reference src/test_system.py:90-95).

Only the pieces the encoder needs are modeled (no fc/avgpool).
"""

import torch
import torch.nn as tnn


def _conv3x3(cin, cout, stride=1):
    return tnn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)


def _conv1x1(cin, cout, stride=1):
    return tnn.Conv2d(cin, cout, 1, stride=stride, bias=False)


class TorchBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = _conv3x3(cin, planes, stride)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = _conv3x3(planes, planes)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample
        self.relu = tnn.ReLU()

    def forward(self, x):
        identity = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(y + identity)


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = _conv1x1(cin, planes)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = _conv3x3(planes, planes, stride)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = _conv1x1(planes, planes * 4)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample
        self.relu = tnn.ReLU()

    def forward(self, x):
        identity = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(y + identity)


_SPECS = {
    "resnet18": (TorchBasicBlock, (2, 2, 2, 2)),
    "resnet34": (TorchBasicBlock, (3, 4, 6, 3)),
    "resnet50": (TorchBottleneck, (3, 4, 6, 3)),
}


class TorchResNetEncoder(tnn.Module):
    """torchvision-keyed ResNet trunk returning the smp feature pyramid."""

    def __init__(self, name: str):
        super().__init__()
        block, layers = _SPECS[name]
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for i, (planes, n) in enumerate(zip((64, 128, 256, 512), layers)):
            stride = 1 if i == 0 else 2
            blocks = []
            for b in range(n):
                s = stride if b == 0 else 1
                down = None
                if s != 1 or cin != planes * block.expansion:
                    down = tnn.Sequential(
                        _conv1x1(cin, planes * block.expansion, s),
                        tnn.BatchNorm2d(planes * block.expansion))
                blocks.append(block(cin, planes, s, down))
                cin = planes * block.expansion
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))

    @torch.no_grad()
    def forward(self, x):
        feats = [x]
        y = self.relu(self.bn1(self.conv1(x)))
        feats.append(y)
        y = self.maxpool(y)
        for i in range(1, 5):
            y = getattr(self, f"layer{i}")(y)
            feats.append(y)
        return feats


def random_torch_encoder(name: str, seed: int = 0) -> TorchResNetEncoder:
    """Randomly initialized (incl. non-trivial BN stats) eval-mode trunk."""
    torch.manual_seed(seed)
    m = TorchResNetEncoder(name)
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)
            mod.weight.data.uniform_(0.5, 1.5)
            mod.bias.data.normal_(0, 0.5)
    m.eval()
    return m
