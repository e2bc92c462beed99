from .mrrp import MRRPVGG16, MRRPConv
from .resnet import ResNet, build_resnet
from .resnet_ws import DeformBottleneckBlock, WSResNet, build_ws_resnet
from .vgg import VGG16

__all__ = ["MRRPVGG16", "MRRPConv", "ResNet", "build_resnet",
           "DeformBottleneckBlock", "WSResNet", "build_ws_resnet", "VGG16"]
