from .standard import StandardROIHeads, FastRCNNOutputLayers  # noqa: F401
