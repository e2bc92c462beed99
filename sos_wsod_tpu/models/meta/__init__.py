from .rcnn import GeneralizedRCNN, TwoStagePseudoLabGeneralizedRCNN
from .rcnn_uwsod import MRRPUWSODRCNN, UWSODRCNN
from .rcnn_wsl import MultiInputRCNN
from .rcnn_wsl_single import GeneralizedRCNNWSL

__all__ = ["GeneralizedRCNN", "TwoStagePseudoLabGeneralizedRCNN",
           "MRRPUWSODRCNN", "UWSODRCNN", "MultiInputRCNN",
           "GeneralizedRCNNWSL"]
