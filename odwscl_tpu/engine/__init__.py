from .trainer import TrainState, create_train_state, make_train_step, do_train
from .inference import Inferencer, inference, TTAConfig
from .postprocess import per_class_nms_keep, assemble_detections

__all__ = ["TrainState", "create_train_state", "make_train_step", "do_train",
           "Inferencer", "inference", "TTAConfig", "per_class_nms_keep",
           "assemble_detections"]
