from .logging_utils import setup_logger, SmoothedValue, MetricLogger, JsonlLogger
from .miscellaneous import seed_all_rng, mkdir, save_config, save_labels, Timer
from .checkpoint import Checkpointer

__all__ = ["setup_logger", "SmoothedValue", "MetricLogger", "JsonlLogger",
           "seed_all_rng", "mkdir", "save_config", "save_labels", "Timer",
           "Checkpointer"]
