from .supcon import supcon_loss, supcon_v2_loss
from .mining import StageAResult, StageBResult, stage_a, stage_b, assemble_bank
from .pseudo_labels import PseudoLabels, od_layer, oicr_layer, mist_layer
from .weak_loss import (wsddn_final_score, mil_loss, refinement_cls_loss,
                        refinement_reg_loss, avg_image_accuracy, sum_losses)

__all__ = [
    "supcon_loss", "supcon_v2_loss",
    "StageAResult", "StageBResult", "stage_a", "stage_b", "assemble_bank",
    "PseudoLabels", "od_layer", "oicr_layer", "mist_layer",
    "wsddn_final_score", "mil_loss", "refinement_cls_loss",
    "refinement_reg_loss", "avg_image_accuracy", "sum_losses",
]
