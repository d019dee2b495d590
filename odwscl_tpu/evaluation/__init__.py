from .voc_eval import (do_voc_evaluation, do_corloc_evaluation,
                       eval_detection_voc, calc_detection_voc_ap,
                       calc_detection_voc_prec_rec)
from .coco_eval import do_coco_evaluation, check_expected_results


def evaluate(dataset, predictions, output_folder=None, task: str = "det",
             **kwargs):
    """Evaluator dispatch (reference data/datasets/evaluation/__init__.py:6)."""
    from ..data.voc import PascalVOCDataset

    if task == "corloc":
        return do_corloc_evaluation(dataset, predictions, output_folder)
    if isinstance(dataset, PascalVOCDataset):
        return do_voc_evaluation(dataset, predictions, output_folder)
    return do_coco_evaluation(dataset, predictions, output_folder, **kwargs)


__all__ = ["do_voc_evaluation", "do_corloc_evaluation", "eval_detection_voc",
           "calc_detection_voc_ap", "calc_detection_voc_prec_rec",
           "do_coco_evaluation", "check_expected_results", "evaluate"]
