from .voc import PascalVOCDataset, VOC_CLASSES
from .coco_dataset import COCODataset, MiniCOCO
from .proposals import ProposalStore, unique_boxes, write_proposal_pickle
from .transforms import (Sample, TrainTransform, EvalTransform,
                         build_train_transform)
from .collate import BatchCollator, collator_from_cfg
from .samplers import IterationBatchSampler, InferenceSampler
from .build import (make_train_loader, make_eval_loaders, build_dataset,
                    TrainLoader, EvalLoader, ConcatDataset)

__all__ = ["PascalVOCDataset", "VOC_CLASSES", "COCODataset", "MiniCOCO",
           "ProposalStore", "unique_boxes", "write_proposal_pickle",
           "Sample", "TrainTransform", "EvalTransform", "build_train_transform",
           "BatchCollator", "collator_from_cfg", "IterationBatchSampler",
           "InferenceSampler", "make_train_loader", "make_eval_loaders",
           "build_dataset", "TrainLoader", "EvalLoader", "ConcatDataset"]
