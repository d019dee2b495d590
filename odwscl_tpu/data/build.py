"""Data loader assembly (reference wetectron/data/build.py:20-232).

Builds dataset(s) + sampler + transform + collator into a python generator
of device-ready Batches. A small thread pool overlaps host-side decode/
augment with device compute (replacing torch DataLoader workers).
"""

from __future__ import annotations

import concurrent.futures as futures
import logging
from typing import Iterator, List, Optional

import numpy as np

from .voc import PascalVOCDataset
from .coco_dataset import COCODataset
from .transforms import TrainTransform, EvalTransform, build_train_transform
from .collate import BatchCollator, collator_from_cfg
from .samplers import (IterationBatchSampler, InferenceSampler,
                       aspect_ratio_groups, class_batch_pairs)
from ..config.catalog import DatasetCatalog

logger = logging.getLogger("odwscl_tpu.data")


def build_dataset(name: str, proposal_file: Optional[str], is_train: bool,
                  data_root: str = "datasets", load_masks: bool = False,
                  load_keypoints: bool = False):
    import os
    if (proposal_file and not os.path.isabs(proposal_file)
            and not os.path.exists(proposal_file)):
        candidate = os.path.join(data_root, proposal_file)
        if os.path.exists(candidate):
            proposal_file = candidate
    info = DatasetCatalog.get(name, data_root)
    factory = info["factory"]
    args = info["args"]
    if factory == "PascalVOCDataset":
        return PascalVOCDataset(proposal_file=proposal_file,
                                use_difficult=not is_train, **args)
    if factory == "COCODataset":
        return COCODataset(proposal_file=proposal_file,
                           remove_images_without_annotations=is_train,
                           load_masks=load_masks,
                           load_keypoints=load_keypoints, **args)
    if factory == "WebDataset":
        from .flickr import WebDataset
        return WebDataset(proposal_file=proposal_file, **args)
    raise ValueError(f"Unknown dataset factory {factory}")


class ConcatDataset:
    """reference data/datasets/concat_dataset.py."""

    def __init__(self, datasets: List):
        self.datasets = datasets
        self.offsets = np.cumsum([0] + [len(d) for d in datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def _locate(self, idx):
        d = int(np.searchsorted(self.offsets, idx, side="right") - 1)
        return self.datasets[d], idx - int(self.offsets[d])

    def __getitem__(self, idx):
        ds, i = self._locate(idx)
        s = ds[i]
        return s

    def get_img_info(self, idx):
        ds, i = self._locate(idx)
        return ds.get_img_info(i)


class TrainLoader:
    """Iterates Batches for training; resumable via start_iter."""

    def __init__(self, dataset, transform: TrainTransform,
                 collator: BatchCollator, batch_size: int, max_iter: int,
                 start_iter: int = 0, seed: int = 1234,
                 aspect_grouping: bool = True, num_workers: int = 4,
                 process_count: int = 1, process_index: int = 0,
                 class_batch: bool = False):
        self.dataset = dataset
        self.transform = transform
        self.collator = collator
        groups = aspect_ratio_groups(dataset) if aspect_grouping else None
        # SOLVER.CLASS_BATCH (grouped_batch_sampler.py:124-250): batches of
        # image pairs sharing a class, for contrastive pair mining
        ebf = ((lambda epoch: class_batch_pairs(dataset, batch_size, epoch))
               if class_batch else None)
        self.sampler = IterationBatchSampler(
            len(dataset), batch_size, max_iter, start_iter=start_iter,
            groups=None if class_batch else groups,
            process_count=process_count,
            process_index=process_index, epoch_batches_fn=ebf)
        self.seed = seed
        self.num_workers = max(num_workers, 1)

    def __len__(self):
        return len(self.sampler)

    def _load_one(self, idx: int, it: int):
        rng = np.random.RandomState((self.seed + it * 100003 + int(idx)) % (2**31))
        return self.transform(self.dataset[int(idx)], rng)

    def __iter__(self) -> Iterator:
        with futures.ThreadPoolExecutor(self.num_workers) as pool:
            pending = None
            for it, batch_idx in enumerate(self.sampler):
                fs = [pool.submit(self._load_one, i, it) for i in batch_idx]
                if pending is not None:
                    yield self.collator([f.result() for f in pending])
                pending = fs
            if pending is not None:
                yield self.collator([f.result() for f in pending])


class EvalLoader:
    """Sequential eval batches; yields (Batch, samples) so the caller keeps
    access to original sizes/ids for unscaling predictions."""

    def __init__(self, dataset, transform: Optional[EvalTransform],
                 collator: BatchCollator, batch_size: int,
                 process_count: int = 1, process_index: int = 0,
                 num_workers: int = 4):
        self.dataset = dataset
        self.transform = transform
        self.collator = collator
        self.sampler = InferenceSampler(len(dataset), batch_size,
                                        process_count, process_index)
        self.num_workers = max(num_workers, 1)

    def __len__(self):
        return len(self.sampler)

    def __iter__(self):
        def load(i):
            s = self.dataset[int(i)]
            return self.transform(s) if self.transform is not None else s

        def collate(samples):
            # with TTA the per-transform resize happens inside the
            # Inferencer (BBoxAugCollator semantics: raw samples pass
            # through, collate_batch.py:30); no device batch here
            if self.transform is None:
                return None
            return self.collator(samples)

        with futures.ThreadPoolExecutor(self.num_workers) as pool:
            pending, pending_idx = None, None
            for batch_idx in self.sampler:
                fs = [pool.submit(load, i) for i in batch_idx]
                if pending is not None:
                    samples = [f.result() for f in pending]
                    yield collate(samples), samples, pending_idx
                pending, pending_idx = fs, batch_idx
            if pending is not None:
                samples = [f.result() for f in pending]
                yield collate(samples), samples, pending_idx


def make_train_loader(cfg, start_iter: int = 0, data_root: str = "datasets",
                      process_count: int = 1, process_index: int = 0):
    names = cfg.DATASETS.TRAIN
    pfiles = cfg.PROPOSAL_FILES.TRAIN or (None,) * len(names)
    datasets = [build_dataset(n, p, True, data_root,
                              load_masks=cfg.MODEL.MASK_ON,
                              load_keypoints=cfg.MODEL.KEYPOINT_ON)
                for n, p in zip(names, pfiles)]
    dataset = datasets[0] if len(datasets) == 1 else ConcatDataset(datasets)
    transform = build_train_transform(cfg)
    collator = collator_from_cfg(cfg)
    return TrainLoader(dataset, transform, collator,
                       batch_size=cfg.SOLVER.IMS_PER_BATCH,
                       max_iter=cfg.SOLVER.MAX_ITER, start_iter=start_iter,
                       seed=cfg.SEED,
                       aspect_grouping=cfg.DATALOADER.ASPECT_RATIO_GROUPING,
                       class_batch=cfg.SOLVER.CLASS_BATCH,
                       num_workers=cfg.DATALOADER.NUM_WORKERS,
                       process_count=process_count, process_index=process_index)


def make_eval_loaders(cfg, data_root: str = "datasets",
                      process_count: int = 1, process_index: int = 0):
    names = cfg.DATASETS.TEST
    pfiles = cfg.PROPOSAL_FILES.TEST or (None,) * len(names)
    loaders = []
    for n, p in zip(names, pfiles):
        ds = build_dataset(n, p, False, data_root,
                           load_masks=cfg.MODEL.MASK_ON,
                           load_keypoints=cfg.MODEL.KEYPOINT_ON)
        transform = (None if cfg.TEST.BBOX_AUG.ENABLED else EvalTransform(
            cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST,
            tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD),
            cfg.INPUT.TO_BGR255))
        loaders.append((n, EvalLoader(ds, transform, collator_from_cfg(cfg),
                                      cfg.TEST.IMS_PER_BATCH, process_count,
                                      process_index,
                                      cfg.DATALOADER.NUM_WORKERS)))
    return loaders
