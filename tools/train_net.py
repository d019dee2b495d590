#!/usr/bin/env python
"""Training CLI (reference tools/train_net.py:196-358).

Same surface: --config-file, positional opts (KEY VALUE pairs, including the
paper's lowercase hyperparameters: `... OUTPUT_DIR out nms 0.1 lmda 0.03 iou
0.5 temp 0.2 thres 0.5 loss supconv2`), --skip-test, paper flags (--nms,
--lmda, --iou, --temp, --thres, --loss, --cluster, --pos_update, --min_size,
--cls_hp, --reg_hp, --lmda2) mapped onto the same config keys.

TPU-native: no torch.distributed.launch — one process drives all local
chips through a jax.sharding mesh; multi-host uses jax.distributed.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="OD-WSCL TPU training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--skip-test", action="store_true")
    parser.add_argument("--use-tensorboard", action="store_true",
                        help="write JSONL scalars (tensorboard replacement)")
    parser.add_argument("--data-root", default="datasets")
    parser.add_argument("--profile-dir", default="",
                        help="capture a jax.profiler trace of iters 2-6")
    parser.add_argument("--distributed", action="store_true",
                        help="call jax.distributed.initialize() (multi-host; "
                             "reads the standard JAX coordinator env vars, "
                             "replacing the reference's NCCL env:// init)")
    # paper hyperparameter flags (reference train_net.py:196-290)
    for flag, typ in [("nms", float), ("lmda", float), ("iou", float),
                      ("temp", float), ("thres", float), ("loss", str),
                      ("cluster", int), ("pos_update", int),
                      ("min_size", float), ("cls_hp", float),
                      ("reg_hp", float), ("lmda2", float)]:
        parser.add_argument(f"--{flag}", type=typ, default=None)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return parser.parse_args()


def update_iters(cfg):
    """SOLVER.ITER_SIZE rescales the schedule (reference train_net.py:344-355)."""
    iter_size = cfg.SOLVER.ITER_SIZE
    if iter_size > 1:
        cfg.SOLVER.MAX_ITER *= iter_size
        cfg.SOLVER.STEPS = tuple(s * iter_size for s in cfg.SOLVER.STEPS)
        cfg.SOLVER.WARMUP_ITERS *= iter_size
        cfg.SOLVER.CHECKPOINT_PERIOD *= iter_size


def run_test(cfg, model, variables, data_root):
    from odwscl_tpu.data import make_eval_loaders
    from odwscl_tpu.engine.inference import inference
    from odwscl_tpu.utils import mkdir

    results = []
    for name, loader in make_eval_loaders(cfg, data_root):
        out = os.path.join(cfg.OUTPUT_DIR, "inference", name)
        mkdir(out)
        results.append(inference(model, variables, cfg, loader,
                                 loader.dataset, out))
    return results


def main():
    args = parse_args()

    if args.distributed or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # multi-host: one controller process per host (train_net.py:291-293
        # used torch.distributed NCCL env:// init; jax.distributed wires the
        # same role via its coordinator service)
        import jax as _jax
        _jax.distributed.initialize()

    from odwscl_tpu.config import get_default_cfg
    from odwscl_tpu.utils import setup_logger, seed_all_rng, mkdir, save_config
    from odwscl_tpu.utils import JsonlLogger, MetricLogger, Checkpointer

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    for flag in ["nms", "lmda", "iou", "temp", "thres", "loss", "cluster",
                 "pos_update", "min_size", "cls_hp", "reg_hp", "lmda2"]:
        v = getattr(args, flag)
        if v is not None:
            cfg[flag] = v
    update_iters(cfg)
    cfg.freeze()

    mkdir(cfg.OUTPUT_DIR)
    logger = setup_logger("odwscl_tpu", cfg.OUTPUT_DIR,
                          jax.process_index())
    logger.info("Devices: %s (process %d/%d)", jax.devices(),
                jax.process_index(), jax.process_count())
    if args.config_file:
        logger.info("Loaded config %s", args.config_file)
    save_config(cfg, os.path.join(cfg.OUTPUT_DIR, "config.yml"))
    seed_all_rng(cfg.SEED + jax.process_index())

    from odwscl_tpu.models import build_model
    from odwscl_tpu.models.vgg16 import FREEZE_CONV_COUNTS
    from odwscl_tpu.data import make_train_loader
    from odwscl_tpu.engine.trainer import create_train_state, do_train
    from odwscl_tpu.parallel import make_mesh
    from odwscl_tpu.utils.weight_import import (import_vgg16_imagenet,
                                                import_reference_checkpoint)
    from odwscl_tpu.config.catalog import ModelCatalog

    model = build_model(cfg)

    def build_loader(start_iter):
        return make_train_loader(cfg, start_iter=start_iter,
                                 data_root=args.data_root,
                                 process_count=jax.process_count(),
                                 process_index=jax.process_index())

    loader = build_loader(0)
    example = next(iter(loader))

    freeze_at = cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT
    freeze_count = FREEZE_CONV_COUNTS[freeze_at - 1] if freeze_at > 0 else 0
    state, tx, schedule = create_train_state(
        model, cfg, example, jax.random.PRNGKey(cfg.SEED), freeze_count)

    # warm start (reference checkpoint.py:67-125): resume > cfg.MODEL.WEIGHT
    ckpt = Checkpointer(cfg.OUTPUT_DIR, save=jax.process_index() == 0)
    start_iter = 0
    if ckpt.has_checkpoint():
        state, _ = ckpt.load(state)
        start_iter = int(state.step)
        logger.info("Resumed at iteration %d", start_iter)
        if start_iter:
            loader = build_loader(start_iter)  # fast-forward the data order
    elif cfg.MODEL.WEIGHT:
        # fails hard when the weight file is missing (VERDICT r1 #8): every
        # shipped config warm-starts from ImageNet and a silent random init
        # would waste the whole run
        path = ModelCatalog.resolve_or_fail(
            cfg.MODEL.WEIGHT, os.path.join(args.data_root, "weights"))
        if path.endswith(".pth") and "model" not in os.path.basename(path):
            params = import_vgg16_imagenet(jax.device_get(state.params), path)
        else:
            params = import_reference_checkpoint(
                jax.device_get(state.params), path)
        state = state.replace(params=jax.tree_util.tree_map(
            jax.numpy.asarray, params))
        logger.info("Warm-started from %s", path)

    meters = (JsonlLogger(os.path.join(cfg.OUTPUT_DIR, "logs"), start_iter)
              if args.use_tensorboard else MetricLogger())
    mesh = make_mesh(tuple(cfg.TPU.MESH_AXES))

    # DB.METHOD == "concrete" trains through the same step: the CDB's
    # adversarial ascent is fused into the optimizer (solver/build.py),
    # replacing the reference's second forward/backward (trainer.py:160-236)
    state = do_train(model, state, tx, schedule, iter(loader),
                     cfg.SOLVER.MAX_ITER, cfg.SOLVER.CHECKPOINT_PERIOD,
                     ckpt, mesh=mesh, meters=meters, start_iter=start_iter,
                     profile_dir=args.profile_dir)

    if not args.skip_test:
        run_test(cfg, model, {"params": state.params}, args.data_root)


if __name__ == "__main__":
    main()
