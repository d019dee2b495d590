#!/usr/bin/env python
"""Evaluation CLI (reference tools/test_net.py:32-132).

Same surface: --config-file, --ckpt (specific checkpoint; defaults to the
OUTPUT_DIR's last_checkpoint), --task det|corloc, --vis, positional opts.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    parser = argparse.ArgumentParser(description="OD-WSCL TPU evaluation")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--task", default="det", choices=["det", "corloc"])
    parser.add_argument("--vis", action="store_true")
    parser.add_argument("--data-root", default="datasets")
    parser.add_argument("--int8", action="store_true",
                        help="int8 static-calibrated serving: quantized "
                        "convs + fc6/fc7 with scales calibrated on "
                        "TPU.INT8_CALIB_BATCHES eval batches and persisted "
                        "to OUTPUT_DIR/int8_scales.npz (README recipe)")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    from odwscl_tpu.config import get_default_cfg
    from odwscl_tpu.utils import setup_logger, mkdir, Checkpointer
    from odwscl_tpu.models import build_model
    from odwscl_tpu.data import make_eval_loaders
    from odwscl_tpu.engine.inference import inference
    from odwscl_tpu.engine.trainer import create_train_state
    from odwscl_tpu.utils.weight_import import import_reference_checkpoint

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.int8:
        cfg.merge_from_list(["TPU.INT8_EVAL", "True",
                             "TPU.INT8_EVAL_CONVS", "True",
                             "TPU.INT8_STATIC", "True"])
    cfg.freeze()

    save_dir = os.path.join(cfg.OUTPUT_DIR, "inference")
    mkdir(save_dir)
    logger = setup_logger("odwscl_tpu", save_dir, jax.process_index())
    logger.info("Devices: %s", jax.devices())

    model = build_model(cfg)
    loaders = make_eval_loaders(cfg, args.data_root,
                                jax.process_count(), jax.process_index())
    # init params on a tiny synthetic batch, then load the checkpoint
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_batch
    example = _tiny_batch(c=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES)
    state, _, _ = create_train_state(model, cfg, example, jax.random.PRNGKey(0))

    ckpt = Checkpointer(cfg.OUTPUT_DIR, save=False)
    if args.ckpt and args.ckpt.endswith(".pth"):
        params = import_reference_checkpoint(jax.device_get(state.params),
                                             args.ckpt)
        state = state.replace(params=jax.tree_util.tree_map(
            jax.numpy.asarray, params))
    else:
        state, found = ckpt.load(state, args.ckpt)
        if not found:
            logger.warning("No checkpoint found; evaluating random init")
    variables = {"params": state.params}

    for name, loader in loaders:
        out = os.path.join(cfg.OUTPUT_DIR, "inference", name)
        mkdir(out)
        inference(model, variables, cfg, loader, loader.dataset, out,
                  task=args.task, vis=args.vis)


if __name__ == "__main__":
    main()
