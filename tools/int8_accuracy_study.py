#!/usr/bin/env python
"""int8 serving accuracy study (VERDICT r4 task 3).

Scales the round-4 synthetic-VOC end-metric check (32 train / 16 test
images, 300 iters, one seed — error bars on the order of the delta) into
a claimable serving recipe: >=128 train / >=64 test images, >=1000
iterations, >=2 seeds, evaluating each trained checkpoint through the CLI
recipe in three modes:

  bf16        — the reference-parity eval path
  int8        — static-calibrated int8 serving (per-channel activation
                scales, round 5; `tools/test_net.py --int8`)
  int8-fb     — int8 with TPU.INT8_BF16_LAYERS bf16 fallback on the
                early conv3 block (the most drift-amplifying layers:
                quantization noise injected early compounds through the
                remaining depth)

Writes one JSON with per-seed mAPs, per-mode deltas, and the across-seed
spread. Runs the real CLIs (tools/train_net.py / tools/test_net.py) so the
study exercises exactly the shipped recipe.

    python -u tools/int8_accuracy_study.py [--seeds 1234 4321]
        [--iters 1000] [--n-train 128] [--n-test 64] [--out FILE]
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)


def run(cmd, log_path):
    print("  $", " ".join(cmd), flush=True)
    with open(log_path, "ab") as f:
        subprocess.run(cmd, check=True, stdout=f, stderr=subprocess.STDOUT,
                       cwd=REPO)


def read_map(outdir):
    path = os.path.join(outdir, "inference", "voc_2007_test", "result.txt")
    with open(path) as f:
        txt = f.read()
    m = re.search(r"mAP[:=\s]+([0-9.]+)", txt)
    if not m:
        raise RuntimeError(f"no mAP in {path}:\n{txt[:400]}")
    return float(m.group(1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[1234, 4321])
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--n-test", type=int, default=64)
    ap.add_argument("--img-h", type=int, default=192)
    ap.add_argument("--img-w", type=int, default=256)
    ap.add_argument("--n-props", type=int, default=300)
    ap.add_argument("--root", default="/tmp/int8_study")
    ap.add_argument("--fallback-layers", default="(4,5,6)",
                    help="TPU.INT8_BF16_LAYERS for the int8-fb mode")
    ap.add_argument("--out", default=os.path.join(REPO, "INT8_STUDY.json"))
    args = ap.parse_args()

    data_root = os.path.join(args.root, "data")
    marker = os.path.join(data_root, f".gen_{args.n_train}_{args.n_test}_"
                          f"{args.img_h}x{args.img_w}_{args.n_props}")
    if not os.path.exists(marker):
        shutil.rmtree(data_root, ignore_errors=True)
        from make_synthetic_voc import main as gen
        gen(data_root, n_train=args.n_train, n_test=args.n_test,
            img_hw=(args.img_h, args.img_w), n_props=args.n_props)
        open(marker, "w").close()

    cfg_file = os.path.join(REPO, "configs/voc/voc07_synth_smoke.yaml")
    common = [
        "INPUT.MIN_SIZE_TRAIN", f"({args.img_h - 32},)",
        "INPUT.MAX_SIZE_TRAIN", str(args.img_w),
        "INPUT.MIN_SIZE_TEST", str(args.img_h - 32),
        "INPUT.MAX_SIZE_TEST", str(args.img_w),
        "TPU.PROPOSAL_BUCKETS", "(512,)",
        "SOLVER.IMS_PER_BATCH", "4",
        "TEST.IMS_PER_BATCH", "4",
        "SOLVER.MAX_ITER", str(args.iters),
        "SOLVER.CHECKPOINT_PERIOD", str(args.iters),
        "SOLVER.STEPS", f"({int(args.iters * 0.7)},)",
        "SOLVER.WARMUP_ITERS", "50",
        "SOLVER.BASE_LR", "0.002",
    ]

    results = {"seeds": {}, "config": {
        "n_train": args.n_train, "n_test": args.n_test,
        "iters": args.iters, "img_hw": [args.img_h, args.img_w],
        "n_props": args.n_props, "fallback_layers": args.fallback_layers,
        "tta": False,
    }}
    for seed in args.seeds:
        sdir = os.path.join(args.root, f"seed{seed}")
        log = os.path.join(args.root, f"seed{seed}.log")
        train_dir = os.path.join(sdir, "train")
        ckpt_name = f"model_{args.iters:07d}"
        if not os.path.exists(os.path.join(train_dir, ckpt_name)):
            os.makedirs(train_dir, exist_ok=True)
            run([sys.executable, "-u", os.path.join(HERE, "train_net.py"),
                 "--config-file", cfg_file, "--skip-test",
                 "--data-root", data_root, "OUTPUT_DIR", train_dir,
                 "SEED", str(seed)] + common, log)
        per_mode = {}
        for mode, extra in [
                ("bf16", []),
                ("int8", ["--int8"]),
                ("int8-fb", ["--int8", "TPU.INT8_BF16_LAYERS",
                             args.fallback_layers])]:
            mdir = os.path.join(sdir, f"eval_{mode}")
            if not os.path.exists(os.path.join(
                    mdir, "inference", "voc_2007_test", "result.txt")):
                shutil.rmtree(mdir, ignore_errors=True)
                os.makedirs(mdir)
                # the eval reads OUTPUT_DIR's last_checkpoint: link the
                # trained ckpt into a mode-private dir so predictions/
                # int8_scales caches never cross modes
                os.symlink(os.path.join(train_dir, ckpt_name),
                           os.path.join(mdir, ckpt_name))
                with open(os.path.join(mdir, "last_checkpoint"), "w") as f:
                    f.write(ckpt_name)
            flags = [a for a in extra if a.startswith("--")]
            opts = [a for a in extra if not a.startswith("--")]
            run([sys.executable, "-u", os.path.join(HERE, "test_net.py"),
                 "--config-file", cfg_file] + flags +
                ["--data-root", data_root, "OUTPUT_DIR", mdir] + common
                + opts, log)
            per_mode[mode] = read_map(mdir)
            print(f"seed {seed} {mode}: mAP {per_mode[mode]:.4f}",
                  flush=True)
        results["seeds"][str(seed)] = per_mode

    maps = results["seeds"]
    summary = {}
    for mode in ("bf16", "int8", "int8-fb"):
        vals = [maps[s][mode] for s in maps]
        summary[mode] = {"mean": sum(vals) / len(vals),
                         "per_seed": vals}
    for mode in ("int8", "int8-fb"):
        deltas = [maps[s][mode] - maps[s]["bf16"] for s in maps]
        summary[f"delta_{mode}"] = {
            "mean": sum(deltas) / len(deltas),
            "per_seed": deltas,
            "spread": max(deltas) - min(deltas)}
    results["summary"] = summary
    print(json.dumps(summary, indent=1))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
