"""Run the full TPU bench/validation sequence in one process, stepwise.

Order is chosen so cheap feasibility checks come first and a hang in any
step doesn't mask earlier results (each step prints + flushes before the
next starts). Use on hardware:

    python -u tools/bench_all.py [--skip validate,stem,...]

Steps: devices, validate (RoIPool bit-exactness), eval (bench.py), train
(bench_train.py -> BENCH_TRAIN.json), int8conv (int8 conv feasibility).
"""

import argparse
import json
import sys
import time


def _step(name, fn):
    print(f"==== {name} ====", flush=True)
    t0 = time.perf_counter()
    try:
        fn()
    except Exception as e:  # keep going: later steps still inform
        print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
    print(f"==== {name} done in {time.perf_counter() - t0:.1f}s ====",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="", help="comma-separated step names")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    import jax
    print("devices:", jax.devices(), flush=True)

    if "validate" not in skip:
        from validate_roi_pool_tpu import main as validate_main
        _step("validate_roi_pool", validate_main)
    if "eval" not in skip:
        import bench
        _step("bench_eval (bf16 defaults)", bench.main)
    if "train" not in skip:
        from bench_train import main as train_main
        _step("bench_train", train_main)
    if "int8conv" not in skip:
        from bench_int8_conv import main as int8_main
        _step("bench_int8_conv", int8_main)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    main()
