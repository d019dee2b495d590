"""odwscl_tpu: TPU-native rebuild of OD-WSCL (ECCV 2022) weakly-supervised object detection.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch/CUDA implementation (jinhseo/OD-WSCL, a wetectron fork):

- WSDDN dual-softmax MIL head + OICR/MIST refinement branches with box regression
- the paper's contrastive object-discovery loss (SupCon over 128-d RoI projections
  with similarity-mined pseudo-ground-truth banks)
- precomputed-proposal (Selective Search / MCG) data pipeline for VOC/COCO
- TTA evaluation (multi-scale + flip, AVG merge), VOC mAP / CorLoc / COCO AP

Design is TPU-first: static padded shapes everywhere (`Boxes` pytrees instead of
ragged BoxLists), batched masked tensor ops instead of per-image Python loops,
Pallas kernels for RoI pooling, `jax.sharding` data parallelism over an ICI mesh.
"""

__version__ = "0.1.0"

# Platform override for CLI drives (e.g. ODWSCL_PLATFORM=cpu to smoke the
# CLIs off-TPU). Env JAX_PLATFORMS alone cannot do this here: the TPU
# plugin's sitecustomize registers itself via jax.config.update at
# interpreter start, which outranks the env var — only another
# config.update (before first backend init) switches back.
import os as _os

if _os.environ.get("ODWSCL_PLATFORM"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["ODWSCL_PLATFORM"])
    except Exception:  # pragma: no cover - best-effort
        pass

# Persistent XLA compilation cache: the framework's graphs (train step with
# mining, per-scale eval forwards) are expensive to compile; caching makes
# repeated CLI runs / tests start in seconds. Opt out: ODWSCL_NO_JAX_CACHE=1.
import os as _os

if _os.environ.get("ODWSCL_NO_JAX_CACHE") != "1":
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            _os.path.expanduser("~/.cache/odwscl_jax_cache")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
