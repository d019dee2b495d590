"""Opt-in end-to-end integration: synthetic VOC -> short train -> eval.

Run with ODWSCL_RUN_SLOW=1 (takes several minutes; the regular suite covers
the same path piecewise). Mirrors SURVEY.md section 4's integration test:
N-iteration train on synthetic images + proposals, all loss terms finite
and decreasing; eval smoke checks the detection output schema.
"""

import os
import sys
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(os.environ.get("ODWSCL_RUN_SLOW") != "1",
                                reason="set ODWSCL_RUN_SLOW=1 to run")


def test_train_eval_roundtrip():
    import jax
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_synthetic_voc

    from odwscl_tpu.config import get_default_cfg
    from odwscl_tpu.models import detector_from_cfg
    from odwscl_tpu.data import make_train_loader, make_eval_loaders
    from odwscl_tpu.engine.trainer import create_train_state, make_train_step
    from odwscl_tpu.engine.inference import inference

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_voc.main(out=root, n_train=4, n_test=2)
        cfg = get_default_cfg()
        cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                         "configs/voc/voc07_synth_smoke.yaml"))
        cfg.SOLVER.MAX_ITER = 6
        cfg.SOLVER.IMS_PER_BATCH = 2
        cfg.TPU.COMPUTE_DTYPE = "float32"

        model = detector_from_cfg(cfg)
        loader = make_train_loader(cfg, data_root=root)
        it = iter(loader)
        batches = [next(it) for _ in range(6)]
        state, tx, _ = create_train_state(model, cfg, batches[0],
                                          jax.random.PRNGKey(cfg.SEED), 4)
        step = jax.jit(make_train_step(model, tx), donate_argnums=0)
        losses = []
        for b in batches:
            state, logs = step(state, b)
            losses.append(float(logs["loss"]))
        assert all(np.isfinite(losses)), losses
        assert losses[-1] < losses[0], losses

        name, eval_loader = make_eval_loaders(cfg, root)[0]
        with tempfile.TemporaryDirectory() as out:
            res = inference(model, {"params": state.params}, cfg, eval_loader,
                            eval_loader.dataset, out, use_cached=False)
        assert "map" in res and np.isfinite(res["map"])
