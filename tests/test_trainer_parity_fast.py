"""Fast-tier trajectory guard (VERDICT r3 next #6).

The first 12 lockstep iterations of the noncontra trajectory-parity run
against the EXECUTED reference — exactly the window that caught the round-3
warmup LR-phase bug: it covers warmup end (iteration 6) and the LR
milestone + Sutskever momentum correction (iteration 10), with pointwise
per-term tracking throughout. The full 40-iteration version (+ the contra
variant) stays in the slow tier (test_trainer_parity.py); this guard keeps
the schedule/solver regression net live in every default `pytest tests -q`
run.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_trainer_parity import (_make_data, _run_reference,  # noqa: E402
                                 _run_rebuild, _compare)

GUARD_ITERS = 12


def test_trajectory_guard_noncontra(tmp_path):
    rng = np.random.RandomState(42)
    batches = _make_data(rng)
    ckpt = str(tmp_path / "init_guard.pth")
    ref = _run_reference(False, 0.0, batches, ckpt, max_iter=GUARD_ITERS)
    ours = _run_rebuild(False, 0.0, batches, ckpt, max_iter=GUARD_ITERS)
    keys = [k for k in ref[0] if k.startswith("loss")]
    assert {"loss_img", "loss_ref_cls0", "loss_ref_reg0"} <= set(keys)
    _compare(ref, ours, keys, "guard", tight_iters=GUARD_ITERS)
    # the LR schedule actually exercised both phase boundaries: warmup end
    # and the milestone decay moved the loss trajectory
    tot0 = sum(ref[0][k] for k in keys)
    totN = sum(ref[-1][k] for k in keys)
    assert abs(totN - tot0) > 1e-4
