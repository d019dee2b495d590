"""Tensor-parallel fc6/fc7 serving (parallel/tp.py) on a (data, tp) CPU
mesh: exact agreement with the single-device neck + proof the sharding is
real (per-shard kernel slices differ; removing the psum breaks it)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odwscl_tpu.parallel import make_mesh, tp_neck_apply, shard_neck_params

pytestmark = pytest.mark.skipif(
    jax.local_device_count() < 8, reason="needs 8 virtual CPU devices")


def _mesh_2d():
    from jax.sharding import Mesh
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "tp"))


def _neck_params(rng, k=512, h=256):
    return {
        "fc6": {"kernel": jnp.asarray(rng.randn(k, h) * 0.02, jnp.float32),
                "bias": jnp.asarray(rng.randn(h) * 0.01, jnp.float32)},
        "fc7": {"kernel": jnp.asarray(rng.randn(h, h) * 0.02, jnp.float32),
                "bias": jnp.asarray(rng.randn(h) * 0.01, jnp.float32)},
    }


def test_tp_neck_matches_single_device():
    rng = np.random.RandomState(0)
    mesh = _mesh_2d()
    params = _neck_params(rng)
    x = jnp.asarray(rng.randn(16, 512), jnp.float32)

    got = tp_neck_apply(mesh, params, x, compute_dtype=jnp.float32)

    h = jnp.maximum(x @ params["fc6"]["kernel"] + params["fc6"]["bias"], 0)
    want = jnp.maximum(h @ params["fc7"]["kernel"] + params["fc7"]["bias"],
                       0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_neck_with_sharded_params_and_4d_input():
    rng = np.random.RandomState(1)
    mesh = _mesh_2d()
    params = _neck_params(rng, k=2 * 2 * 128, h=256)
    sharded = shard_neck_params(mesh, params)
    # per-device shards must actually split the hidden axis
    k6 = sharded["fc6"]["kernel"]
    assert k6.sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    x = jnp.asarray(rng.randn(8, 2, 2, 128), jnp.float32)
    got = tp_neck_apply(mesh, sharded, x, compute_dtype=jnp.float32)
    xf = x.reshape(8, -1)
    h = jnp.maximum(xf @ params["fc6"]["kernel"] + params["fc6"]["bias"], 0)
    want = jnp.maximum(h @ params["fc7"]["kernel"] + params["fc7"]["bias"],
                       0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_neck_fault_detection():
    """Teeth, two layers: (1) dropping the psum entirely is REJECTED
    statically — shard_map's replication checker refuses an out_spec that
    claims tp-replication the body never established; (2) the wrong
    collective (pmean — off by the tp factor) type-checks but must not
    match the single-device neck."""
    from jax.sharding import PartitionSpec as P

    rng = np.random.RandomState(2)
    mesh = _mesh_2d()
    params = _neck_params(rng)
    x = jnp.asarray(rng.randn(16, 512), jnp.float32)
    args = (params["fc6"]["kernel"], params["fc6"]["bias"],
            params["fc7"]["kernel"], params["fc7"]["bias"], x)
    in_specs = (P(None, "tp"), P("tp"), P("tp", None), P(), P("data"))

    def no_psum(k6, b6, k7, b7, xs):
        h = jnp.maximum(xs @ k6 + b6, 0)
        return jnp.maximum(h @ k7 + b7, 0)

    with pytest.raises(ValueError, match="replication"):
        jax.shard_map(no_psum, mesh=mesh, in_specs=in_specs,
                      out_specs=P("data"))(*args)

    def wrong_collective(k6, b6, k7, b7, xs):
        h = jnp.maximum(xs @ k6 + b6, 0)
        z = jax.lax.pmean(h @ k7, "tp")     # mean where sum is required
        return jnp.maximum(z + b7, 0)

    got = jax.shard_map(wrong_collective, mesh=mesh, in_specs=in_specs,
                        out_specs=P("data"))(*args)
    h = jnp.maximum(x @ params["fc6"]["kernel"] + params["fc6"]["bias"], 0)
    want = jnp.maximum(h @ params["fc7"]["kernel"] + params["fc7"]["bias"],
                       0)
    assert float(jnp.abs(got - want).max()) > 1e-2
