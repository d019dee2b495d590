"""Test env: run everything on CPU with 8 virtual devices so sharding
semantics can be exercised without TPU hardware (SURVEY.md section 4).

The axon sitecustomize (/root/.axon_site) imports jax and registers the TPU
backend before pytest starts, so env vars alone don't switch platforms —
``jax.config.update`` after import (but before backend init) does."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
