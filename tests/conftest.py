"""Test harness: run on CPU with 8 virtual devices so multi-chip sharding
tests work without TPU hardware (SURVEY §4: the reference's CPU-vs-GPU
cross-check pattern maps to jit-vs-sharded consistency tests here).

Note: the environment's sitecustomize registers the 'axon' TPU platform and
overrides JAX_PLATFORMS, so the platform must be forced programmatically
before the backend initializes."""

import os

_ON_TPU = os.environ.get("DSPH_TEST_TPU") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _ON_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
