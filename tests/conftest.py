"""Test environment: run on CPU with 8 virtual devices.

Multi-chip sharding tests run against a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``) per SURVEY.md §4 — the reference
has no distributed tests; ours simulate the v5e-8 mesh without TPUs.

Note: this environment pins JAX_PLATFORMS=axon (tunneled TPU) from the
shell, and the axon plugin re-inserts itself even when the env var is
overridden — so we must force CPU via jax.config *before* any backend is
initialized. Running tests over the tunnel works but is ~100x slower.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
