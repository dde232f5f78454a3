"""Test harness config: run on CPU with 8 virtual devices.

Multi-device tests exercise the mesh/sharding layer without TPUs, per
SURVEY.md §4(d).  The environment may force a TPU platform (JAX_PLATFORMS=
axon) and pre-register its PJRT plugin via sitecustomize, so we override via
``jax.config`` *before* any backend is initialized rather than relying on env
vars alone.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
