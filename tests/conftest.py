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

# Persistent compile cache for the suite: the rig is single-CPU and most
# test wall-time is XLA compilation of the jitted programs (scans of
# bursts, shard_map meshes) — a warm cache cuts repeat suite runs by ~2×.
# Separate directory from the TPU cache; gitignored.
from pathlib import Path as _Path  # noqa: E402

from spectralae.core.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache(_Path(__file__).resolve().parent.parent
                         / ".jax_cache_tests")
