"""Test configuration: force an 8-device virtual CPU mesh so sharding and
distributed-BA tests run without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere. FORCE (not setdefault):
# the shell environment on TPU hosts exports JAX_PLATFORMS=axon, and the
# suite is designed for a deterministic 8-device virtual CPU mesh — a
# setdefault silently ran every test single-chip on the real TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("JAX_PLATFORM_NAME", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: this machine is slow; re-jitting identical
# programs across test runs dominates wall time without it.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

import jax  # noqa: E402

# The axon TPU plugin prepends itself to jax_platforms at import time
# (site customization), overriding the env var — force the config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
