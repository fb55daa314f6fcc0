"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This is the "fake backend" the reference lacks (SURVEY.md §4): sharding and
multi-chip code paths run on N virtual CPU devices via
--xla_force_host_platform_device_count, so the full Mesh code path is
testable without TPU hardware.

NOTE: this environment's sitecustomize registers the axon TPU plugin and
overrides jax_platforms at interpreter boot, so the JAX_PLATFORMS env var
alone is NOT sufficient — the config must be updated after importing jax
(before any backend initialization).
"""

import os
import pathlib
import tempfile

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache: compiles survive across test processes.
_cache_dir = pathlib.Path(tempfile.gettempdir()) / "elit_xla_cache"
_cache_dir.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", jax.devices()
