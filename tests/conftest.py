"""Test configuration: force a virtual 8-device CPU mesh and a persistent
compilation cache so ResNet compiles only once across test runs."""

import os

# Force CPU with 8 virtual devices. NOTE: this environment's
# sitecustomize.py imports jax at interpreter startup and registers the
# axon (TPU) backend, so jax's config has already captured
# JAX_PLATFORMS=axon before this file runs — we must update the LIVE
# config, not just the env var.
os.environ["JAX_PLATFORMS"] = "cpu"
# Subprocesses spawned by tests (demo CLIs in test_demo_goldens.py) inherit
# the env but NOT this process's live config — and their own sitecustomize
# re-registers axon regardless of JAX_PLATFORMS, hanging when the tunnel is
# down. COTR_TPU_PLATFORM is cotr_tpu/__init__.py's live-config override and
# is the only knob that works across a fork.
os.environ["COTR_TPU_PLATFORM"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", (
    f"tests must run on CPU, got {jax.devices()}")
assert len(jax.devices()) >= 8, (
    "expected 8 virtual CPU devices; XLA_FLAGS was captured too early: "
    f"{os.environ.get('XLA_FLAGS')}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)
