# tests/conftest.py
# Test bootstrap: force an 8-device virtual CPU mesh so sharding paths are
# exercised without TPU hardware (the driver separately dry-runs multichip).
#
# Mirrors the reference's GPU-gating strategy (tests self-skip when no
# hardware; tests/_terrain_runtime.py:98-165) — here the CPU backend always
# exists, so tests always run; TPU-only tests use the `tpu` marker.

import os
import sys

# Must happen before jax configures its backends. The container's
# sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so we also override
# via jax.config below.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

if os.environ.get("FORGE3D_TEST_TPU", "") not in ("1", "true"):
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
    config.addinivalue_line("markers", "slow: long-running test")


@pytest.fixture(autouse=True)
def _reset_global_state():
    """Keep the degradation sink and memory ledger test-isolated."""
    yield
    from forge3d_tpu.degradation import clear_native_degradations
    from forge3d_tpu.mem import global_tracker

    clear_native_degradations()
    global_tracker().reset()
    global_tracker().set_policy("enforce")
    global_tracker().set_budget(512 * 1024 * 1024)
