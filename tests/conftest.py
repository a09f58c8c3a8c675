"""Test config: force a virtual 8-device CPU platform before jax loads.

Multi-chip sharding tests run on a CPU mesh (the driver validates the real
multi-chip path separately via __graft_entry__.dryrun_multichip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/tpu default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# pytest auto-loaded plugins may have imported jax before this conftest ran;
# force the config path too (raises if a non-cpu backend was already used)
import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture
def host_serial():
    """Serialize CPU-heavy tests against any other heavy JAX work on this
    1-core host (a concurrently running dryrun_multichip, another suite).

    Round-3 postmortem: the full suite died with a fatal Python error while
    an 8-CPU-device dryrun ran in another process — both sides starved.
    dryrun_multichip takes the same lock (utils/host_lock.py), so the two
    simply queue; subprocesses spawned by a holder inherit it via env.
    """
    from augmentedautoencoder_tpu.utils.host_lock import host_heavy_lock

    with host_heavy_lock():
        yield
