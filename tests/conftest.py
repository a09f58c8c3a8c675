"""Test config: force a virtual 8-device CPU platform before jax loads.

Multi-chip sharding tests run on a CPU mesh (the driver validates the real
multi-chip path separately via __graft_entry__.dryrun_multichip).

Exception: the on-chip kernel gate (`-m tpu`, tests/test_tpu_kernels.py)
must see the real TPU — run it as
    AAE_TPU_TESTS=1 python -m pytest tests/ -q -m tpu
which skips the CPU forcing below; the tpu-marked tests themselves skip
when no TPU-like backend is present."""

import os

if os.environ.get("AAE_TPU_TESTS", "") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon default
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# pytest auto-loaded plugins may have imported jax before this conftest ran;
# force the config path too (raises if a non-cpu backend was already used)
import jax

if os.environ.get("AAE_TPU_TESTS", "") != "1":
    jax.config.update("jax_platforms", "cpu")
else:
    # the on-chip gate reuses the CLIs'/bench's persistent compile cache so
    # repeat runs stay under a minute (first-ever compiles take minutes)
    from augmentedautoencoder_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

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
