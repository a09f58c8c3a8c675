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
