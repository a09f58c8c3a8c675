"""Multi-host rehearsal worker: one PROCESS of a 2-process CPU "pod".

Launched by tests/test_multihost.py as two subprocesses (4 virtual CPU
devices each -> one global 8-device data mesh). Runs the real fused
training step sharded over the global mesh — the same code path a
multi-host TPU pod uses (parallel/mesh.py layout; the reference has no
distributed story at all, SURVEY.md §2.1).

Prints `LOSS <step> <value>` lines; the test asserts both processes agree
(the gradient all-reduce crossed the process boundary coherently).

Usage: python multihost_worker.py <process_id> <num_processes> <port> \
           [local_devices]

With num_processes=1 and local_devices=8 the same script doubles as the
single-host control arm: the test asserts the 2x4 cross-process loss
stream matches the 1x8 single-process one (same seeds, same global mesh
size — the process layout must not change the training math).
"""

import os
import sys

PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = int(sys.argv[3])
LOCAL_DEVICES = int(sys.argv[4]) if len(sys.argv) > 4 else 4

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the axon plugin overrides env vars

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from augmentedautoencoder_tpu import parallel  # noqa: E402

parallel.initialize(
    coordinator_address=f"localhost:{PORT}", num_processes=NPROC, process_id=PID
)

import numpy as np  # noqa: E402

from augmentedautoencoder_tpu.config import TrainConfig  # noqa: E402
from augmentedautoencoder_tpu.data import augment_spec as S  # noqa: E402
from augmentedautoencoder_tpu.data.pipeline import DeviceDataset  # noqa: E402
from augmentedautoencoder_tpu.models import AAE  # noqa: E402
from augmentedautoencoder_tpu.training import (  # noqa: E402
    create_train_state,
    make_train_step,
)

assert jax.process_count() == NPROC, jax.process_count()
assert jax.device_count() == NPROC * LOCAL_DEVICES
assert jax.local_device_count() == LOCAL_DEVICES

H = W = 32
cfg = TrainConfig(h=H, w=W, c=3, latent_space_size=8)
cfg.num_filter = [4, 8]
cfg.strides = [2, 2]
cfg.batch_size = 16
cfg.noof_training_imgs = 32
cfg.code = S.Sequential([S.Sometimes(0.5, S.Multiply(mul=(0.8, 1.2)))])

# identical data on every process (seeded), then replicated onto the GLOBAL
# mesh — the batch itself shards over all 8 devices inside the step
rng = np.random.RandomState(0)
n = cfg.noof_training_imgs
train_x = rng.randint(0, 255, (n, H, W, 3), dtype=np.uint8)
masks = np.zeros((n, H, W), bool)
bg = rng.randint(0, 255, (4, H, W, 3), dtype=np.uint8)

mesh = parallel.make_mesh()  # all 8 global devices on the data axis
assert mesh.devices.size == NPROC * LOCAL_DEVICES

ds = DeviceDataset(cfg, train_x, masks, train_x.copy(), bg)
ds.data = parallel.host_replicate(jax.device_get(ds.data), mesh)

model = AAE.from_config(cfg)
key = jax.random.PRNGKey(0)
state = create_train_state(key, cfg, model)
state = parallel.host_replicate(jax.device_get(state), mesh)
key = parallel.host_replicate(jax.device_get(key), mesh)

step = make_train_step(model, ds, cfg.batch_size, mesh=mesh)
for i in range(3):
    state, losses = step(state, key)
    val = float(np.asarray(jax.device_get(losses["total_loss"])))
    assert np.isfinite(val)
    print(f"LOSS {i} {val:.9f}", flush=True)
print("WORKER_OK", flush=True)
