"""Two-process multi-host rehearsal: the sharded train step over a global
8-device mesh spanning 2 OS processes (4 virtual CPU devices each).

This exercises the cross-process path the single-process sharding tests
cannot: jax.distributed init, global-mesh construction from per-process
local devices, host-replicated state/data placement, and a gradient
all-reduce that crosses the process boundary. The reference has no
distributed capability at all (SURVEY.md §2.1) — this guards the new one.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.usefixtures("host_serial")
def test_two_process_sharded_training_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
        assert "WORKER_OK" in out, out

    def losses(out):
        return [line for line in out.splitlines() if line.startswith("LOSS")]

    l0, l1 = losses(outs[0]), losses(outs[1])
    assert len(l0) == 3
    # the all-reduced loss must be identical on both hosts
    assert l0 == l1, f"process loss streams diverged:\n{l0}\n{l1}"

    # control arm: the SAME global 8-device mesh as ONE process. The
    # process layout (2x4 with gloo cross-process all-reduce vs 1x8
    # in-process) must not change the training math.
    ctrl = subprocess.run(
        [sys.executable, WORKER, "0", "1", str(_free_port()), "8"],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
        timeout=600,
    )
    assert ctrl.returncode == 0, f"control worker failed:\n{ctrl.stdout}"
    lc = losses(ctrl.stdout)
    assert len(lc) == 3
    vals_2x4 = [float(line.split()[2]) for line in l0]
    vals_1x8 = [float(line.split()[2]) for line in lc]
    import numpy as np

    np.testing.assert_allclose(
        vals_2x4, vals_1x8, rtol=1e-5,
        err_msg="2-process x 4-device training diverged from the "
                "1-process x 8-device control",
    )
