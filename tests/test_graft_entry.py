"""The graded multi-chip dry run must run on a REAL 8-CPU-device mesh even
when the calling process is already bound to another platform.

Round-2 postmortem: the entry's env-var CPU forcing was a no-op under this
image's sitecustomize TPU plugin, and `_dryrun_impl` had no device asserts,
so a 1-TPU-device run passed vacuously (and failed outright when the TPU was
unhealthy — the recorded MULTICHIP_r01/r02 libtpu-skew crashes). These tests
pin both fixes: the hard asserts, and the steer-or-reexec platform logic.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.usefixtures("host_serial")
class TestDryrunInProcess:
    def test_runs_on_8_cpu_devices_and_cross_checks(self, capsys):
        # pytest's conftest forces an 8-CPU-device platform, so this takes
        # the in-process branch; the summary line proves the asserts ran.
        sys.path.insert(0, REPO)
        try:
            import __graft_entry__ as g
        finally:
            sys.path.remove(REPO)
        g.dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "MULTICHIP-OK" in out
        assert "n_devices=8" in out
        assert "platform=cpu" in out
        assert "steps=3" in out
        assert "weak_scaling_ok=True" in out
        # sharded-vs-1-device agreement is asserted inside _dryrun_impl;
        # the summary records the measured delta
        delta = float(out.split("max_param_delta=")[1].split()[0])
        assert delta < 1e-4

    def test_entry_steers_to_cpu_when_backend_probe_fails(self, monkeypatch):
        """entry() is the driver's compile check; a wedged TPU tunnel makes
        default-backend init HANG (not raise), so when the disposable probe
        subprocess times out, entry must steer this process to CPU before
        first backend use instead of hanging the driver."""
        sys.path.insert(0, REPO)
        try:
            import __graft_entry__ as g
        finally:
            sys.path.remove(REPO)

        def timed_out(*a, **k):
            raise subprocess.TimeoutExpired(cmd="probe", timeout=180.0)

        monkeypatch.setattr(subprocess, "run", timed_out)
        g._steer_to_cpu_if_backend_wedged()
        import jax

        assert str(jax.config.jax_platforms).strip() == "cpu"

    def test_entry_probe_healthy_is_a_noop(self, monkeypatch):
        """When the probe answers, entry must leave the platform choice to
        the driver (no steering)."""
        sys.path.insert(0, REPO)
        try:
            import __graft_entry__ as g
        finally:
            sys.path.remove(REPO)
        calls = []

        class P:
            returncode = 0
            stdout = "probe: 56.0\n"

        def probe_ok(*a, **k):
            calls.append(a)
            return P()

        import jax

        monkeypatch.setattr(subprocess, "run", probe_ok)
        before = jax.config.jax_platforms
        g._steer_to_cpu_if_backend_wedged()
        assert calls, "probe subprocess was not launched"
        assert jax.config.jax_platforms == before

    def test_impl_rejects_too_few_devices(self):
        sys.path.insert(0, REPO)
        try:
            import __graft_entry__ as g
        finally:
            sys.path.remove(REPO)
        with pytest.raises(AssertionError, match="needs >= 999"):
            g._dryrun_impl(999)


@pytest.mark.slow
@pytest.mark.usefixtures("host_serial")
class TestDryrunFromForeignPlatformParent:
    def test_subprocess_fallback_from_unsteered_parent(self):
        """A parent with jax imported but NOT steered to cpu-only (the
        driver's environment: the axon sitecustomize defaults
        jax_platforms to 'axon,cpu') must NOT have dryrun_multichip call
        jax.devices() in-process — on a wedged TPU tunnel that HANGS
        rather than raising (the recorded MULTICHIP_r01/r02 failure) — and
        must instead re-exec onto the virtual CPU mesh and surface the
        child's summary. Deliberately does NOT pre-bind the parent: the
        test must pass whether the TPU is healthy or wedged."""
        env = dict(os.environ)
        # undo the conftest's CPU forcing so the parent sees the session
        # default platform config, exactly like the driver's environment
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        code = (
            "import jax\n"
            "print('parent platforms:', jax.config.jax_platforms)\n"
            "import sys; sys.path.insert(0, %r)\n"
            "import __graft_entry__ as g\n"
            "g.dryrun_multichip(8)\n" % REPO
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            cwd=REPO,
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
        assert "MULTICHIP-OK" in proc.stdout
        assert "n_devices=8" in proc.stdout
        assert "platform=cpu" in proc.stdout
