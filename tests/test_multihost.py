"""Multi-host validation: a real 2-process jax.distributed job on CPU.

This is the JAX-way test of SURVEY.md §2.9's distributed backend — each
process holds 2 virtual devices, the dp=4 mesh spans both, each host samples
its local half of the particle batch, and the replicated parameters must stay
bit-identical across hosts after allreduced updates."""

import pytest
import os
import re
import socket
import subprocess
import sys



def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_vbpi():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["LIBSBN_PORT"] = str(_free_port())
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = []
    for pid in (0, 1):
        e = dict(env)
        e["LIBSBN_PROC"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "tools/multihost_demo.py"],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                env=e, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    checks = []
    for out in outs:
        m = re.search(r"MULTIHOST_OK proc=\d+ mean_ll=(\S+) checksum=(\S+)", out)
        assert m, out[-3000:]
        checks.append((m.group(1), m.group(2)))
    # Same replicated state (and therefore same metrics) on both hosts.
    assert checks[0] == checks[1], checks
