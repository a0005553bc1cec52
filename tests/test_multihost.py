"""Multi-host (DCN) band split: a real 2-process jax.distributed
cluster over gloo loopback, 2 virtual CPU devices per process —
SURVEY §5's "DCN only for multi-host scaling of config 5" demo
(parallel/multihost.py, tools/multihost_demo.py).

Runs in subprocesses (a jax.distributed cluster cannot share the test
process's already-initialized backend)."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow      # 2-process cluster: full tier only

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cluster(nproc: int, extra_args, timeout: int = 540):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)           # demo sets its own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools/multihost_demo.py"),
             "--proc", str(i), "--nproc", str(nproc),
             "--coordinator", f"127.0.0.1:{port}", *extra_args],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "MULTIHOST OK" in out, f"proc {i} output:\n{out}"
    return outs


def test_two_process_cluster_band_identity():
    outs = _run_cluster(2, ["--local-devices", "2",
                            "--width", "256", "--height", "96"])
    for out in outs:
        assert "pixel-identical" in out


def test_four_process_peel_gather():
    """4 processes x 2 devices (r3 verdict #8): the split-OIT peel leg
    band-identical across the cluster, plus the optional viewer-host
    full-frame gather verified identical and timed on the gloo
    stand-in (the DCN cost a viewer pays; per-host encoders pay 0)."""
    outs = _run_cluster(
        4, ["--local-devices", "2", "--width", "192", "--height", "64",
            "--peel", "2", "--gather", "2"], timeout=900)
    for out in outs:
        assert "pixel-identical" in out
        assert "peel2 leg pixel-identical" in out
        assert "full-frame gather verified identical" in out
