"""2-process jax.distributed smoke test (SURVEY.md §5 "distributed
communication backend"): proves parallel.initialize_multihost +
local_data_slice + a cross-process psum work end-to-end on the CPU
coordinator — the only code between the virtual-mesh tests and a real pod
slice that nothing else executes.

Runs in SUBPROCESSES (jax.distributed can only initialize once per process,
and the pytest process already owns the 8-device single-process backend).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_psum(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out = str(tmp_path / "reduced.txt")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             coord, "2", str(pid), out],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        outputs.append(stdout)

    for p, o in zip(procs, outputs):
        assert p.returncode == 0, o[-2000:]
    # 8 streams valued 0..7 -> psum-mean = 3.5 on every device.
    with open(out) as f:
        assert abs(float(f.read().strip()) - 3.5) < 1e-6
    assert "psum-mean=3.5" in outputs[0]
