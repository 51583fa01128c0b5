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
def test_two_process_fleet_step_matches_single_process(tmp_path):
    """The REAL fused fleet step across a process boundary (VERDICT r4
    item 4): 2 processes x 4 virtual devices each run a 3-step gated
    make_fused_fleet_step chain with host-sharded streams fed via
    local_data_slice; final replicated params/BN stats and every stream's
    per-step aux must match the single-process 8-device run."""
    import numpy as np

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(REPO, "tests", "multihost_fleet_worker.py")

    single_out = str(tmp_path / "single.npz")
    p = subprocess.run(
        [sys.executable, worker, "single", single_out],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    outs = [str(tmp_path / f"multi{i}.npz") for i in (0, 1)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "multi", coord, "2", str(pid), outs[pid]],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        outputs.append(stdout)
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, o[-2000:]

    ref = np.load(single_out)
    m0, m1 = np.load(outs[0]), np.load(outs[1])
    # Replicated model state bit-identical on BOTH processes (the psum makes
    # every process compute the same update).
    np.testing.assert_allclose(m0["params"], m1["params"], rtol=0, atol=0)
    np.testing.assert_allclose(m0["stats"], m1["stats"], rtol=0, atol=0)
    # vs the single-process run: the cross-process psum reduces in a
    # different order, and Adam turns sign flips of NEAR-ZERO gradients into
    # +-lr parameter deviations (the epsilon regime documented in
    # test_lockstep_reference.py). Observed: 2.4% of params at <=1.3e-4
    # (lr=1e-4) after the 3-step chain; the bulk matches tightly.
    lr = 1e-4
    d = np.abs(m0["params"] - ref["params"])
    band = 1e-5 + 2e-5 * np.abs(ref["params"])
    frac_out = float((d > band).mean())
    assert frac_out < 0.05, frac_out
    assert d.max() < 3 * lr, d.max()
    np.testing.assert_allclose(m0["stats"], ref["stats"], rtol=2e-4, atol=2e-5)
    # Host-sharded per-stream aux: process 0 owns streams 0-3, process 1
    # owns 4-7; together they must reproduce the single-process rows.
    # Step 0 runs from IDENTICAL params (pure reduction-order noise: tight);
    # later steps inherit the epsilon-regime param deviations (loose).
    for step_i in range(3):
        tol = 2e-4 if step_i == 0 else 2e-2
        for key in ("fcs_raw", "Monodepth/total_loss"):
            k = f"step{step_i}/{key}"
            assert m0[f"{k}_idx"][0] == 0 and m1[f"{k}_idx"][0] == 4
            got = np.concatenate([m0[k], m1[k]])
            np.testing.assert_allclose(got, ref[k], rtol=tol, atol=tol * 1e-2)
        # Gate decisions are discrete and must agree exactly.
        k = f"step{step_i}/do_update"
        np.testing.assert_array_equal(
            np.concatenate([m0[k], m1[k]]), ref[k])


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
