"""True multi-process (multi-host simulation) tests.

The single-process 8-virtual-device mesh (test_parallel.py) never exercises
jax.distributed: these tests spawn TWO OS processes that rendezvous at a
coordinator, form one global 4-device mesh (2 virtual CPU devices each) and
train through the sharded chunk — the gradient all-reduce crosses the
process boundary exactly as it would cross DCN between TPU hosts.
"""
import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(args_for):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [subprocess.Popen(
        args_for(i), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env=env, cwd=REPO, text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out = p.communicate()[0]
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    return outs


def test_two_process_sharded_training():
    port = _free_port()
    outs = _spawn(lambda i: [
        sys.executable, os.path.join("tests", "helpers", "dist_worker.py"),
        "--coordinator", f"localhost:{port}",
        "--num-processes", "2", "--process-id", str(i)])
    norms = []
    for out in outs:
        assert "global_devices: 4" in out, out
        m = re.search(r"final_policy_param_l1: (\S+)", out)
        assert m, out
        norms.append(m.group(1))
    # gradient all-reduce keeps the replicated params bitwise identical
    assert norms[0] == norms[1], norms


def test_train_cli_distributed_flag(tmp_path):
    """train.py --distributed end-to-end: 2 processes, process 0 logs."""
    port = _free_port()
    outs = _spawn(lambda i: [
        sys.executable, "train.py", "--alg", "iddpg", "--platform", "cpu",
        "--distributed", "--coordinator", f"localhost:{port}",
        "--num-processes", "2", "--process-id", str(i),
        "--n-envs", "4", "--episodes", "1", "--max-steps", "4",
        "--days", "2", "--save-path", str(tmp_path)])
    for out in outs:
        assert "final_policy_param_l1" in out, out
    # only process 0 writes logs/checkpoints
    assert os.path.isdir(os.path.join(tmp_path, "tensorboard"))
