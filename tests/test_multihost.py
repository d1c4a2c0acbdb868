"""Real multi-process (multi-host analogue) test: 2 processes x 4 virtual
CPU devices run one fully sharded training update over a global mesh, a
cross-host metric reduction, and a cooperative orbax checkpoint
(VERDICT.md round-1 item 3; SURVEY.md §2.5 multi-host row, §7 step 8)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(900)
def test_two_process_sharded_update(tmp_path):
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    ckpt_dir = str(tmp_path / "ckpts")

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    # Keep the suite's persistent compile cache out of the workers: the
    # distributed runtime must not race on it.
    env["MHS_NO_COMPILE_CACHE"] = "1"

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2", ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=root, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert "OK " in out, f"worker {i} no OK line:\n{out[-4000:]}"

    # Both processes agree on the reduced metric (printed value).
    vals = [o.strip().splitlines()[-1].split()[-1] for o in outs]
    assert vals[0] == vals[1], vals

    # Checkpoint written: step directory exists with orbax content.
    step_dir = os.path.join(ckpt_dir, "1")
    assert os.path.isdir(step_dir), os.listdir(ckpt_dir)
    assert os.listdir(step_dir)
