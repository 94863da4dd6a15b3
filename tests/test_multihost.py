"""2-process multi-host test: `jax.distributed.initialize` over a local TCP
coordinator joins two 4-device CPU processes into one 8-device system, and
the shard_map'd TP forward runs across the process boundary, matching the
single-device oracle (SURVEY.md §2.3 multi-host row; the reference is
single-process single-GPU and has no counterpart).

TCP here stands in for DCN; on a real pod slice the identical code path is
parallel.init_multihost -> make_mesh -> tp_forward_fn.
"""

import os
import socket
import subprocess
import sys

import pytest

# multi-second scan/compile tests: deselect with -m 'not slow' (<2min fast path)
pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_tp_forward():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS",)}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n---\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
        assert "MULTIHOST_ENGINE_OK" in out, out
        assert "MULTIHOST_FEATURES_OK" in out, out
        assert "MULTIHOST_HTTP_OK" in out, out
