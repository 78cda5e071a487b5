"""Real multi-process distributed execution: 2 CPU processes joined by
``jax.distributed.initialize`` with gloo TCP collectives, 2 local devices
each → a 4-device global mesh.

This exercises the actual multihost code path (nllstpu.parallel.distributed
+ mesh-sharded assembly + a fully-jitted sharded LM loop) that a TPU pod
uses — the reference has no distributed machinery at all (SURVEY.md §5), and
the single-process virtual-mesh tests cannot catch cross-process issues
(global device_put, process-spanning psum, coordinator handshake)."""

import json
import socket
import subprocess
import sys
import os

import numpy as np

def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_lm():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=repo,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    for o in outs:
        assert o["process_count"] == 2
        assert o["device_count"] == 4
        # psum of per-device ranks 0+1+2+3 across both processes.
        assert o["psum"] == 6.0
        # Sharded assembly over the 2-process mesh reproduces the local cost.
        np.testing.assert_allclose(o["sharded_cost"], o["ref_cost"], rtol=1e-12)
        # The fully-jitted cross-process LM loop descends.
        assert o["best"] < 0.01 * o["start"], (o["start"], o["best"])
        # Landmark-sharded optimize_sharded (direct + implicit) across the
        # 2-process mesh reproduces the single-process optimum (VERDICT r3
        # item 6: this path's axis_index slicing and global device_puts
        # had never crossed a process boundary).
        np.testing.assert_allclose(
            o["lmshard_direct_start"], o["ref_cost"], rtol=1e-12
        )
        np.testing.assert_allclose(
            o["lmshard_direct_best"], o["ref_best"], rtol=1e-9
        )
        np.testing.assert_allclose(
            o["lmshard_implicit_best"], o["ref_best"], rtol=1e-7
        )
    # Both processes agree bitwise on the replicated results.
    assert outs[0]["best"] == outs[1]["best"]
    assert outs[0]["sharded_cost"] == outs[1]["sharded_cost"]
    assert outs[0]["lmshard_direct_best"] == outs[1]["lmshard_direct_best"]
    assert outs[0]["lmshard_implicit_best"] == outs[1]["lmshard_implicit_best"]
