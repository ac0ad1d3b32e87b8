"""Two-process distributed validation (VERDICT r3 item #7).

Spawns a real ``jax.distributed`` pair — 2 processes x 4 virtual CPU
devices — running tests/dp_val_worker.py: initialize_distributed, a global
8-device mesh, the sharded ``make_dp_eval_step``, host gather, and the
process-0-only evaluation behind a global barrier. This is the reference's
actual deployment topology (src/run.py:84-97 multi-GPU process group;
rank-0 eval behind barriers, src/pipeline.py:315-326), which nothing else
in the suite exercises multi-process.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_validation(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "4"

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(REPO / "tests" / "dp_val_worker.py"),
                f"127.0.0.1:{port}",
                "2",
                str(pid),
                str(tmp_path),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(REPO),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK pid={pid}" in out, out[-2000:]

    # rank 0 — and ONLY rank 0 — wrote the metrics
    metrics = (tmp_path / "metrics.txt").read_text()
    assert metrics.startswith("psnr="), metrics
    val = float(metrics.strip().split("=")[1])
    assert val == val and val > 0, f"non-finite/absurd psnr {val}"
