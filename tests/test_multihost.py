"""2-process jax.distributed dryrun: the first *executed* evidence for
the multi-host path (initialize_distributed + a global-mesh train step +
an Orbax sharded save/restore).  Spawns two CPU worker processes that
each contribute 4 virtual devices to one 8-device global mesh
(scripts/multihost_dryrun.py); the gradient all-reduce and the orbax
shard files cross the process boundary.
"""

import json
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


def test_two_process_distributed_dryrun(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # the worker pins the platform itself; scrub any test-harness flags
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    procs = []
    try:
        for pid in range(2):
            procs.append(
                subprocess.Popen(
                    [
                        sys.executable,
                        str(REPO / "scripts" / "multihost_dryrun.py"),
                        "--coordinator", f"localhost:{port}",
                        "--num-processes", "2",
                        "--process-id", str(pid),
                        "--out-dir", str(tmp_path),
                    ],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
            )
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=540)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append(out)
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = []
    for pid in range(2):
        f = tmp_path / f"result_{pid}.json"
        assert f.exists(), outs[pid][-3000:]
        results.append(json.loads(f.read_text()))
    for r in results:
        assert r["ok"]
        assert r["process_count"] == 2
        assert r["global_devices"] == 8
        assert r["local_devices"] == 4
    # both processes computed the same global loss
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-6
