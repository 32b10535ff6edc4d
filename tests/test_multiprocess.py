"""Two-process jax.distributed smoke: initialize() + global_mesh() +
cross-process GSPMD parity (scripts/multiprocess_smoke.py; SURVEY §5.8)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parents[1] / "scripts" / "multiprocess_smoke.py"


@pytest.mark.timeout(300)
def test_two_process_distributed_smoke():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["SMOKE_PORT"] = str(port)
    env.pop("XLA_FLAGS", None)          # workers set their own device count
    out = subprocess.run(
        [sys.executable, str(SCRIPT)], env=env,
        capture_output=True, timeout=280)
    assert out.returncode == 0, out.stdout.decode() + out.stderr.decode()
    assert b"multiprocess_smoke OK" in out.stdout


SERVING = Path(__file__).resolve().parents[1] / "scripts" / "multihost_serving_smoke.py"


@pytest.mark.timeout(600)
def test_two_process_multihost_serving():
    """Lockstep multi-host serving: 2 processes x 4 devices, uneven local
    load, global token parity vs a single-process run, no deadlock
    (engine/multihost.py; VERDICT r4 item 3)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["SMOKE_PORT"] = str(port)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, str(SERVING)], env=env,
        capture_output=True, timeout=580)
    assert out.returncode == 0, out.stdout.decode() + out.stderr.decode()
    assert b"multihost_serving_smoke OK" in out.stdout
