"""The quickstart example must actually run (examples rot otherwise)."""

from __future__ import annotations

import subprocess
import sys


def test_quickstart_runs(sf_dir):
    proc = subprocess.run(
        [sys.executable, "examples/quickstart.py", sf_dir],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "write verdict:" in proc.stdout
    assert "read verdict:" in proc.stdout
    assert "near-dup pairs:" in proc.stdout


def test_lakehouse_example_runs():
    proc = subprocess.run(
        [sys.executable, "examples/lakehouse.py"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "merge rewrote 1/" in proc.stdout
    assert "stream rows (after replay): 5" in proc.stdout
    assert "active after review:" in proc.stdout


def test_delta_interop_example_runs():
    proc = subprocess.run(
        [sys.executable, "examples/delta_interop.py"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "txn replay skipped" in proc.stdout
    assert "through format('deltalog')" in proc.stdout
    assert "protocol deletion vectors" in proc.stdout
    assert "status=ok" in proc.stdout
