"""Stall watchdog (scripts/supervise.py): detect staleness, kill the
process group, restart; exit cleanly with the child."""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_supervise_restarts_stalled_child_then_finishes(tmp_path):
    log = tmp_path / "run.log"
    marker = tmp_path / "attempt"
    # the child stalls forever on its first run and finishes on the second
    child = tmp_path / "child.py"
    child.write_text(f"""
import os, sys, time
m = {str(repr(str(marker)))}
n = int(open(m).read()) if os.path.exists(m) else 0
open(m, "w").write(str(n + 1))
print("hello run", n, flush=True)
if n == 0:
    time.sleep(3600)     # stall: no further log writes
print("done", flush=True)
""")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "supervise.py"),
         "--log", str(log), "--stale-secs", "3", "--poll-secs", "1",
         "--startup-grace-secs", "0", "--max-restarts", "3",
         "--", sys.executable, str(child)],
        capture_output=True, text=True, timeout=600)
    assert p.returncode == 0, p.stdout + p.stderr
    assert open(marker).read() == "2"          # ran twice
    body = log.read_text()
    assert "stall detected" in body
    assert "done" in body
    assert "restart 1" in body


def test_supervise_passes_through_clean_exit(tmp_path):
    log = tmp_path / "run.log"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "supervise.py"),
         "--log", str(log), "--stale-secs", "30", "--",
         sys.executable, "-c", "print('ok')"],
        capture_output=True, text=True, timeout=60)
    assert p.returncode == 0
    assert "ok" in log.read_text()


def test_supervise_refuses_second_writer(tmp_path):
    """Two supervisors on one --ckpt-dir interleave checkpoint lineages
    (observed round 5: a restarted session's run raced the live one and
    its resume collapsed) — startup must refuse while another process
    carries the same --ckpt-dir, and --force must override."""
    log = tmp_path / "run.log"
    ckpt = str(tmp_path / "ckpt")
    holder = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(120)",
         "--ckpt-dir", ckpt])
    try:
        time.sleep(0.5)
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "supervise.py"),
             "--log", str(log), "--stale-secs", "30", "--",
             sys.executable, "-c", "print('ok')", "--ckpt-dir", ckpt],
            capture_output=True, text=True, timeout=60)
        assert p.returncode == 2, p.stdout + p.stderr
        assert "REFUSING" in p.stderr
        forced = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "supervise.py"),
             "--force", "--log", str(log), "--stale-secs", "30", "--",
             sys.executable, "-c", "print('ok')", "--ckpt-dir", ckpt],
            capture_output=True, text=True, timeout=60)
        assert forced.returncode == 0, forced.stdout + forced.stderr
    finally:
        holder.kill()
        holder.wait()
