#!/usr/bin/env python
"""Stall watchdog + auto-restart for long training runs.

Reference analog: the reference has none — its trainers are foreground
PyTorch loops restarted by hand (e.g. train_nerfact_multi_kitchen.py's
comment-driven resume). On a remote-device link a hung RPC freezes the
host loop silently (observed: a device fetch futex-waiting forever while
the step log went stale), so framework-level failure recovery is:
detect staleness of the run's progress file, kill the wedged process
group, restart the command — which resumes from the latest checkpoint
(Trainer.run(resume=True) is the default in every driver).

Usage:
  python scripts/supervise.py --log run.log --stale-secs 600 \
      [--max-restarts 10] -- python scripts/train_nerfact.py ...

The child's stdout/stderr are appended to --log, which doubles as the
liveness signal (trainers print every log_every steps). Exits with the
child's code when it terminates on its own; restarts it only on stall.
"""
import argparse
import os
import signal
import subprocess
import sys
import time


def _live_writer(cmd):
    """Pid of another live process already writing the same run, else None.

    Two trainers saving into one --ckpt-dir interleave checkpoint steps
    and silently corrupt the resume lineage, so startup refuses when any
    other process's cmdline carries the same --ckpt-dir (or --log) value.
    Detection only — never kills anything.
    """
    marks = set()
    for flag in ("--ckpt-dir", "--log"):
        if flag in cmd:
            i = cmd.index(flag)
            if i + 1 < len(cmd):
                marks.add((flag, os.path.abspath(cmd[i + 1])))
    if not marks:
        return None
    me = os.getpid()
    for pid_dir in os.listdir("/proc"):
        if not pid_dir.isdigit() or int(pid_dir) == me:
            continue
        try:
            with open(f"/proc/{pid_dir}/cmdline", "rb") as f:
                argv = f.read().decode(errors="replace").split("\0")
        except OSError:
            continue
        for flag, val in marks:
            if flag in argv:
                j = argv.index(flag)
                if (j + 1 < len(argv)
                        and os.path.abspath(argv[j + 1]) == val):
                    return int(pid_dir)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True, help="append child output here; "
                    "its mtime is the liveness signal")
    ap.add_argument("--stale-secs", type=float, default=600.0)
    ap.add_argument("--startup-grace-secs", type=float, default=3600.0,
                    help="staleness allowance for this long after each "
                         "(re)start: a cold compile cache can hold the "
                         "trainer silent for 30-60 min (remote compile "
                         "service) after its startup banner, which is "
                         "liveness, not a stall")
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--poll-secs", type=float, default=30.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to run")
    ap.add_argument("--force", action="store_true",
                    help="skip the live-writer guard")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use -- cmd ...)")

    if not args.force:
        clash = _live_writer(cmd)
        if clash:
            print(f"[supervise] REFUSING to start: pid {clash} already "
                  "trains into the same --ckpt-dir/--log (two writers "
                  "interleave checkpoints and clobber each other's "
                  "lineage — observed round 5 after a session restart "
                  "raced a live run). Kill it or pass --force.",
                  file=sys.stderr)
            return 2

    restarts = 0
    while True:
        with open(args.log, "ab", buffering=0) as logf:
            logf.write(f"[supervise] start (restart {restarts}): "
                       f"{' '.join(cmd)}\n".encode())
            # own process group so a wedged child's threads die with it
            child = subprocess.Popen(cmd, stdout=logf, stderr=logf,
                                     start_new_session=True)
            print(f"[supervise] child pid {child.pid}", flush=True)
            started_at = time.time()
            while True:
                rc = child.poll()
                if rc is not None:
                    if rc == 0:
                        print("[supervise] child finished cleanly")
                        return 0
                    print(f"[supervise] child exited rc={rc}; restarting")
                    break
                age = time.time() - os.stat(args.log).st_mtime
                in_grace = time.time() - started_at < args.startup_grace_secs
                limit = (max(args.stale_secs, args.startup_grace_secs)
                         if in_grace else args.stale_secs)
                if age > limit:
                    print(f"[supervise] log stale {age:.0f}s > "
                          f"{limit:.0f}s; killing process group")
                    logf.write(f"[supervise] stall detected ({age:.0f}s "
                               f"stale); killing\n".encode())
                    try:
                        os.killpg(child.pid, signal.SIGTERM)
                        time.sleep(5)
                        if child.poll() is None:
                            os.killpg(child.pid, signal.SIGKILL)
                    except ProcessLookupError:
                        pass
                    child.wait()
                    break
                time.sleep(args.poll_secs)
        restarts += 1
        if restarts > args.max_restarts:
            print("[supervise] max restarts exceeded", file=sys.stderr)
            return 1
        time.sleep(5)


if __name__ == "__main__":
    sys.exit(main())
