"""Run a long TPU driver under a tunnel-wedge watchdog.

The axon tunnel can wedge a client process indefinitely: either a
stalled ~4 MB socket Send-Q mid-upload or a silent zero-progress hang
(no /proc/<pid>/io movement, low CPU) — observed repeatedly during the
r5 flagship convergence run, roughly every 20-30 min of sustained chip
traffic.  Both long drivers are stage/epoch-resumable by design
(scripts/run_convergence.py resumes from summary.json, the train CLIs
from checkpoints), so the correct remedy is mechanical: detect the
stall, kill the EXACT child pid (never by pattern), wait for the tunnel
service to reap the dead connection, and relaunch.

Stall detector: no growth of /proc/<pid>/io rchar+wchar across
``--stall-secs`` (a healthy run writes logs/checkpoints continuously;
compiles are covered because XLA compilation still reads/writes).

Usage:
  python scripts/watchdog.py [--stall-secs 240] [--max-restarts 10] \
      -- python -u scripts/run_convergence.py --out ... --capstone ...
"""

import argparse
import os
import signal
import subprocess
import sys
import time


def log(m):
    print(f"[watchdog] {m}", flush=True)


def io_bytes(pid):
    try:
        with open(f"/proc/{pid}/io") as f:
            d = dict(line.split(":") for line in f.read().splitlines())
        return int(d["rchar"]) + int(d["wchar"])
    except (OSError, KeyError, ValueError):
        return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stall-secs", type=int, default=240,
                    help="kill after this long with zero io progress")
    ap.add_argument("--poll-secs", type=int, default=15)
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--settle-secs", type=int, default=20,
                    help="wait after a kill so the tunnel service reaps "
                         "the dead connection before the relaunch")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- then the command to run")
    opt = ap.parse_args(argv)
    cmd = opt.cmd[1:] if opt.cmd and opt.cmd[0] == "--" else opt.cmd
    if not cmd:
        ap.error("no command given (use: watchdog.py [opts] -- cmd ...)")

    for attempt in range(opt.max_restarts + 1):
        log(f"launch attempt {attempt + 1}: {' '.join(cmd)}")
        p = subprocess.Popen(cmd)
        last_io, last_change = None, time.time()
        while True:
            try:
                rc = p.wait(timeout=opt.poll_secs)
                if rc == 0:
                    log("command completed cleanly")
                    return 0
                log(f"command exited rc={rc}; restarting")
                break
            except subprocess.TimeoutExpired:
                pass
            now_io = io_bytes(p.pid)
            if now_io is None or now_io != last_io:
                # unreadable /proc io (e.g. hidepid) disables stall
                # detection rather than counting as a stall — never kill
                # a child we cannot observe
                last_io, last_change = now_io, time.time()
            elif time.time() - last_change > opt.stall_secs:
                log(f"io stalled {opt.stall_secs}s (pid {p.pid}); killing")
                p.send_signal(signal.SIGTERM)
                try:
                    p.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    p.kill()
                    p.wait()
                break
        time.sleep(opt.settle_secs)
    log(f"gave up after {opt.max_restarts + 1} attempts")
    return 1


if __name__ == "__main__":
    sys.exit(main())
