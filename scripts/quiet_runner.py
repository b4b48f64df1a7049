"""Launch a measurement command when the host goes quiet.

Rounds 3-5 each burned protocol rep budgets on steal-saturated windows
and retried by hand; this waits for a genuinely quiet window instead:
the accumulated vCPU-steal rate must stay below --rate (steal seconds
per wall second, whole host) for --window consecutive seconds, AND the
fixed-work CPU probe (calib.py) must read within --calib-ratio of the
box's min-ever reference (steal only sees runnable-time theft; round 6
hit a 5.9 s-steal window where every stage ran ~1.22x baseline), then
the given command runs.  Exits 75 (EX_TEMPFAIL) if no quiet window
opens within --timeout, so callers can distinguish "never ran" from the
command's own status.

Usage:
  python scripts/quiet_runner.py [--rate 0.02] [--window 120]
      [--calib-ratio 1.1] [--timeout 14400] -- <command...>
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time

import calib


def steal_s() -> float:
    import os
    return int(open("/proc/stat").readline().split()[8]) / os.sysconf(
        "SC_CLK_TCK")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=0.02,
                    help="max steal seconds per wall second (whole host)")
    ap.add_argument("--window", type=float, default=120,
                    help="seconds the rate must hold before launching")
    ap.add_argument("--calib-ratio", type=float, default=1.1,
                    help="max fixed-work probe time vs the min-ever "
                         "reference (catches cycle-slowing interference "
                         "the steal counter can't see)")
    ap.add_argument("--timeout", type=float, default=14400)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to run")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use -- <command...>)")

    POLL = 15.0
    t_end = time.time() + args.timeout
    quiet_since = None
    s_prev, t_prev = steal_s(), time.time()
    while time.time() < t_end:
        time.sleep(POLL)
        s_now, t_now = steal_s(), time.time()
        rate = (s_now - s_prev) / (t_now - t_prev)
        s_prev, t_prev = s_now, t_now
        if rate < args.rate:
            quiet_since = quiet_since or t_now
            if t_now - quiet_since >= args.window:
                # steal says quiet — confirm cycles are actually healthy
                # before launching (probe ~0.7 s; ratio None = no
                # reference yet, nothing to compare to -> pass)
                c = calib.cpu_calib_s()
                ratio = calib.degradation(c, calib.update_ref(c))
                if ratio is not None and ratio > args.calib_ratio:
                    quiet_since = None
                    print(f"[quiet_runner] steal-quiet but degraded: "
                          f"probe {ratio:.3f}x reference", flush=True)
                    continue
                print(f"[quiet_runner] window open (rate {rate:.3f} s/s "
                      f"for {t_now - quiet_since:.0f} s, probe "
                      f"{'n/a' if ratio is None else ratio}) — launching",
                      flush=True)
                return subprocess.run(cmd).returncode
        else:
            quiet_since = None
            print(f"[quiet_runner] noisy: {rate:.3f} steal-s/s", flush=True)
    print("[quiet_runner] no quiet window within timeout", flush=True)
    return 75


if __name__ == "__main__":
    sys.exit(main())
