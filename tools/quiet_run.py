"""Quiet-host watcher: wait until the hypervisor is calm, then exec a
command. Encodes the launch gate that actually worked in round 5's skew
campaign (CLAUDE.md): probe /proc/stat steal ticks over a 30 s window and
1-minute loadavg, launch when steal_ticks < 150 AND load < 1.5. The strict
<30-tick gate never fired during a 2 h storm; sample-level quiet flags
(plans/hostnoise.py) remain the real validity check on every measurement —
this gate just avoids PROVABLY bad launch times.

Usage: python tools/quiet_run.py [--max-wait SEC] -- cmd arg...
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

STEAL_TICKS_MAX = 150
LOAD_MAX = 1.5
PROBE_SEC = 30


def steal_ticks() -> int:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    return int(parts[8]) if len(parts) > 8 else 0


def main() -> None:
    argv = sys.argv[1:]
    max_wait = 3600.0
    if argv and argv[0] == "--max-wait":
        max_wait = float(argv[1])
        argv = argv[2:]
    if argv and argv[0] == "--":
        argv = argv[1:]
    if not argv:
        print("usage: quiet_run.py [--max-wait SEC] -- cmd ...", file=sys.stderr)
        sys.exit(2)
    deadline = time.time() + max_wait
    while True:
        load = os.getloadavg()[0]
        if load < LOAD_MAX:
            t0 = steal_ticks()
            time.sleep(PROBE_SEC)
            dt = steal_ticks() - t0
            load = os.getloadavg()[0]
            if dt < STEAL_TICKS_MAX and load < LOAD_MAX:
                print(
                    f"quiet_run: launching (steal {dt} ticks/{PROBE_SEC}s, load {load:.2f})",
                    flush=True,
                )
                sys.exit(subprocess.call(argv))
            print(
                f"quiet_run: not quiet (steal {dt}, load {load:.2f}); waiting",
                flush=True,
            )
        else:
            print(f"quiet_run: load {load:.2f} >= {LOAD_MAX}; waiting", flush=True)
            time.sleep(PROBE_SEC)
        if time.time() > deadline:
            print("quiet_run: max-wait exceeded — launching anyway (samples self-flag)", flush=True)
            sys.exit(subprocess.call(argv))


if __name__ == "__main__":
    main()
