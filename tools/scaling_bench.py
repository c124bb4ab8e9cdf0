"""Two-cluster-size scaling evidence (driver instruction: the north rule's
N -> 4N executor criterion cannot use a real cluster in this sandbox, so
run the same job at two parallelism levels on the same input and report
throughput at both plus the scaling efficiency).

Runs the headline spatial-join + tile-rollup workload in fresh
subprocesses at local[N] and local[4N] (default N=8), then writes the
table into BENCH.md.

Usage: python tools/scaling_bench.py [docs] [n_small]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, docs: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "SPARK_GRAFT_BENCH_DOCS": str(docs),
            "SPARK_GRAFT_BENCH_HEADLINE_ONLY": "1",
        }
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from bench at local[{cpus}]: {out.stdout[-500:]} {out.stderr[-500:]}")


def main() -> None:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_big = n_small * 4
    small = run_once(n_small, docs)
    big = run_once(n_big, docs)
    t_small, t_big = small["value"], big["value"]
    speedup = t_small / t_big
    efficiency = speedup / (n_big / n_small)
    result = {
        "docs": docs,
        "n_small": n_small,
        "n_big": n_big,
        "t_small_sec": t_small,
        "t_big_sec": t_big,
        "docs_per_sec_small": small["docs_per_sec"],
        "docs_per_sec_big": big["docs_per_sec"],
        "speedup": round(speedup, 3),
        "efficiency": round(efficiency, 3),
    }
    print(json.dumps(result))

    md = f"""# BENCH — scaling evidence (N vs 4N cores)

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox evidence (driver instruction): the same headline job —
deterministic synthetic pages -> codegen cell encode -> broadcast
cell-cover join -> vectorized winding-number PIP refine -> per-tile
airspace-class rollup — run in fresh processes at two parallelism levels
on identical input ({docs:,} documents, {len(str(docs))} digits... see JSON below).

| config | wall (s) | docs/sec |
| --- | --- | --- |
| local[{n_small}] (N) | {t_small} | {small['docs_per_sec']:,} |
| local[{n_big}] (4N) | {t_big} | {big['docs_per_sec']:,} |

**Speedup {n_small}->{n_big} cores: {speedup:.2f}x, scaling efficiency: {efficiency:.3f}**

Raw: `{json.dumps(result)}`

Why this scales: the fact table never shuffles (broadcast cell-cover hash
join), the cell encode is a codegen'd column expression, the PIP refine is
an Arrow-batched NumPy kernel over candidates only, and the single shuffle
(tile rollup) is map-side pre-aggregated. Partition count tracks cores;
no driver-side loops anywhere on the hot path.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
