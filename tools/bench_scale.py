"""Trendable scale-bench harness: N COLD-SESSION reps of bench.py (one
subprocess = one fresh JVM per rep) at a given sf dir, merged into the
committed BENCH_sf{N}_r{NN}.json artifact format.

Why cold sessions: a single shared session lets an expensive query's
cache/shuffle residue inflate its successors (round 8 measured 2×
contention on queries that happened to follow the LSH audits), and the
round-over-round artifacts must be comparable run-to-run. "min of reps"
is reported per query — the minimum is the least-contended observation
of a deterministic computation.

Why this is a TOOL and not round prose: round 9's headline perf fixes
landed AFTER its bench artifacts were written, so the committed numbers
contradicted the closing tree. Producing the artifact via one command
makes "re-bench after the last perf commit" a one-liner.

Usage:
  python tools/bench_scale.py SF_DIR OUT.json [reps] [skip1,skip2,...]

Env knobs forwarded per the documented scale settings (PROGRESS.md):
  SPARK_DRIVER_MEMORY      default 48g (execution pool for 32 verify tasks)
  SPARK_SHUFFLE_PARTITIONS default 96 at sf1 / pass 320 for sf5
are taken from the environment if set, else defaulted here by sf.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    skip = sys.argv[4] if len(sys.argv) > 4 else ""
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "48g")
    env.setdefault("SPARK_SHUFFLE_PARTITIONS", "320" if sf >= 5 else "96")
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_REPS"] = "1"
    if skip:
        env["SPARK_GRAFT_BENCH_SKIP"] = skip

    rep_payloads = []
    loads = []
    for i in range(reps):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "/root/repo/bench.py"],
            capture_output=True,
            text=True,
            env=env,
            cwd="/root/repo",
        )
        wall = time.time() - t0
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            print(f"rep{i + 1}: bench.py rc={proc.returncode}", file=sys.stderr)
            return 1
        line = proc.stdout.strip().splitlines()[-1]
        payload = json.loads(line)
        rep_payloads.append(payload)
        loads.append(payload.get("load_avg"))
        print(
            f"# rep{i + 1}/{reps}: suite {payload['value']}s "
            f"(subprocess wall {wall:.0f}s, load {payload.get('load_avg')})",
            file=sys.stderr,
        )

    names = list(rep_payloads[0]["queries"])
    query_runs = {
        n: [p["queries"][n] for p in rep_payloads] for n in names
    }
    queries = {n: min(rs) for n, rs in query_runs.items()}
    totals = [p["value"] for p in rep_payloads]
    artifact = {
        "metric": "headline_suite_runtime",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "query_runs": query_runs,
        "reps": reps,
        "rep_mode": (
            f"min of {reps} COLD-SESSION reps (one bench.py subprocess per "
            f"rep, fresh JVM); per-rep totals: "
            + " / ".join(str(t) for t in totals)
            + " sec"
        ),
        "load_avg": loads,
        "sf": sf,
        "env": {
            k: env[k]
            for k in (
                "SPARK_DRIVER_MEMORY",
                "SPARK_SHUFFLE_PARTITIONS",
                "SPARK_GRAFT_BENCH_SKIP",
            )
            if k in env
        },
        "git_head": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            cwd="/root/repo",
        ).stdout.strip(),
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({k: artifact[k] for k in ("value", "sf", "reps", "git_head")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
