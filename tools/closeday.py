"""One-command round-close scoreboard: run the fast correctness gates in
sequence and write a COMMITTED summary artifact.

Round 9's audit found the round's strongest evidence scattered across ad-hoc
tool runs whose outputs lived in gitignored scratch (and died with the box).
This driver runs the standing gates and snapshots their verdicts into
CLOSEDAY_r{N}.json at the repo root — one command, committed outputs:

  pytest        full unit suite (tests/)
  selfcheck001  all contract queries vs DuckDB oracles at sf0.01
  selfcheck01   same at sf0.1 (the driver's bench SF)
  driver_sim    oracle queries under a VANILLA session (200 shuffle
                partitions, no engine pins) at sf0.01
  mixed_corpus  the 23 documents-family queries on the 61%-non-ASCII corpus

Scale evidence (soak oracle verdicts, forced-fallback equivalence, scale
benches) is produced by tools/soak_check.py + scalecheck_export.py and
tools/bench_scale.py — those run for hours and are sequenced manually; this
driver is the fast (~1h) everything-else gate.

Usage: python tools/closeday.py OUT.json [step ...]
  (default: all steps; name steps to run a subset)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
LOG_DIR = os.path.join(REPO, ".scale", "_closeday")

STEPS: dict[str, list[str]] = {
    "pytest": [sys.executable, "-m", "pytest", "tests/", "-q"],
    "selfcheck001": [sys.executable, "tools/selfcheck.py", "/root/testdata/sf0.01"],
    "selfcheck01": [sys.executable, "tools/selfcheck.py", "/root/testdata/sf0.1"],
    "driver_sim": [sys.executable, "tools/driver_sim_check.py", "/root/testdata/sf0.01"],
    "mixed_corpus": [sys.executable, "tools/mixed_corpus_check.py"],
}

# per-step summary extractors: last meaningful lines of stdout
TAIL_LINES = {"pytest": 3, "selfcheck001": 2, "selfcheck01": 2,
              "driver_sim": 2, "mixed_corpus": 2}


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CLOSEDAY.json"
    only = sys.argv[2:] or list(STEPS)
    os.makedirs(LOG_DIR, exist_ok=True)

    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip()
    artifact: dict = {
        "git_head": head,
        "generated_unix": int(time.time()),
        "steps": {},
    }
    worst = 0
    for name in only:
        cmd = STEPS[name]
        t0 = time.time()
        proc = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=7200,
        )
        wall = time.time() - t0
        log = os.path.join(LOG_DIR, f"{name}.log")
        with open(log, "w") as fh:
            fh.write(proc.stdout)
            fh.write("\n--- stderr ---\n")
            fh.write(proc.stderr[-20000:])
        lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
        artifact["steps"][name] = {
            "cmd": " ".join(cmd),
            "exit": proc.returncode,
            "wall_sec": round(wall, 1),
            "tail": lines[-TAIL_LINES.get(name, 2):],
            "log": log,
        }
        worst = max(worst, proc.returncode)
        print(f"[{name}] exit={proc.returncode} wall={wall:.0f}s "
              f"{lines[-1] if lines else ''}", flush=True)
        # flush the artifact after every step — a mid-run kill keeps evidence
        with open(out_path, "w") as fh:
            json.dump(artifact, fh, indent=1)

    artifact["ok"] = worst == 0
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({"out": out_path, "ok": worst == 0}))
    return worst


if __name__ == "__main__":
    raise SystemExit(main())
