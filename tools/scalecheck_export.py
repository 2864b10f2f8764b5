"""Export scale-correctness evidence into a COMMITTED artifact.

Round 9's lesson: the sf5 soak verdicts lived only in the gitignored
`.scale/_soak/` scratch dir and were wiped when the datasets were
regenerated — the round's strongest correctness evidence became
unverifiable prose. This tool snapshots the soak oracle verdicts (and
any extra labeled JSON fragments, e.g. the forced-fallback equivalence
results) into one repo-root SCALECHECK_r{N}.json that gets committed
alongside BENCH_*/CORRECTNESS_*.

Usage:
  python tools/scalecheck_export.py OUT.json SF_DIR [SF_DIR ...] \
      [label=path/to/fragment.json ...]

Each SF_DIR contributes `.scale/_soak/{name}/oracle_results.json`
(written incrementally by soak_check's oracle phase); each label=path
pair embeds that JSON under "extra"/label.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def main() -> int:
    out_path = sys.argv[1]
    sf_dirs = [a for a in sys.argv[2:] if "=" not in a]
    extras = [a.split("=", 1) for a in sys.argv[2:] if "=" in a]

    artifact: dict = {
        "git_head": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd="/root/repo",
        ).stdout.strip(),
        "generated_unix": int(time.time()),
        "soak": {},
        "extra": {},
    }
    for sf_dir in sf_dirs:
        name = os.path.basename(os.path.normpath(sf_dir))
        res_path = os.path.join("/root/repo/.scale/_soak", name, "oracle_results.json")
        if not os.path.exists(res_path):
            print(f"missing {res_path}", file=sys.stderr)
            return 1
        # the soak flushes one JSON LINE per verdict (append-only, survives
        # kills); a rerun appends a newer line — keep the LATEST per query
        results: dict = {}
        with open(res_path) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if "query" in rec:
                    q = rec.pop("query")
                    results[q] = rec
                else:  # pre-r9 blob format
                    results.update(rec.get("results", {}))
        counts = {"ok": 0, "rows-only": 0, "fail": 0}
        for rec in results.values():
            counts[rec.get("status", "fail")] = counts.get(rec.get("status", "fail"), 0) + 1
        artifact["soak"][name] = {
            "source": f"tools/soak_check.py {sf_dir} oracle",
            "counts": counts,
            "results": results,
        }
        print(f"# {name}: {counts}", file=sys.stderr)
    for label, path in extras:
        artifact["extra"][label] = json.load(open(path))
        print(f"# extra {label} <- {path}", file=sys.stderr)

    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    n_fail = sum(v["counts"].get("fail", 0) for v in artifact["soak"].values())
    print(json.dumps({"out": out_path, "fail": n_fail}))
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
