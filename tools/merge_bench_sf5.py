"""Merge the sf5 bench artifact: min-of-2 cold reps for the standard
headline (bench_scale.py output) plus the four formerly disk-bound
queries' single-cold-session walls from the soak spark phase metas.

The four ran full-strength at sf5 for the first time this round (packed
shingles + hybrid chunk-broadcast verify removed the ENOSPC shuffle);
each wall below was measured in the soak's fresh-JVM quiet-box session —
the same conditions as a bench rep, including the in-session persist-memo
reuse that makes dedup_components/leak_split cheap after dedup_minhash
(bench.py reps behave identically). One rep, labeled as such, rather
than no number at all or a number from a different tree.

Usage: python tools/merge_bench_sf5.py PART.json SOAK_DIR OUT.json
"""

from __future__ import annotations

import json
import os
import sys

FOUR = ["dedup_minhash", "dedup_components", "leak_split", "cosine_neardup"]


def main() -> int:
    part, soak_dir, out = sys.argv[1], sys.argv[2], sys.argv[3]
    art = json.load(open(part))
    singles = {}
    for q in FOUR:
        meta = os.path.join(soak_dir, f"{q}.meta.json")
        singles[q] = json.load(open(meta))["wall_sec"]
    art["queries"].update(singles)
    art["value"] = round(sum(art["queries"].values()), 3)
    art["single_cold_run"] = {
        "queries": singles,
        "note": (
            "first full-strength sf5 runs of the formerly disk-bound four "
            "(r9 skipped them: ENOSPC); walls from one cold fresh-JVM "
            "quiet-box session (soak spark phase), bench-equivalent "
            "conditions incl. in-session persist-memo reuse; the other "
            "41 queries are min of 2 cold-session reps as in r8/r9"
        ),
    }
    art.pop("skipped_disk_bound", None)
    art.pop("skip_note", None)
    with open(out, "w") as fh:
        json.dump(art, fh, indent=1)
    print(json.dumps({"value": art["value"], "n_queries": len(art["queries"])}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
