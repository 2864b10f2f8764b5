"""Mixed-script corpus check: exercise the non-ASCII codepoint branch of the
text/dedup pipelines END-TO-END against the DuckDB oracles.

The driver testdata's documents table is 100% ASCII, so the shingle
pipelines' codepoint branch (`dedup.py` splits each corpus into an ASCII
byte-slice side and a non-ASCII codepoint side and unions them) is covered
only by unit-scale differentials. This tool builds an sf0.01-shaped corpus
whose text spans Latin, Cyrillic, Greek, CJK, accented Latin, Arabic and
emoji — including planted near-duplicate pairs that CROSS the branch seam
(an ASCII doc whose twin gained one CJK token lands the pair with one doc
on each side of the filtered union) — then runs every documents-family
contract query through tools/selfcheck.py on it.

Every other table is the real driver sf0.01 parquet (hard links), so the
full selfcheck machinery (all-views registration, typed compare) runs
unchanged; only documents is swapped.

Usage: python tools/mixed_corpus_check.py [OUT.json]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"
OUT_DIR = "/root/repo/.scale/mixed001"

# per-script token pools (deterministic literals, no external data)
ASCII = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "join", "query", "batch", "window", "spark", "order", "data",
    "column", "small", "line", "customer", "filter", "the", "a",
]
CYRILLIC = ["ключ", "строка", "таблица", "запрос", "данные", "окно",
            "быстро", "медленно", "фильтр", "значение", "поток", "союз"]
GREEK = ["κλειδί", "γραμμή", "πίνακας", "ερώτημα", "δεδομένα", "παράθυρο",
         "γρήγορα", "αργά", "φίλτρο", "τιμή"]
CJK = ["键值", "行扫描", "数据表", "查询计划", "窗口函数", "快速", "缓慢",
       "过滤器", "分区", "聚合", "广播", "洗牌"]
ACCENT = ["clé", "requête", "tableau", "données", "fenêtre", "rápido",
          "lento", "filtração", "参照", "naïve", "façade", "über"]
ARABIC = ["مفتاح", "صف", "جدول", "استعلام", "بيانات", "نافذة", "سريع"]
EMOJI = ["🔥", "🚀", "📊", "🧮", "✨"]

PROFILES = [
    ("ascii", ASCII, 0.40),
    ("cyrillic", CYRILLIC + ASCII[:6], 0.14),
    ("greek", GREEK + ASCII[:4], 0.10),
    ("cjk", CJK, 0.12),
    ("accent", ACCENT + ASCII[:8], 0.12),
    ("arabic", ARABIC + ASCII[:4], 0.06),
    ("mixed", ASCII + CJK + CYRILLIC + EMOJI, 0.06),
]
LANG = {"ascii": "en", "cyrillic": "ru", "greek": "el", "cjk": "zh",
        "accent": "fr", "arabic": "ar", "mixed": "en"}

# documents-family contract queries (everything whose input is the
# documents table and whose oracle is exact SQL)
QUERIES = [
    "dedup_exact", "dedup_minhash", "dedup_minhash_fallback",
    "dedup_components", "dedup_keep", "leak_split", "ngram_jaccard",
    "simhash", "simhash_neardup", "minhash_cap_audit",
    "text_stats", "text_quality", "corpus_curate", "boilerplate_rm",
    "lang_id", "doc_fingerprint", "repetition_stats", "decontaminate",
    "lm_score", "winnow_fp", "top_keywords", "pii_scrub", "pack_chunks",
]


def build_corpus(seed: int = 31) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n_doc = 500
    names = [p[0] for p in PROFILES]
    weights = np.array([p[2] for p in PROFILES])
    pools = {p[0]: p[1] for p in PROFILES}
    profs = rng.choice(names, n_doc, p=weights / weights.sum())
    texts, langs = [], []
    for i in range(n_doc):
        pool = pools[profs[i]]
        n_tok = int(rng.integers(15, 100))
        texts.append(" ".join(rng.choice(pool, n_tok)))
        langs.append(LANG[profs[i]])
    # plant near-duplicates, same density as the driver generator (~5%):
    # every 20th doc is a one-token edit of doc i-7. Replacement token is
    # drawn from the SOURCE doc's own script half the time and from CJK the
    # other half — the latter flips an ASCII doc onto the codepoint side,
    # so its pair spans the filtered-union seam.
    for i in range(20, n_doc, 20):
        toks = texts[i - 7].split()
        j = int(rng.integers(0, len(toks)))
        if i % 40 == 0:
            toks[j] = str(rng.choice(CJK))
        else:
            toks[j] = str(rng.choice(pools[profs[i - 7]]))
        texts[i] = " ".join(toks)
        langs[i] = langs[i - 7]
    return pd.DataFrame(
        {
            "doc_id": range(n_doc),
            "text": texts,
            "lang": langs,
            "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_doc)],
            "n_chars": [len(t) for t in texts],
        }
    )


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/mixed_corpus_check.json"

    shutil.rmtree(OUT_DIR, ignore_errors=True)
    os.makedirs(OUT_DIR)
    for f in os.listdir(SRC):
        if f != "documents.parquet" and f.endswith(".parquet"):
            os.link(os.path.join(SRC, f), os.path.join(OUT_DIR, f))
    docs = build_corpus()
    n_nonascii = int(sum(len(t) != len(t.encode()) for t in docs["text"]))
    pq.write_table(
        pa.Table.from_pandas(
            docs,
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                    ("source", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
            preserve_index=False,
        ),
        os.path.join(OUT_DIR, "documents.parquet"),
    )
    print(f"# corpus: {len(docs)} docs, {n_nonascii} non-ASCII "
          f"({100 * n_nonascii / len(docs):.0f}%)")

    proc = subprocess.run(
        [sys.executable, "tools/selfcheck.py", OUT_DIR, *QUERIES],
        cwd="/root/repo", capture_output=True, text=True, timeout=3600,
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-4000:])

    results = {}
    for line in proc.stdout.splitlines():
        # selfcheck prints "[OK]   <query>: ..." / "[FAIL] <query>: ..."
        for q in QUERIES:
            if f" {q}:" in line and line.lstrip().startswith("["):
                results[q] = line.strip()
    artifact = {
        "corpus": {"n_docs": len(docs), "n_nonascii_docs": n_nonascii,
                   "seed": 31, "scripts": [p[0] for p in PROFILES]},
        "queries": QUERIES,
        "selfcheck_exit": proc.returncode,
        "lines": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({"out": out_path, "exit": proc.returncode}))
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
