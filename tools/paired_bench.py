#!/usr/bin/env python3
"""Paired same-session bulk-add comparison (VERDICT r5 next-step #1).

Times the REFERENCE engine's SQLite `add` (the workload-defining harness
shape, reference tests/profiling_sqlite.py:174-175: contents/ids/metadata
pre-generated, the timer covers `engine.add` alone) and graft's bulk
`addDf` (the a2_add_bulk timed region, via graft.tools.ProbeAdd) BACK TO
BACK in one session on the same box state, so the 2x-gate ratio is free of
cross-day machine variance. Both sides ingest the SAME ~100k docs: the
sf0.1 documents table replicated under distinct per-copy ids with the
docsFrame metadata shape ({lang, source, n_chars, opt?}).

Writes BENCH_paired_r6.json. Run from /root/repo on an otherwise-idle box:
    python3 tools/paired_bench.py
"""
import json
import os
import re
import subprocess
import sys
import tempfile
import time
import types

SF_DIR = "/root/testdata/sf0.1"
RUNS = 3

# psycopg2 is absent in the sandbox; the SQLite paths never touch it
for name in ("psycopg2", "psycopg2.errors", "psycopg2.extras"):
    mod = types.ModuleType(name)
    sys.modules.setdefault(name, mod)
sys.modules["psycopg2"].errors = sys.modules["psycopg2.errors"]
sys.modules["psycopg2"].extras = sys.modules["psycopg2.extras"]
sys.modules["psycopg2.errors"].UniqueViolation = type("UniqueViolation", (Exception,), {})

sys.path.insert(0, "/root/reference/src")
from sifts.core import Collection  # noqa: E402


def staged_docs():
    import duckdb
    rows = duckdb.connect().execute(
        f"""SELECT CAST(doc_id AS VARCHAR), text, lang, source, n_chars
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    ).fetchall()
    copies = max(1, 100000 // len(rows))
    ids, contents, metas = [], [], []
    for c in range(copies):
        for doc_id, text, lang, source, n_chars in rows:
            ids.append(f"{doc_id}_{c}")
            contents.append(text)
            m = {"lang": lang, "source": source, "n_chars": str(n_chars)}
            if n_chars >= 250:
                m["opt"] = str(n_chars % 7)
            metas.append(m)
    return ids, contents, metas


def time_reference(ids, contents, metas):
    times = []
    for r in range(RUNS):
        tmp = tempfile.mkdtemp(prefix="sifts-paired-")
        engine = Collection(f"sqlite:///{tmp}/db.sqlite", name=f"bulk{r}")
        t0 = time.perf_counter()
        engine.add(contents, ids, metas)
        times.append(round(time.perf_counter() - t0, 3))
        n = engine.count()
        assert n == len(ids), f"reference add landed {n}/{len(ids)} rows"
    return times


def time_graft():
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.tools.ProbeAdd"],
        capture_output=True, text=True, cwd="/root/repo", timeout=1800)
    walls = re.findall(r"round=(\d) addDf wall = ([0-9.]+) s", out.stdout)
    if len(walls) < 2:
        print(out.stdout[-3000:])
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit("ProbeAdd output not parseable")
    return {f"round{r}": float(w) for r, w in walls}


def main():
    os.chdir("/root/repo")
    ids, contents, metas = staged_docs()
    print(f"paired: {len(ids)} docs staged")
    # graft first, then reference, then graft again would triple JVM cost;
    # instead interleave at the session level: reference (warm CPython loop,
    # RUNS fresh DBs) then graft (cold + warm JVM rounds) immediately after.
    ref = time_reference(ids, contents, metas)
    print(f"paired: reference add secs = {ref}")
    graft = time_graft()
    print(f"paired: graft addDf secs = {graft}")
    ref_best = min(ref)
    artifact = {
        "docs": len(ids),
        "reference_sqlite_add_secs": ref,
        "graft_addDf_cold_sec": graft["round1"],
        "graft_addDf_warm_sec": graft["round2"],
        "ratio_cold_vs_ref_best": round(graft["round1"] / ref_best, 2),
        "ratio_warm_vs_ref_best": round(graft["round2"] / ref_best, 2),
        "note": ("same-session paired measurement; reference timer shape = "
                 "profiling_sqlite.py add-documents region; graft timer = "
                 "a2_add_bulk's addDf region (ProbeAdd), cold = first ingest "
                 "in a fresh JVM (the bench a2 runs after a1 warmed the "
                 "ingest paths, so the bench number sits between cold and "
                 "warm)"),
    }
    with open("BENCH_paired_r6.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))


if __name__ == "__main__":
    main()
