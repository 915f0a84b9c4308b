#!/usr/bin/env python
"""Standing full-registry parity sweep at an arbitrary SF (round 11).

The sf0.01 suite gate catches most classes, but some only trigger when
TIE DENSITY or VALUE ENVELOPES grow with the data. The first sf0.1 run
of this sweep caught `latest_line_status`'s underdetermined oracle
(duplicate (orderkey, shipdate, linenumber) rows with differing status
— 42 tied groups at sf0.1 vs 5 at sf0.01, where DuckDB's arbitrary tie
order happened to match Spark's struct-sort max).

A small set of oracles is excluded with printed reasons: brute-force
verification shapes that are quadratic/cubic BY DESIGN (meant for
sf<=0.01 — the operators themselves are bucketed/banded and scale
fine; it is only their O(n^2)/O(n^3) ORACLES that do not), and the
pure-Python codec decoders (minutes per 100k-doc corpus). Their
correctness is pinned at sf0.001/0.01 by the suite gate.

Usage:
    python tools/sf_sweep.py                    # sf0.1
    python tools/sf_sweep.py --sf-dir /root/testdata/sf0.01

Prints one line per query and exits nonzero on any mismatch. Add the
result to the round's NOTES verification matrix.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# oracles excluded at large SF, with reasons (see module docstring)
SKIP: dict[str, str] = {
    "ngram_jaccard_dups": "O(n^2) all-pairs shingle-set oracle",
    "dedup_components": "recursive CTE over the O(n^2) pair join",
    "near_dedup_corpus": "recursive CTE over the O(n^2) pair join",
    "leakage_safe_splits": "recursive CTE over the O(n^2) pair join",
    "corpus_curation_pipeline": "recursive CTE over the O(n^2) pair join",
    "species_range_hull_exact": "O(n^3) edge-characterization oracle",
    "semantic_dedup_corpus": "recursive CTE over candidate pair join",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="*", help="subset to run (default: all)")
    args = ap.parse_args()

    from biodiversity_data_ingestion_spark.plans.queries import QUERIES
    from biodiversity_data_ingestion_spark.session import get_spark
    from oracle_harness import compare, duckdb_con

    skip = dict(SKIP)
    for n in QUERIES:
        if "decode" in n or "multimodal" in n:
            skip.setdefault(n, "pure-Python codec decode cost at this SF")

    names = args.queries or sorted(QUERIES)
    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(args.sf_dir)
    bad, ran = [], 0
    for n in names:
        spec = QUERIES[n]
        if not spec["oracle"]:
            continue
        if n in skip and not args.queries:
            print(f"SKIP {n}: {skip[n]}", flush=True)
            continue
        t0 = time.time()
        try:
            r = compare(n, spec["builder"](spark, args.sf_dir), con, spec["oracle"])
            ok, prob = r.ok, r.problems[:2]
        except Exception as e:  # oracle/builder blew up — that IS a failure
            ok, prob = False, [repr(e)[:200]]
        ran += 1
        print(f"{'OK ' if ok else 'BAD'} {n} ({time.time() - t0:.1f}s)", flush=True)
        if not ok:
            bad.append((n, prob))
    print(f"DONE ran={ran} skipped={len(skip) if not args.queries else 0} "
          f"MISMATCHES: {bad or 'none'}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
