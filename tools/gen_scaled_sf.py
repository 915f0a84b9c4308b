#!/usr/bin/env python
"""Generate a FACTOR-x shifted-copy scale dataset from a real sf dir
(r15 scaling leg — VERDICT r14 "Next round" #2).

At sf0.1 every bench query is fixed-overhead-bound: the r14 8-vs-32-core
profile read ~1.0 everywhere, so exchange-elimination wins (whose payoff
grows with data) were invisible as wall-clock. This tool builds the
larger-SF substrate: each table becomes ``factor`` disjoint copies of
the source rows with every JOIN-KEY DOMAIN shifted by one coherent
offset per copy, so

- every FK join (orders<->lineitem on orderkey, lineitem<->part on
  partkey, orders<->customer on custkey, ...) still matches exactly as
  at 1x — copy i of lineitem joins copy i of orders;
- graph queries see ``factor`` disjoint copies of the 1x graph
  (factor-x nodes AND edges, same degree distribution);
- dims (nation/region) and non-key values (prices, dates, text) are
  untouched, so the data stays TPC-H-ish.

Unlike tools/scale_probe.py (which shifts ONE table per query for
oracle-envelope checks), offsets here are computed once per KEY DOMAIN
from the global max across all tables sharing the domain — shifting
tables independently would break every join between them.

Caveat recorded for the doc/embedding tables: text/vector PAYLOADS are
copied verbatim, so near-dup queries see every doc 10x-duplicated
(clusters of ``factor``) — a valid perf stress, not a statistics match.

Usage:
    python tools/gen_scaled_sf.py [--factor 10] [--src /root/testdata/sf0.1] \
        [--dest /root/testdata_sf1]

Writes one parquet per table into --dest (refuses to overwrite a
non-empty dir unless --force). Perf tooling only — never used by the
bench/oracle contract paths, which read $SPARK_GRAFT_SF_DIR untouched.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import duckdb

# key domain -> [(table, column), ...]; offset = max over all listed
# columns + 1, applied to every listed column in every copy
KEY_DOMAINS: dict[str, list[tuple[str, str]]] = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
}

# tables copied verbatim (pure dims; their keys appear as VALUES in the
# fact tables and are deliberately not scaled)
VERBATIM = ("nation", "region")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default="/root/testdata_sf1")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    src = os.path.abspath(args.src)
    dest = os.path.abspath(args.dest)
    if os.path.isdir(dest) and os.listdir(dest) and not args.force:
        print(f"dest {dest} exists and is non-empty (use --force)", file=sys.stderr)
        return 2
    os.makedirs(dest, exist_ok=True)

    con = duckdb.connect()
    tables = sorted(
        os.path.basename(p)[: -len(".parquet")]
        for p in glob.glob(os.path.join(src, "*.parquet"))
    )

    # one offset per key domain: global max over every column in the
    # domain, so e.g. o_orderkey and l_orderkey shift identically
    offsets: dict[str, int] = {}
    for dom, cols in KEY_DOMAINS.items():
        mx = 0
        for t, c in cols:
            p = os.path.join(src, f"{t}.parquet")
            if not os.path.exists(p):
                continue
            v = con.execute(f"SELECT max({c}) FROM '{p}'").fetchone()[0]
            mx = max(mx, int(v) if v is not None else 0)
        offsets[dom] = mx + 1
    shift_of: dict[tuple[str, str], int] = {
        (t, c): offsets[dom]
        for dom, cols in KEY_DOMAINS.items()
        for t, c in cols
    }

    for t in tables:
        p = os.path.join(src, f"{t}.parquet")
        out = os.path.join(dest, f"{t}.parquet")
        if t in VERBATIM:
            con.execute(f"COPY (SELECT * FROM '{p}') TO '{out}' (FORMAT parquet)")
            print(f"{t}: verbatim")
            continue
        cols = con.execute(f"DESCRIBE SELECT * FROM '{p}'").fetchall()
        sel = ", ".join(
            f"CAST({name} + i * {shift_of[(t, name)]} AS {typ}) AS {name}"
            if (t, name) in shift_of
            else name
            for name, typ, *_ in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{p}', range({args.factor}) r(i)) "
            f"TO '{out}' (FORMAT parquet)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{t}: {n} rows ({args.factor}x)")
    con.close()
    print(f"done -> {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
