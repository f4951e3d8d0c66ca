"""Full-registry correctness artifact — the local mirror of the
driver's CORRECTNESS gate, run over EVERY registered query (the
driver samples only a prefix; this closes the visibility gap on the
tail).

Usage:
    python tools/correctness_all.py [--sf-dir /root/testdata/sf0.01] \
        [--out CORRECTNESS_LOCAL_r7.json]

Emits one JSON object in the driver's exact row format:
    {"<query>": {"rows_match": bool, "schema_match": bool,
                 "hash_match": bool, "spark_rows": int,
                 "oracle_rows": int, "err": str|None}, ...}

Rows-only queries (no SQL-expressible oracle) record rows/schema of
the Spark side with oracle_rows == spark_rows and hash_match True by
convention, plus "rows_only": true so the reader can tell the weaker
check apart.

Run from anywhere — the repo path is inserted explicitly (catches
accidental CWD reliance, same as the verify recipe).
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import hashlib
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _canon(v):
    """Engine-neutral value canonicalization (mirrors the driver:
    decimals/floats unify, temporals stringify, arrays recurse)."""
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and format stably
        return repr(v + 0.0)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v


def _row_key(row):
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def _value_hash(rows) -> str:
    h = hashlib.sha256()
    for row in sorted(rows, key=_row_key):
        h.update(repr(row).encode())
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="comma-separated names")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from presto_0_235_spark.queries.registry import all_queries

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        # the sweep runs ~500 queries in ONE JVM; several persist()
        # and never unpersist (per-query hygiene is the registry's
        # concern, not the sweep's), and the unified memory
        # manager's protected storage region accumulates those
        # blocks until a mid-shuffle allocation OOMs (first seen at
        # ~4k stages). Size the heap for the marathon and drop
        # cached blocks between queries.
        .config("spark.driver.memory", "12g")
        .appName("correctness-all")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = all_queries()
    names = (
        [n.strip() for n in args.only.split(",")]
        if args.only
        else list(queries)
    )
    report: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        q = queries[name]
        rec: dict = {
            "rows_match": False, "schema_match": False,
            "hash_match": False, "spark_rows": 0, "oracle_rows": 0,
            "err": None,
        }
        try:
            sdf = q.builder(spark, args.sf_dir)
            scols = sorted(sdf.columns)
            srows = [
                tuple(_canon(r[c]) for c in scols) for r in sdf.collect()
            ]
            rec["spark_rows"] = len(srows)
            if q.oracle is None:
                rec.update(
                    rows_only=True, rows_match=True, schema_match=True,
                    hash_match=True, oracle_rows=len(srows),
                )
            else:
                res = con.execute(q.oracle)
                cols = [d[0] for d in res.description]
                ocols = sorted(cols)
                orows = [
                    tuple(_canon(r[cols.index(c)]) for c in ocols)
                    for r in res.fetchall()
                ]
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = scols == ocols
                rec["hash_match"] = _value_hash(srows) == _value_hash(orows)
        except Exception as ex:  # noqa: BLE001 - report, don't die
            rec["err"] = f"{type(ex).__name__}: {ex}"[:300]
        report[name] = rec
        ok = (
            rec["rows_match"] and rec["schema_match"]
            and rec["hash_match"] and rec["err"] is None
        )
        n_fail += 0 if ok else 1
        print(f"{'ok  ' if ok else 'FAIL'} {name} "
              f"({rec['spark_rows']} rows)", flush=True)
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001 - hygiene only
            pass

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    print(f"total={len(report)} fail={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
