"""Query CLI — run any registry query by name, or ad-hoc SQL over the
fixture tables, from the command line (the user-facing entry a
reference operator would use instead of the HTTP endpoints; the
analytics analog of tools/admin.py's control-plane verbs).

Usage:
  python tools/query.py <name> [--sf DIR] [--limit N] [--fmt csv|json]
  python tools/query.py --sql "SELECT ... FROM lineitem ..." [...]
  python tools/query.py --list [pattern]
  python tools/query.py <name> --explain       # formatted physical plan

SQL mode registers the ten fixture tables (region nation customer
supplier part orders lineitem events documents embeddings) as temp
views, so any spark.sql statement over them works — the engine's whole
declarative surface is available without writing Python.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _emit(df, fmt: str, limit: int, out=None) -> int:
    out = out or sys.stdout  # resolve late: tests swap sys.stdout
    rows = df.limit(limit).collect() if limit else df.collect()
    cols = df.columns
    if fmt == "json":
        for r in rows:
            out.write(json.dumps(
                {c: _jsonable(r[c]) for c in cols}, default=str) + "\n")
    else:
        out.write(",".join(cols) + "\n")
        for r in rows:
            out.write(",".join(_csv_cell(r[c]) for c in cols) + "\n")
    return len(rows)


def _jsonable(v):
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v


def _csv_cell(v) -> str:
    s = "" if v is None else str(v)
    if "," in s or '"' in s or "\n" in s:
        s = '"' + s.replace('"', '""') + '"'
    return s


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="registry query name")
    ap.add_argument("--sql", help="ad-hoc SQL over the fixture views")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--limit", type=int, default=0,
                    help="cap output rows (0 = all)")
    ap.add_argument("--fmt", choices=["csv", "json"], default="csv")
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead")
    ap.add_argument("--list", dest="list_pat", nargs="?", const="",
                    default=None, help="list registry query names")
    args = ap.parse_args(argv)

    from storagetapper_spark.plans.registry import QUERIES

    if args.list_pat is not None:
        for n in sorted(QUERIES):
            if args.list_pat in n:
                print(n)
        return 0

    from storagetapper_spark.session import get_spark
    spark = get_spark("query-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.sql:
        from storagetapper_spark.plans.common import t as load
        for tb in TABLES:
            if os.path.exists(os.path.join(args.sf, f"{tb}.parquet")):
                load(spark, args.sf, tb).createOrReplaceTempView(tb)
        df = spark.sql(args.sql)
    elif args.name:
        if args.name not in QUERIES:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        df = QUERIES[args.name](spark, args.sf)
    else:
        ap.print_usage(sys.stderr)
        return 2

    if args.explain:
        df.explain(mode="formatted")
        return 0
    n = _emit(df, args.fmt, args.limit)
    print(f"# {n} rows", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
