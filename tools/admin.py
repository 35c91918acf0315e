"""Control-plane CLI — the reference's HTTP admin API (server/table.go,
server/schema.go, server/cluster.go) re-expressed as a command-line tool
over the file-backed Registry (a Spark job has no long-lived HTTP
server; the registry file IS the shared state the reference keeps in its
state DB).

Verbs mirror the REST endpoints:

  table add     POST /table   — register (service, cluster, db, table, pks)
  table del     DELETE /table — deregister
  table list    GET /table    — list registrations (optional filters)
  schema get    GET /schema   — current schema version for a table
  schema set    POST /schema  — record a new schema version
  due           (cron helper) — tables whose snapshot interval elapsed

Usage: python tools/admin.py <registry.json> table add --service s \
           --cluster c --db d --table t --pk id [--pk id2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from storagetapper_spark.state import Registry, TableRegistration  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="admin")
    p.add_argument("registry", help="path to the registry JSON file")
    sub = p.add_subparsers(dest="cmd", required=True)

    t_add = sub.add_parser("table-add")
    for a in ("service", "cluster", "db", "table"):
        t_add.add_argument(f"--{a}", required=True)
    t_add.add_argument("--pk", action="append", required=True,
                       dest="pks", metavar="COL")
    t_add.add_argument("--snapshot-interval-sec", type=int, default=None)

    t_del = sub.add_parser("table-del")
    t_del.add_argument("key")

    t_list = sub.add_parser("table-list")
    t_list.add_argument("--service", default=None)
    t_list.add_argument("--db", default=None)

    s_get = sub.add_parser("schema-get")
    s_get.add_argument("key")

    s_set = sub.add_parser("schema-set")
    s_set.add_argument("key")
    s_set.add_argument("schema_json")
    s_set.add_argument("--require", default=None,
                       choices=("backward", "forward", "full"),
                       help="reject the update unless the old->new "
                            "transition meets this compatibility level")

    s_chk = sub.add_parser("schema-check")
    s_chk.add_argument("key")
    s_chk.add_argument("schema_json")

    sub.add_parser("due")

    args = p.parse_args(argv)
    reg = Registry(args.registry)

    if args.cmd == "table-add":
        kwargs = {}
        if args.snapshot_interval_sec is not None:
            kwargs["snapshot_interval_sec"] = args.snapshot_interval_sec
        r = reg.register(TableRegistration(
            service=args.service, cluster=args.cluster, db=args.db,
            table=args.table, pk_cols=args.pks, **kwargs))
        print(json.dumps({"registered": r.key}))
    elif args.cmd == "table-del":
        ok = reg.deregister(args.key)
        print(json.dumps({"deregistered": args.key, "found": ok}))
        return 0 if ok else 1
    elif args.cmd == "table-list":
        rows = reg.list(service=args.service, db=args.db)
        print(json.dumps([r.key for r in rows]))
    elif args.cmd == "schema-get":
        r = reg.get(args.key)
        if r is None:
            print(json.dumps({"error": "not_found"}))
            return 1
        print(json.dumps({"key": args.key,
                          "schema_version": r.schema_version,
                          "schema_json": r.schema_json}))
    elif args.cmd in ("schema-set", "schema-check"):
        from pyspark.sql import types as T

        from storagetapper_spark.schema.compat import classify

        r = reg.get(args.key)
        if r is None:
            print(json.dumps({"error": "not_found"}))
            return 1
        report = None
        if r.schema_json:
            old = T.StructType.fromJson(json.loads(r.schema_json))
            new = T.StructType.fromJson(json.loads(args.schema_json))
            report = classify(old, new)
        if args.cmd == "schema-check":
            print(json.dumps({
                "key": args.key,
                "level": report.level if report else "NONE",
                "findings": [
                    {"column": f.column, "change": f.change,
                     "verdict": f.verdict, "reason": f.reason}
                    for f in (report.findings if report else [])]}))
            return 0
        require = getattr(args, "require", None)
        if require and report is not None:
            ok = {"backward": report.backward or report.level == "NONE",
                  "forward": report.forward or report.level == "NONE",
                  "full": report.level in ("FULL", "NONE")}[require]
            if not ok:
                print(json.dumps({"error": "incompatible",
                                  "level": report.level,
                                  "required": require}))
                return 1
        v = reg.update_schema(args.key, args.schema_json)
        print(json.dumps({"key": args.key, "schema_version": v,
                          "level": report.level if report else "NONE"}))
    elif args.cmd == "due":
        print(json.dumps([r.key for r in reg.tables_needing_snapshot()]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
