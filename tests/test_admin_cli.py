"""Control-plane CLI (tools/admin.py) — the server/table.go REST-verb
analog over the file-backed Registry."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import admin  # noqa: E402


def _run(capsys, *argv):
    rc = admin.main(list(argv))
    return rc, json.loads(capsys.readouterr().out.strip())


def test_admin_cli_lifecycle(tmp_path, capsys):
    regp = str(tmp_path / "reg.json")
    rc, out = _run(capsys, regp, "table-add", "--service", "svc",
                   "--cluster", "c1", "--db", "tpch", "--table", "lineitem",
                   "--pk", "l_orderkey", "--pk", "l_linenumber")
    assert rc == 0
    key = out["registered"]
    assert key == "svc.c1.tpch.lineitem.v0"

    rc, out = _run(capsys, regp, "table-list")
    assert out == [key]
    rc, out = _run(capsys, regp, "table-list", "--service", "other")
    assert out == []

    rc, out = _run(capsys, regp, "due")
    assert out == [key]  # fresh registration needs its first snapshot

    rc, out = _run(capsys, regp, "schema-set", key,
                   json.dumps({"fields": []}))
    assert out["schema_version"] == 1
    rc, out = _run(capsys, regp, "schema-get", key)
    assert out["schema_version"] == 1

    rc, out = _run(capsys, regp, "table-del", key)
    assert rc == 0 and out["found"]
    rc, out = _run(capsys, regp, "table-list")
    assert out == []

    # registry is plain JSON on disk — shared-state contract
    assert os.path.exists(regp)


def test_admin_schema_compat_gate(tmp_path, capsys):
    regp = str(tmp_path / "reg.json")
    _run(capsys, regp, "table-add", "--service", "svc", "--cluster", "c1",
         "--db", "d", "--table", "t", "--pk", "id")
    key = "svc.c1.d.t.v0"
    base = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": False, "metadata": {}},
        {"name": "v", "type": "string", "nullable": True, "metadata": {}}]}
    rc, out = _run(capsys, regp, "schema-set", key, json.dumps(base))
    assert rc == 0 and out["level"] == "NONE"

    # dropping the required id column is BACKWARD-only
    dropped = {"type": "struct", "fields": base["fields"][1:]}
    rc, out = _run(capsys, regp, "schema-check", key, json.dumps(dropped))
    assert rc == 0 and out["level"] == "BACKWARD"
    assert out["findings"][0]["column"] == "id"

    # a feed requiring FULL refuses it; registry version unchanged
    rc, out = _run(capsys, regp, "schema-set", key, json.dumps(dropped),
                   "--require", "full")
    assert rc == 1 and out["error"] == "incompatible"
    rc, out = _run(capsys, regp, "schema-get", key)
    assert out["schema_version"] == 1

    # backward policy accepts and bumps the version
    rc, out = _run(capsys, regp, "schema-set", key, json.dumps(dropped),
                   "--require", "backward")
    assert rc == 0 and out["schema_version"] == 2
