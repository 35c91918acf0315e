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
