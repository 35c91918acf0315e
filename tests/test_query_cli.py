"""Query CLI: registry-name mode, ad-hoc SQL mode, list, explain."""

import io
import sys

import tools.query as Q


def _run(argv, capsys):
    rc = Q.main(argv)
    out, err = capsys.readouterr()
    return rc, out, err


def test_cli_registry_query(capsys, sf_dir):
    rc, out, err = _run(["sort_limit", "--sf", sf_dir, "--limit", "3"],
                        capsys)
    assert rc == 0
    lines = out.strip().splitlines()
    assert len(lines) == 4  # header + 3 rows
    assert "3 rows" in err


def test_cli_adhoc_sql_json(capsys, sf_dir):
    rc, out, err = _run(
        ["--sql", "SELECT l_returnflag, count(*) AS n FROM lineitem "
         "GROUP BY 1 ORDER BY 1", "--sf", sf_dir, "--fmt", "json"],
        capsys)
    assert rc == 0
    import json
    rows = [json.loads(x) for x in out.strip().splitlines()]
    assert rows and all("l_returnflag" in r and "n" in r for r in rows)


def test_cli_list_and_unknown(capsys, sf_dir):
    rc, out, _ = _run(["--list", "dedup_"], capsys)
    assert rc == 0
    assert "dedup_exact" in out.splitlines()
    rc, _, err = _run(["no_such_query", "--sf", sf_dir], capsys)
    assert rc == 2
    assert "unknown query" in err


def test_cli_explain(capsys, sf_dir):
    rc, out, _ = _run(["sort_limit", "--sf", sf_dir, "--explain"],
                      capsys)
    assert rc == 0
    assert "Physical Plan" in out
