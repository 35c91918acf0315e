"""Object-store witness for the state filesystem layer (VERDICT r4 #7):
run ``statefs.exists``/``rmtree``/parquet-read against a REAL S3 wire
protocol (a local moto_server S3 emulator), over ``s3a://`` URIs — the
F4/F5 surface (pipe/s3.go:44-269) applied to state paths.

Spark-side s3a writes remain env-gated (no hadoop-aws jar ships in this
container — ROADMAP.md), but every state-path primitive the streaming
sinks call is exercised here against S3 semantics, not a POSIX mount.
pyarrow→moto multipart UPLOADS are incompatible (moto returns an error
body in a 200 CompleteMultipartUpload), so objects are seeded via boto3
and the read/exists/delete side — what the sinks' replay guards and
cleanup actually use — is verified through statefs.
"""

import io
import os
import socket
import subprocess
import time

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")


@pytest.fixture(scope="module")
def s3_endpoint():
    # free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    proc = subprocess.Popen(
        ["moto_server", "-p", str(port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    url = f"http://127.0.0.1:{port}"
    # wait for the listener
    for _ in range(50):
        try:
            socket.create_connection(("127.0.0.1", port), timeout=0.2).close()
            break
        except OSError:
            time.sleep(0.1)
    else:
        proc.terminate()
        pytest.skip("moto_server did not start")
    yield url
    proc.terminate()
    proc.wait(timeout=10)


@pytest.fixture()
def s3_env(s3_endpoint, monkeypatch):
    monkeypatch.setenv("AWS_ENDPOINT_URL", s3_endpoint)
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "test")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "test")
    monkeypatch.setenv("AWS_EC2_METADATA_DISABLED", "true")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    return boto3.client("s3", endpoint_url=s3_endpoint,
                        aws_access_key_id="test",
                        aws_secret_access_key="test",
                        region_name="us-east-1")


def test_statefs_exists_and_rmtree_over_s3(s3_env):
    from storagetapper_spark.statefs import exists, join_uri, rmtree

    c = s3_env
    c.create_bucket(Bucket="statebkt")
    c.put_object(Bucket="statebkt",
                 Key="st/cusum/current/part-0.parquet", Body=b"d")
    c.put_object(Bucket="statebkt", Key="st/cusum/v0/_SUCCESS", Body=b"")

    base = "s3a://statebkt/st"
    # the exact calls the replay guards make
    assert exists(join_uri(base, "cusum", "current"))
    assert exists(join_uri(base, "cusum", "v0", "_SUCCESS"))
    assert not exists(join_uri(base, "cusum", "v1"))
    # stage/bucket cleanup
    rmtree(join_uri(base, "cusum", "v0"))
    assert not exists(join_uri(base, "cusum", "v0", "_SUCCESS"))
    rmtree(join_uri(base, "cusum", "v0"))  # idempotent on missing


def test_statefs_reads_parquet_over_s3(s3_env):
    """The sinks' ``spark.read.parquet(current)`` counterpart at the
    pyarrow layer: a parquet object seeded over the wire reads back
    through the same filesystem resolution statefs uses."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from storagetapper_spark.sinks.files import _resolve_fs

    buf = io.BytesIO()
    pq.write_table(pa.table({"pk": [1, 2], "seqno": [10, 11]}), buf)
    s3_env.create_bucket(Bucket="databkt")
    s3_env.put_object(Bucket="databkt", Key="cur/part-0.parquet",
                      Body=buf.getvalue())

    f, p = _resolve_fs("s3a://databkt/cur/part-0.parquet")
    got = pq.read_table(p, filesystem=f)
    assert got.num_rows == 2
    assert sorted(got.column("seqno").to_pylist()) == [10, 11]
