"""URI-aware filesystem helpers for stateful streaming sinks.

The foreachBatch state protocols (write-new + swap, bucket-partitioned
MERGE, versioned replay guards) need three tiny filesystem primitives:
join a path, test existence, remove a directory.  ``os.path`` /
``shutil`` implement them only for the driver's local disk — correct on
local[32], broken the moment ``state_dir`` is ``s3a://`` or ``hdfs://``,
which is exactly where a 100 TB deployment keeps state (the reference's
F4/F5 surface, pipe/hdfs.go:59-130, pipe/s3.go:96-127, applied to state
rather than data).

These helpers route through the same pyarrow.fs resolution the file
sink already uses for distributed encryption (sinks/files._resolve_fs):
plain paths and ``file:`` URIs → LocalFileSystem, ``s3a://``/``s3://``
→ S3FileSystem, ``hdfs://`` → HadoopFileSystem.  Spark itself accepts
the URIs unchanged for read/write, so a sink that only ever touches
paths via ``join_uri``/``exists``/``rmtree`` + ``spark.read``/``write``
is object-store-portable end to end.
"""

from __future__ import annotations

from storagetapper_spark.sinks.files import _resolve_fs


def join_uri(base: str, *parts: str) -> str:
    """'/'-join that preserves the scheme — the URI analog of
    os.path.join (which would also work on posix but reads as a
    local-FS assumption)."""
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def exists(uri: str) -> bool:
    """True if the file or directory exists on the URI's filesystem."""
    from pyarrow import fs as pafs

    f, p = _resolve_fs(uri)
    return f.get_file_info(p).type != pafs.FileType.NotFound


def listdir(uri: str) -> list[str]:
    """Base names of a directory's immediate children (empty list if
    the directory is missing) — enough for the sinks' versioned-
    snapshot GC without a local-FS os.listdir assumption."""
    from pyarrow import fs as pafs

    f, p = _resolve_fs(uri)
    try:
        infos = f.get_file_info(pafs.FileSelector(p, recursive=False))
    except (FileNotFoundError, OSError):
        return []
    return [i.base_name for i in infos]


def rmtree(uri: str) -> None:
    """Recursively delete a directory; missing paths are a no-op
    (shutil.rmtree(ignore_errors=True) semantics)."""
    f, p = _resolve_fs(uri)
    try:
        f.delete_dir(p)
    except (FileNotFoundError, OSError):
        pass
