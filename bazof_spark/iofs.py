"""Filesystem abstraction for metadata/file IO: local paths or ANY
pyarrow.fs URI (file://, s3://, gs://, abfs://) through one code path —
the Spark-side analog of the reference's ``object_store`` genericity
(crates/azof/src/lakehouse.rs:19-27, README.md:47).

Data files go through Spark/pyarrow parquet writers which accept the
same URIs; these helpers cover the small metadata files (version
pointer, snapshot JSON) and existence probes.

Object-store semantics note: publishing a snapshot ends with a PUT of
``version.txt``; on S3-class stores a PUT is atomic but offers no
compare-and-swap, so the optimistic-concurrency check in
``writer._publish_snapshot`` keeps its (documented) residual race —
the same gap Delta closes with an external LogStore.
"""

from __future__ import annotations

import os
from functools import lru_cache as _functools_lru_cache


def _emulated_schemes() -> frozenset[str]:
    """Schemes listed in ``$BAZOF_FS_EMULATE`` (comma-separated, e.g.
    ``s3,gs``) are served by the LOCAL filesystem instead of their real
    pyarrow backend: ``scheme://bucket/key`` maps to
    ``$BAZOF_FS_EMULATE_ROOT/<scheme>/<bucket>/<key>`` (default root
    ``/tmp/bazof-emulated-fs``) — the bucket authority is PART of the
    mapping, so ``s3://bucket-a/p`` and ``s3://bucket-b/p`` never alias
    the same local file. This is a dev/test harness — it executes every
    URI code branch (is_uri joins, the object-store PUT path in
    replace_text, FileSelector listings, URI rank normalization)
    against a real pyarrow FileSystem with only the transport swapped,
    the closest a network-less sandbox gets to an S3 integration run.
    Never set it in production."""
    raw = os.environ.get("BAZOF_FS_EMULATE", "")
    return frozenset(s.strip() for s in raw.split(",") if s.strip())


def _emulated_local_path(scheme: str, rest: str) -> str:
    root = os.environ.get("BAZOF_FS_EMULATE_ROOT", "/tmp/bazof-emulated-fs")
    bucket, _, key = rest.partition("/")
    return os.path.join(root, scheme.lower(), bucket, key.lstrip("/"))


def _as_emulated(path: str) -> str | None:
    """Mapped local path when ``path`` is an emulated-scheme URI, else
    None."""
    if "://" not in path:
        return None
    scheme, rest = path.split("://", 1)
    if scheme.lower() not in _emulated_schemes():
        return None
    return _emulated_local_path(scheme, rest)


def emulated_mirror(uri: str) -> str:
    """Local path that serves ``uri`` under scheme emulation (testing
    aid — lets a test read the bytes it authored through the emulated
    scheme, or scan them with an engine that has no object-store
    connector)."""
    local = _as_emulated(uri)
    if local is None:
        raise ValueError(f"{uri!r} is not an emulated-scheme URI")
    return local


@_functools_lru_cache(maxsize=8)
def _s3_endpoint_fs(endpoint: str, access: str, secret: str, region: str):
    """pyarrow S3FileSystem bound to an explicit endpoint — the REAL
    S3-protocol client path (AWS C++ SDK over HTTP): ListObjectsV2,
    ranged GETs, multipart uploads, CopyObject. Point
    ``$BAZOF_S3_ENDPOINT`` at any S3-compatible service (MinIO, the
    bundled ``bazof_spark.s3server``, a real region endpoint) and every
    ``s3://bucket/key`` in the repo resolves through it with no local
    mirror anywhere. Cached per (endpoint, credentials) — the SDK
    client is expensive to construct."""
    from pyarrow import fs as pafs

    scheme, _, hostport = endpoint.partition("://")
    if not hostport:
        scheme, hostport = "http", endpoint
    return pafs.S3FileSystem(
        endpoint_override=hostport,
        scheme=scheme,
        access_key=access,
        secret_key=secret,
        region=region,
        allow_bucket_creation=True,
        allow_bucket_deletion=True,
    )


def _split(path: str):
    """(filesystem, fs-relative-path) for a local path or URI."""
    from pyarrow import fs as pafs

    if "://" in path:
        emulated = _as_emulated(path)
        if emulated is not None:
            return pafs.LocalFileSystem(), emulated
        scheme, rest = path.split("://", 1)
        endpoint = os.environ.get("BAZOF_S3_ENDPOINT")
        if scheme.lower() == "s3" and endpoint:
            return (
                _s3_endpoint_fs(
                    endpoint,
                    os.environ.get("BAZOF_S3_ACCESS_KEY", "bazof"),
                    os.environ.get("BAZOF_S3_SECRET_KEY", "bazof-secret"),
                    os.environ.get("BAZOF_S3_REGION", "us-east-1"),
                ),
                rest,
            )
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def split(path: str):
    """Public resolution seam: (pyarrow FileSystem, fs-relative path).
    Callers doing their own parquet IO (e.g. ``pq.write_table`` with an
    explicit ``filesystem=``) must resolve through THIS so every byte
    follows the same URI handling — including scheme emulation."""
    return _split(path)


def env_snapshot() -> dict:
    """The driver's ``BAZOF_*`` environment, for capture into task
    closures / serialized reader-writer objects: Python workers inherit
    the env the JVM was LAUNCHED with, so an endpoint or emulation
    variable set after session start (test harnesses, late
    configuration) would silently not reach executor-side iofs
    resolution without an explicit snapshot applied in the task."""
    return {k: v for k, v in os.environ.items() if k.startswith("BAZOF_")}


def apply_env(env: dict) -> None:
    """Make the process's BAZOF_* namespace EXACTLY ``env`` (a
    :func:`env_snapshot`). Python workers are long-lived and reused
    across jobs — merely updating would leave a previous task's
    emulation/endpoint variables behind, silently rerouting this
    task's IO (observed: an emulation run poisoning a later real-S3
    run in the same worker)."""
    for k in [
        k for k in os.environ if k.startswith("BAZOF_") and k not in env
    ]:
        del os.environ[k]
    os.environ.update(env)


def is_uri(path: str) -> bool:
    return "://" in path


def read_text(path: str) -> str:
    filesystem, rel = _split(path)
    with filesystem.open_input_stream(rel) as f:
        return f.read().decode("utf-8")


def _atomic_local_write(local: str, content: str) -> None:
    """Sibling temp file + ``os.replace`` (POSIX-atomic rename)."""
    import tempfile

    d = os.path.dirname(local) or "."
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-", suffix=".txt")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(content)
        os.replace(tmp, local)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def write_text(path: str, content: str) -> None:
    """PUT ``content`` at ``path``. Emulated object-store schemes model
    the REAL store's PUT semantics, not the local filesystem's: the
    write is all-or-nothing (temp+rename — a real S3/GCS PUT never
    exposes a torn object) and parent "directories" are auto-created
    (object stores have no directories, so a PUT cannot fail for a
    missing prefix). Without this, emulated concurrency tests could
    observe torn version pointers a real store can never produce."""
    emulated = _as_emulated(path)
    if emulated is not None:
        os.makedirs(os.path.dirname(emulated) or ".", exist_ok=True)
        _atomic_local_write(emulated, content)
        return
    filesystem, rel = _split(path)
    with filesystem.open_output_stream(rel) as f:
        f.write(content.encode("utf-8"))


def replace_text(path: str, content: str) -> None:
    """Atomically replace ``path``'s content — readers never observe an
    empty/partial file.

    Local filesystems: write a sibling temp file + ``os.replace``
    (POSIX-atomic rename). Object stores via pyarrow.fs: a single PUT
    is already all-or-nothing on S3/GCS/ABFS, so plain write_text IS
    the atomic path there (and the emulated-scheme write_text mirrors
    that atomicity locally); what object stores cannot give you without
    a conditional-put/locking service is compare-and-swap across
    concurrent WRITERS — see writer._publish_snapshot's conflict
    check."""
    if is_uri(path) and not path.startswith("file://"):
        write_text(path, content)
        return
    local = path[len("file://"):] if path.startswith("file://") else path
    _atomic_local_write(local, content)


def file_mtime(path: str) -> float | None:
    """Last-modified time (epoch seconds), or None when unknown/absent.
    Object stores report the object's creation/last-PUT time."""
    from pyarrow import fs as pafs

    filesystem, rel = _split(path)
    info = filesystem.get_file_info(rel)
    if info.type == pafs.FileType.NotFound or info.mtime is None:
        return None
    return info.mtime.timestamp()


def exists(path: str) -> bool:
    from pyarrow import fs as pafs

    filesystem, rel = _split(path)
    return filesystem.get_file_info(rel).type != pafs.FileType.NotFound


def listdir(path: str) -> list[str]:
    """Base names of the entries directly under ``path``."""
    from pyarrow import fs as pafs

    filesystem, rel = _split(path)
    sel = pafs.FileSelector(rel, recursive=False)
    return [info.base_name for info in filesystem.get_file_info(sel)]


def listdir_info(path: str) -> list[tuple[str, bool]]:
    """(base name, is_directory) for entries directly under ``path``.
    On object stores a "directory" is a key prefix; pyarrow reports it
    as FileType.Directory either way."""
    from pyarrow import fs as pafs

    filesystem, rel = _split(path)
    sel = pafs.FileSelector(rel, recursive=False)
    return [
        (info.base_name, info.type == pafs.FileType.Directory)
        for info in filesystem.get_file_info(sel)
    ]


def makedirs(path: str) -> None:
    filesystem, rel = _split(path)
    filesystem.create_dir(rel, recursive=True)


def move(src: str, dst: str) -> None:
    """Rename/move one file. Local FS: atomic rename. Object stores:
    pyarrow.fs implements move as copy+delete where the store lacks a
    native rename — callers must not rely on atomicity for data files
    (the snapshot publish, not the file move, is the commit point)."""
    filesystem, rel = _split(src)
    _, dst_rel = _split(dst)
    filesystem.move(rel, dst_rel)


def delete(path: str) -> None:
    filesystem, rel = _split(path)
    filesystem.delete_file(rel)


def delete_dir(path: str) -> None:
    """Recursively delete a directory tree; no-op when absent."""
    from pyarrow import fs as pafs

    filesystem, rel = _split(path)
    if filesystem.get_file_info(rel).type == pafs.FileType.NotFound:
        return
    filesystem.delete_dir(rel)


def join(base: str, *parts: str) -> str:
    if is_uri(base):
        return "/".join([base.rstrip("/"), *parts])
    return os.path.join(base, *parts)
