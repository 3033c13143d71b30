"""The ``Binary`` column extension (round 11): blob payloads inside
versioned azof tables must get the SAME time travel / upsert / DML /
CDF semantics as scalar columns — schema JSON round-trip, writer,
both scan paths (JVM vectorized + Python Data Source), SQL, evolve,
delete, checkpoint. The reference's type set is four scalars
(crates/azof/src/schema.rs:15-21); ``Binary`` is a documented superset
like ``Float``."""

import json
import os
import shutil
import sys
import tempfile
from datetime import datetime, timezone

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark import Lakehouse  # noqa: E402
from bazof_spark.datasource import read_table, write_table  # noqa: E402
from bazof_spark.writer import append_delta, delete_keys  # noqa: E402

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
T1 = datetime(2024, 2, 1, tzinfo=timezone.utc)
BETWEEN = "2024-01-15T00:00:00.000Z"


def _blob(i: int, gen: int = 0) -> bytes:
    return bytes([gen, i % 256, 255 - i % 256, (7 * i) % 256])


@pytest.fixture(scope="module")
def media_root(spark, tmp_path_factory):
    """A two-version binary table: 20 keys at T0, even keys re-blobbed
    at T1."""
    root = str(tmp_path_factory.mktemp("binlake"))
    df = spark.createDataFrame(
        [(str(i), T0, _blob(i), i) for i in range(20)],
        "key string, event_time timestamp, blob binary, n long",
    )
    write_table(df, root, "media", mode="overwrite")
    up = spark.createDataFrame(
        [(str(i), T1, _blob(i, gen=1), i + 100) for i in range(0, 20, 2)],
        "key string, event_time timestamp, blob binary, n long",
    )
    append_delta(spark, os.path.join(root, "media"), up)
    return root


def test_schema_json_declares_binary(spark, media_root):
    snap = Lakehouse(spark, media_root).table("media").get_current_snapshot()
    cols = {c["name"]: c["data_type"] for c in snap.schema.to_json()["columns"]}
    assert cols["blob"] == "Binary"
    # and parses back through the declared enum
    from bazof_spark.schema import TableSchema

    again = TableSchema.from_json(json.loads(json.dumps(snap.schema.to_json())))
    assert again == snap.schema


def test_asof_merge_shadows_blobs(spark, media_root):
    lh = Lakehouse(spark, media_root)
    at0 = {r["key"]: bytes(r["blob"]) for r in lh.scan("media", as_of=BETWEEN).collect()}
    cur = {r["key"]: bytes(r["blob"]) for r in lh.scan("media").collect()}
    assert len(at0) == len(cur) == 20
    for i in range(20):
        assert at0[str(i)] == _blob(i)
        expect = _blob(i, gen=1) if i % 2 == 0 else _blob(i)
        assert cur[str(i)] == expect


def test_datasource_reader_matches_native(spark, media_root):
    lh = Lakehouse(spark, media_root)
    for as_of in (None, BETWEEN):
        native = sorted(
            (r["key"], bytes(r["blob"]), r["n"])
            for r in lh.scan("media", as_of=as_of).collect()
        )
        via = sorted(
            (r["key"], bytes(r["blob"]), r["n"])
            for r in read_table(spark, media_root, "media", as_of=as_of).collect()
        )
        assert via == native


def test_sql_time_travel_and_dml_on_binary_table(spark, media_root):
    lh = Lakehouse(spark, media_root)
    got = lh.sql(
        f"SELECT key, blob FROM media AT ('{BETWEEN}') WHERE key = '2'"
    ).first()
    assert bytes(got["blob"]) == _blob(2)
    lh.sql("UPDATE media SET n = n + 1000 WHERE key = '3'")
    row = lh.scan("media").filter("key = '3'").first()
    assert row["n"] == 1003 and bytes(row["blob"]) == _blob(3)
    # the blob survives the UPDATE rewrite byte-identically, and time
    # travel before the update still sees the old n
    before = lh.sql(
        f"SELECT n FROM media AT ('{BETWEEN}') WHERE key = '3'"
    ).first()
    assert before["n"] == 3


def test_alter_add_binary_column_and_delete(spark, media_root):
    lh = Lakehouse(spark, media_root)
    lh.sql("ALTER TABLE media ADD COLUMN thumb BINARY")
    df = lh.scan("media")
    assert dict(df.dtypes)["thumb"] == "binary"
    assert df.filter("thumb IS NOT NULL").count() == 0
    delete_keys(spark, os.path.join(media_root, "media"), ["5"])
    assert lh.scan("media").filter("key = '5'").count() == 0
    assert lh.scan("media", as_of=BETWEEN).filter("key = '5'").count() == 1


def test_cdf_emits_blob_changes(spark, media_root):
    lh = Lakehouse(spark, media_root)
    # between the instants the only difference is the T1 upsert (the
    # UPDATE/DELETE tests stamp at 'now', past this window)
    changes = lh.scan_changes(
        "media", BETWEEN, "2024-02-15T00:00:00.000Z"
    ).collect()
    upserts = {
        r["key"]: (bytes(r["blob_early"]), bytes(r["blob_late"]))
        for r in changes
        if r["change_type"] != "delete"
    }
    assert sorted(upserts) == sorted(str(i) for i in range(0, 20, 2))
    assert all(
        pair == (_blob(int(k)), _blob(int(k), gen=1))
        for k, pair in upserts.items()
    )


def test_checkpoint_preserves_blobs(spark, media_root, tmp_path):
    import shutil

    from bazof_spark.maintenance import checkpoint_table, validate_table

    root = str(tmp_path / "ck")
    shutil.copytree(media_root, root)
    lh = Lakehouse(spark, root)
    before = sorted(
        (r["key"], bytes(r["blob"])) for r in lh.scan("media").collect()
    )
    # past every delta, including the UPDATE/DELETE tests' now-stamped ones
    checkpoint_table(lh, "media", at=datetime.now(timezone.utc))
    after = sorted(
        (r["key"], bytes(r["blob"])) for r in lh.scan("media").collect()
    )
    assert after == before
    assert validate_table(lh, "media").ok
    # pre-checkpoint history is still readable
    at0 = {r["key"]: bytes(r["blob"]) for r in lh.scan("media", as_of=BETWEEN).collect()}
    assert at0["2"] == _blob(2)


def test_sql_type_spellings_map_to_binary():
    from bazof_spark.sql import SQL_TYPE_NAMES

    assert SQL_TYPE_NAMES["BINARY"] == "Binary"
    assert SQL_TYPE_NAMES["BYTES"] == "Binary"
    assert SQL_TYPE_NAMES["BLOB"] == "Binary"


def test_media_lakehouse_build_publish_is_atomic(spark, monkeypatch):
    """The cached media-table build publishes via scratch-dir +
    atomic rename: the marker is written INSIDE the scratch before the
    rename (so it appears atomically with the table), and a builder
    that loses the rename race to a concurrent process tolerates the
    OSError and serves the winner's copy."""
    import os as _os

    from bazof_spark.sources import media

    sf_dir = "/root/testdata/sf0.001"
    lh1 = media.media_lakehouse(spark, sf_dir)
    n1 = lh1.scan(media.TABLE_NAME).count()
    assert n1 > 0

    # cached path: a second call must not rebuild
    def boom(*a, **k):
        raise AssertionError("rebuild on cached table")

    monkeypatch.setattr(media, "_build", boom)
    assert media.media_lakehouse(spark, sf_dir).scan(
        media.TABLE_NAME
    ).count() == n1
    monkeypatch.undo()

    # race-loss path: wipe the cache, then make our rename lose —
    # the winner's copy (published by the real rename first) is served
    from bazof_spark.sources.tables import source_tag

    tag = source_tag(sf_dir, "documents")
    root = _os.path.join(tempfile.gettempdir(), f"bazof_media_{tag}")
    shutil.rmtree(root)
    real_rename = _os.rename

    def lose_race(src, dst):
        real_rename(src, dst)  # "another process" publishes first
        raise FileExistsError(17, "lost the publish race", dst)

    monkeypatch.setattr(media.os, "rename", lose_race)
    lh2 = media.media_lakehouse(spark, sf_dir)
    assert lh2.scan(media.TABLE_NAME).count() == n1
    # the loser's scratch dir was cleaned up
    parent = _os.path.dirname(root)
    leftovers = [
        d for d in _os.listdir(parent)
        if d.startswith(_os.path.basename(root) + ".build-")
    ]
    assert leftovers == []
