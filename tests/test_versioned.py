"""Versioned parquet tables: time-travel, compaction, WAP gate."""

import os

import pytest

from csp_gateway_spark.sources.versioned import (
    compact,
    current_version,
    list_versions,
    read_version,
    wap_publish,
    write_version,
)


def test_versions_are_immutable_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    df2 = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "k long, v string")
    v1 = write_version(df1, root)
    v2 = write_version(df2, root)
    assert (v1, v2) == (1, 2) and current_version(root) == 2
    # pinned read sees the old snapshot even after new writes
    assert read_version(spark, root, 1).count() == 2
    assert read_version(spark, root).count() == 3
    infos = {i.version: i for i in list_versions(root)}
    assert infos[1].rows == 2 and infos[2].rows == 3

    # the two snapshots reconcile through table_diff
    from csp_gateway_spark.operators.analytics import table_diff

    d = {
        r.change_type: r.n
        for r in table_diff(
            read_version(spark, root, 1), read_version(spark, root, 2), "k", ["v"]
        ).collect()
    }
    assert d == {"unchanged": 1, "changed": 1, "added": 1}


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame([(i,) for i in range(100)], "k long").repartition(8)
    write_version(df, root)
    before = {i.version: i for i in list_versions(root)}[1]
    assert before.files >= 8
    v = compact(spark, root, target_files=1)
    after = {i.version: i for i in list_versions(root)}[v]
    assert after.files == 1 and after.rows == 100
    # old version still fully readable
    assert read_version(spark, root, 1).count() == 100


def test_wap_publish_gates_on_contract_and_audits(spark, tmp_path):
    from csp_gateway_spark.sources.contract import ColumnSpec, SchemaContract

    root = str(tmp_path / "tbl")
    good = spark.createDataFrame([(1, "x")], "k long, v string")
    contract = SchemaContract(
        [ColumnSpec("k", "bigint"), ColumnSpec("v", "string")], allow_extra=False
    )
    v, problems = wap_publish(good, root, contract=contract)
    assert v == 1 and problems == []

    # missing required column -> audit fails, current version untouched
    bad = spark.createDataFrame([(2,)], "k long")
    v2, problems2 = wap_publish(bad, root, contract=contract)
    assert v2 is None and problems2
    assert current_version(root) == 1
    assert not any(n.startswith("_staged") for n in os.listdir(root))

    # custom audit: reject empty batches
    empty = spark.createDataFrame([], "k long, v string")
    v3, problems3 = wap_publish(
        empty, root, contract=contract,
        audits=[lambda df: "empty batch" if df.count() == 0 else None],
    )
    assert v3 is None and "empty batch" in problems3
    assert current_version(root) == 1

    # a clean publish advances the pointer
    v4, _ = wap_publish(
        spark.createDataFrame([(3, "y")], "k long, v string"), root, contract=contract
    )
    assert v4 == 2 and current_version(root) == 2


def test_read_missing_version_raises(spark, tmp_path):
    root = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        read_version(spark, root, 5)


def test_apply_cdc_merge_semantics(spark, tmp_path):
    from csp_gateway_spark.sources.versioned import apply_cdc

    root = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, name string, v int"
    )
    write_version(base, root)
    # update k=1 twice (last wins by ts), delete k=2, insert k=4
    changes = spark.createDataFrame(
        [
            (1, "a1", 11, "U", 100),
            (1, "a2", 12, "U", 200),
            (2, None, None, "D", 150),
            (4, "d", 40, "I", 120),
        ],
        "k long, name string, v int, op string, ts long",
    )
    v = apply_cdc(spark, root, changes, ["k"], ts_col="ts")
    got = {r.k: (r.name, r.v) for r in read_version(spark, root, v).collect()}
    assert got == {1: ("a2", 12), 3: ("c", 30), 4: ("d", 40)}
    # the base snapshot is still intact at version 1
    assert read_version(spark, root, 1).count() == 3


def test_versioned_streaming_sink_wap(spark, tmp_path):
    import json as _json

    from csp_gateway_spark.sources.contract import ColumnSpec, SchemaContract
    from csp_gateway_spark.sources.versioned import versioned_foreach_batch

    src = tmp_path / "in"
    src.mkdir()
    root = str(tmp_path / "tbl")
    rejected = []
    contract = SchemaContract([ColumnSpec("k", "bigint"), ColumnSpec("v", "string")])
    stream = spark.readStream.schema("k long, v string").json(str(src))
    q = (
        stream.writeStream.foreachBatch(
            versioned_foreach_batch(
                root, contract=contract,
                audits=[lambda df: "null key" if df.filter("k IS NULL").count() else None],
                on_reject=lambda bid, probs: rejected.append((bid, probs)),
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        with open(src / "b1.json", "w") as f:
            f.write(_json.dumps({"k": 1, "v": "x"}) + "\n")
        q.processAllAvailable()
        assert current_version(root) == 1
        # a bad batch is rejected; the table pointer does not move
        with open(src / "b2.json", "w") as f:
            f.write(_json.dumps({"k": None, "v": "y"}) + "\n")
        q.processAllAvailable()
        assert current_version(root) == 1 and rejected
    finally:
        q.stop()


def test_merge_snapshot_rejects_duplicate_keys_without_ts(spark):
    """ts_col=None + duplicate key in the change batch must REFUSE
    (ADVICE r4): a silent full-outer fan-out would publish a
    duplicate-key snapshot."""
    import pytest as _pytest

    from csp_gateway_spark.sources.versioned import merge_snapshot

    cur = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    dup = spark.createDataFrame(
        [(1, 11.0, "U"), (1, 12.0, "U")], "k long, v double, op string"
    )
    with _pytest.raises(ValueError, match="multiple rows"):
        merge_snapshot(cur, dup, ["k"])
    # key-unique batch still merges fine without ts_col
    ok = spark.createDataFrame([(1, 11.0, "U")], "k long, v double, op string")
    got = {(r.k, r.v) for r in merge_snapshot(cur, ok, ["k"]).collect()}
    assert got == {(1, 11.0), (2, 20.0)}


def test_diff_to_changes_roundtrip(spark):
    """merge_snapshot(cur, diff_to_changes(cur, nxt)) == nxt — the CDC
    producer/consumer pair closes."""
    from csp_gateway_spark.sources.versioned import diff_to_changes, merge_snapshot

    cur = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)], "k long, v double"
    )
    nxt = spark.createDataFrame(
        [(1, 10.0), (2, 21.0), (3, 3.0), (5, 50.0)], "k long, v double"
    )
    ch = diff_to_changes(cur, nxt, ["k"])
    ops = {(r.k): r.op for r in ch.collect()}
    assert ops == {2: "U", 3: "U", 4: "D", 5: "I"}  # k=1 unchanged: absent
    back = merge_snapshot(cur, ch, ["k"])
    assert {(r.k, r.v) for r in back.collect()} == {
        (r.k, r.v) for r in nxt.collect()
    }
