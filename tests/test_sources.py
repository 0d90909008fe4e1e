"""Typed connector-boundary tests (S5-S8 + J5): the EMR control-plane
dimension scans parse fixture JSON into the typed frames the operators
consume (cluster/Workers.scala:151-157,246-266,351-363)."""

from __future__ import annotations

import json

import pytest

from emr_trino_autoscale_spark import sources
from emr_trino_autoscale_spark.functions import config_zip_dimension


def _raw(spark, payloads):
    return spark.createDataFrame([(json.dumps(p),) for p in payloads], "payload string")


def test_parse_instance_groups_task_filter_and_status(spark):
    payloads = [
        {
            "id": "ig-1",
            "name": "trino-task",
            "instanceGroupType": "TASK",
            "instanceType": "m5.xlarge",
            "market": "SPOT",
            "runningInstanceCount": 4,
            "requestedInstanceCount": 6,
            "status": {"state": "RESIZING", "stateChangeReason": {"message": "ok"}},
        },
        {
            "id": "ig-2",
            "name": "core",
            "instanceGroupType": "CORE",  # dropped: TASK-only listing
            "instanceType": "m5.xlarge",
            "market": "ON_DEMAND",
            "runningInstanceCount": 2,
            "requestedInstanceCount": 2,
            "status": {"state": "RUNNING", "stateChangeReason": {"message": ""}},
        },
        {
            "id": "ig-3",
            "name": "trino-task-2",
            "instanceGroupType": "task",  # CI filter
            "instanceType": "c5.xlarge",
            "market": "ON_DEMAND",
            "runningInstanceCount": 0,
            "requestedInstanceCount": 0,
            "status": {"state": "SUSPENDED", "stateChangeReason": {"message": "ICE"}},
        },
    ]
    rows = {r["id"]: r for r in sources.parse_instance_groups(_raw(spark, payloads)).collect()}
    assert set(rows) == {"ig-1", "ig-3"}
    assert rows["ig-1"]["weight"] == 1  # groups scale whole instances
    assert rows["ig-1"]["is_resizing"] is True and rows["ig-1"]["is_suspended"] is False
    assert rows["ig-3"]["is_suspended"] is True and rows["ig-3"]["message"] == "ICE"
    assert rows["ig-1"]["running"] == 4 and rows["ig-1"]["requested"] == 6


def test_parse_instance_fleets_explodes_specs(spark):
    payloads = [
        {
            "id": "if-1",
            "name": "trino-task",
            "instanceFleetType": "TASK",
            "targetOnDemandCapacity": 0,
            "targetSpotCapacity": 12,
            "provisionedOnDemandCapacity": 0,
            "provisionedSpotCapacity": 8,
            "instanceTypeSpecifications": [
                {"instanceType": "m5.xlarge", "weightedCapacity": 4},
                {"instanceType": "r5.2xlarge", "weightedCapacity": 8},
            ],
        }
    ]
    rows = sources.parse_instance_fleets(_raw(spark, payloads)).collect()
    got = {(r["instance_type"], r["weight"]) for r in rows}
    assert got == {("m5.xlarge", 4), ("r5.2xlarge", 8)}
    assert all(r["running"] == 8 and r["requested"] == 12 for r in rows)


# Market-dependent capacity projection (cluster/Workers.scala:393-397):
# the refresh reads the capacity pair of the market the fleet purchases.
_MIXED_FLEET = {
    "id": "if-9",
    "name": "trino-task",
    "instanceFleetType": "TASK",
    "targetOnDemandCapacity": 3,
    "targetSpotCapacity": 12,
    "provisionedOnDemandCapacity": 2,
    "provisionedSpotCapacity": 8,
    "status": {"state": "RESIZING", "stateChangeReason": {"message": ""}},
    "instanceTypeSpecifications": [{"instanceType": "m5.xlarge", "weightedCapacity": 4}],
}


def test_fleet_market_selects_capacity_fields(spark):
    raw = _raw(spark, [_MIXED_FLEET])
    spot = sources.parse_instance_fleets(raw, use_spot=True).collect()[0]
    assert (spot["running"], spot["requested"]) == (8, 12)
    od = sources.parse_instance_fleets(raw, use_spot=False).collect()[0]
    assert (od["running"], od["requested"]) == (2, 3)
    total = sources.parse_instance_fleets(raw).collect()[0]
    assert (total["running"], total["requested"]) == (10, 15)


def test_fleet_refresh_adapter_market_projection(spark):
    import datetime as dt

    ts = dt.datetime(2026, 1, 1, 12, 0, 0)
    raw = spark.createDataFrame(
        [(ts, json.dumps(_MIXED_FLEET))], "ts timestamp, payload string"
    )
    spot = sources.parse_fleet_refresh(raw, use_spot=True).collect()[0]
    assert spot["task_id"] == "if-9" and spot["status"] == "RESIZING"
    assert (spot["running"], spot["requested"]) == (8, 12)
    od = sources.parse_fleet_refresh(raw, use_spot=False).collect()[0]
    assert (od["running"], od["requested"]) == (2, 3)
    # the adapter's shape feeds task_state_stream's D6 processor directly
    from emr_trino_autoscale_spark.streaming.stateful import refresh_rows
    import pandas as pd

    out, _ = refresh_rows(
        pd.DataFrame([spot.asDict()]), last_suspended_ms=0
    )
    assert out[0]["is_resizing"] is True and out[0]["running"] == 8


def test_parse_cluster_instances_projection(spark):
    payloads = [
        {
            "id": "ci-1",
            "ec2InstanceId": "i-0abc",
            "privateIpAddress": "10.0.0.7",
            "publicIpAddress": None,
            "instanceGroupId": "ig-1",
            "instanceFleetId": None,
            "market": "SPOT",
            "instanceType": "m5.xlarge",
            "status": {"state": "RUNNING"},
        }
    ]
    r = sources.parse_cluster_instances(_raw(spark, payloads)).collect()[0]
    assert r["private_ip"] == "10.0.0.7" and r["state"] == "RUNNING"
    assert r["group_id"] == "ig-1" and r["ec2_instance_id"] == "i-0abc"


def test_parse_describe_cluster_dispatch_key(spark):
    payloads = [
        {
            "cluster": {
                "id": "j-123",
                "name": "trino",
                "instanceCollectionType": "INSTANCE_FLEET",
                "status": {"state": "WAITING"},
            }
        }
    ]
    r = sources.parse_describe_cluster(_raw(spark, payloads)).collect()[0]
    assert r["cluster_id"] == "j-123" and r["collection_type"] == "INSTANCE_FLEET"


# J5 — config zip (Workers.scala:300-310)

def test_config_zip_dimension(spark):
    col = config_zip_dimension(["m5.xlarge", "r5.2xlarge"], [4, 8])
    row = spark.range(1).select(col.alias("instances")).collect()[0]["instances"]
    assert [(i["name"], i["weight"]) for i in row] == [
        ("m5.xlarge", 4),
        ("r5.2xlarge", 8),
    ]


def test_config_zip_dimension_sanity_checks():
    with pytest.raises(ValueError):
        config_zip_dimension([], [])
    with pytest.raises(ValueError):
        config_zip_dimension(["m5.xlarge"], [1, 2])


# S10 — properties config scan (Config.scala:20-21,59-61)

def test_parse_properties_and_https_dispatch(spark):
    https_conf = (
        "# Trino coordinator config\n"
        "http-server.https.enabled=true\n"
        "http-server.https.port=8443\n"
        "http-server.http.port=8080\n"
        "query.max-memory=50GB\n"
        "odd.value=a=b=c\n"
        "\n"
    )
    http_conf = "http-server.http.port=8080\nquery.max-memory=50GB\n"
    raw = spark.createDataFrame([(https_conf,), (http_conf,)], "payload string")
    parsed = sources.parse_properties(raw)
    schema, port = sources.https_schema_and_port(parsed["props"])
    rows = parsed.select(
        "props", schema.alias("schema"), port.alias("port")
    ).collect()
    assert rows[0]["schema"] == "https" and rows[0]["port"] == "8443"
    assert rows[0]["props"]["query.max-memory"] == "50GB"
    assert rows[0]["props"]["odd.value"] == "a=b=c"  # first-'=' split
    # missing flag falls back to http (Try(...).getOrElse(false))
    assert rows[1]["schema"] == "http" and rows[1]["port"] == "8080"


def test_parse_properties_repeated_key_last_wins(spark):
    # java.util.Properties allows repeated keys, last wins — must not
    # throw DUPLICATED_MAP_KEY under mapKeyDedupPolicy=EXCEPTION
    conf = (
        "query.max-memory=10GB\n"
        "http-server.http.port=8080\n"
        "query.max-memory=50GB\n"
    )
    raw = spark.createDataFrame([(conf,)], "payload string")
    props = sources.parse_properties(raw).select("props").collect()[0]["props"]
    assert props["query.max-memory"] == "50GB"
    assert props["http-server.http.port"] == "8080"


def test_registry_replace_and_union_and_bound(spark):
    from emr_trino_autoscale_spark.operators import registry

    cur = spark.createDataFrame([("ig-1", 4), ("ig-2", 2)], "id string, running int")
    inc = spark.createDataFrame([("ig-2", 9), ("ig-3", 1)], "id string, running int")
    # replaceAll: incoming IS the registry
    assert {(r["id"], r["running"]) for r in registry.replace_all(cur, inc).collect()} == {
        ("ig-2", 9),
        ("ig-3", 1),
    }
    try:
        registry.replace_all(cur, spark.createDataFrame([(1,)], "x long"))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    # union_latest: one row per key, incoming wins
    merged = {r["id"]: r["running"] for r in registry.union_latest(cur, inc, "id").collect()}
    assert merged == {"ig-1": 4, "ig-2": 9, "ig-3": 1}
    # duplicate keys inside incoming: order_col picks the latest
    # deterministically instead of keeping both
    inc_dup = spark.createDataFrame(
        [("ig-2", 9, 10), ("ig-2", 7, 20), ("ig-3", 1, 5)],
        "id string, running int, seen long",
    )
    cur_ts = spark.createDataFrame(
        [("ig-1", 4, 1), ("ig-2", 2, 1)], "id string, running int, seen long"
    )
    merged2 = {
        r["id"]: r["running"]
        for r in registry.union_latest(cur_ts, inc_dup, "id", order_col="seen").collect()
    }
    assert merged2 == {"ig-1": 4, "ig-2": 7, "ig-3": 1}
    # append_bounded: FixedList eviction keeps the newest N
    big = spark.createDataFrame([(i,) for i in range(10)], "seq long")
    kept = {r["seq"] for r in registry.append_bounded(big, "seq", 3).collect()}
    assert kept == {7, 8, 9}


def test_registry_union_latest_map_column_tie(spark):
    # A map column must neither raise at plan time (maps are unorderable)
    # nor enter the tie-break. Two incoming rows tie on EVERY orderable
    # column (key, order_col, running) and differ only in the map: the
    # merge must still emit exactly one row per key, deterministically.
    from pyspark.sql import functions as F

    from emr_trino_autoscale_spark.operators import registry

    inc = (
        spark.createDataFrame(
            [("ig-1", 5, 7, "a"), ("ig-1", 5, 7, "b"), ("ig-2", 1, 3, "c")],
            "id string, running int, seen long, tag string",
        )
        .withColumn("props", F.create_map(F.lit("k"), F.col("tag")))
        .drop("tag")
    )
    cur = (
        spark.createDataFrame(
            [("ig-1", 0, 1, "old"), ("ig-3", 9, 1, "keep")],
            "id string, running int, seen long, tag string",
        )
        .withColumn("props", F.create_map(F.lit("k"), F.col("tag")))
        .drop("tag")
    )
    out1 = registry.union_latest(cur, inc, "id", order_col="seen").collect()
    out2 = registry.union_latest(cur, inc, "id", order_col="seen").collect()
    by_id = {r["id"]: r for r in out1}
    assert sorted(by_id) == ["ig-1", "ig-2", "ig-3"]  # one row per key
    assert by_id["ig-1"]["running"] == 5  # incoming won
    # replay determinism: same winner (including the map) both times
    assert {(r["id"], r["running"], tuple(sorted(r["props"].items()))) for r in out1} == {
        (r["id"], r["running"], tuple(sorted(r["props"].items()))) for r in out2
    }


def test_registry_replace_rejects_renamed_columns(spark):
    from emr_trino_autoscale_spark.operators import registry

    cur = spark.createDataFrame([("ig-1", 4)], "id string, running int")
    renamed = spark.createDataFrame([("x", 1)], "name string, weight int")
    with pytest.raises(ValueError):
        # same dataTypes, different column meanings — must not pass
        registry.replace_all(cur, renamed)


def test_write_compacted_sizes_file_count(spark, tmp_path):
    """X49 (io): the writer derives file count from measured encoded
    bytes/row, so a many-partition frame lands as few right-sized files."""
    import glob

    from emr_trino_autoscale_spark.io import write_compacted

    df = spark.range(50_000).repartition(32).selectExpr(
        "id", "repeat('x', 200) AS payload"
    )
    out = tmp_path / "compacted"
    n = write_compacted(df, str(out), target_file_mb=1)
    files = glob.glob(str(out / "*.parquet"))
    assert n >= 1
    assert len(files) == n          # not 32 shuffle-partition shards
    assert len(files) < 32
    back = spark.read.parquet(str(out))
    assert back.count() == 50_000

    # empty frame: no crash, zero data files requested
    out2 = tmp_path / "compacted_empty"
    n2 = write_compacted(df.filter("id < 0"), str(out2), target_file_mb=1)
    assert n2 == 0


def test_write_compacted_partitioned_colocates(spark, tmp_path):
    """X49 (io), round-11 fix: a partitioned write must CO-LOCATE rows
    by (partition tuple, bounded salt) first — without that exchange
    every upstream task containing a value writes its own shard into
    that directory (32 tasks x 4 langs = 128 files where ~4 belong).
    Landed per-directory file counts must track the per-partition plan
    ceil(rows_p / rows_per_file), and NULL partition values must land
    (null-safe broadcast join), not drop."""
    import glob

    from pyspark.sql import functions as F

    from emr_trino_autoscale_spark.io import write_compacted

    df = (
        spark.range(40_000)
        .repartition(32)  # many upstream tasks, every lang in each
        .select(
            "id",
            F.when(F.col("id") % 4 == 3, None)
            .otherwise(F.concat(F.lit("lang"), (F.col("id") % 4).cast("string")))
            .alias("lang"),
            F.expr("repeat('x', 200)").alias("payload"),
        )
    )
    out = tmp_path / "by_lang"
    planned = write_compacted(
        df, str(out), target_file_mb=1, partition_by=("lang",)
    )
    dirs = glob.glob(str(out / "lang=*"))
    assert len(dirs) == 4  # 3 langs + the NULL directory
    landed = {d: len(glob.glob(d + "/*.parquet")) for d in dirs}
    # each ~10k-row 2MB-encoded partition plans ~2-3 files at 1MB —
    # NOT one shard per upstream task
    assert sum(landed.values()) <= planned
    assert all(1 <= n <= 8 for n in landed.values()), landed
    back = spark.read.parquet(str(out))
    assert back.count() == 40_000
    assert back.filter(F.col("lang").isNull()).count() == 10_000


def test_load_evolving_merges_missing_and_drifted_columns(spark, tmp_path):
    """X49 (io): old files without a column read as NULL/default; a
    column stored int in old files and long in new casts to the target."""
    from emr_trino_autoscale_spark.io import load_evolving

    p = tmp_path / "evolving"
    spark.createDataFrame(
        [(1, "a")], "id int, text string"
    ).write.parquet(str(p / "part=old"))
    spark.createDataFrame(
        [(2, "b", 0.9)], "id long, text string, q double"
    ).write.parquet(str(p / "part=new"))

    out = load_evolving(
        spark,
        str(p),
        "id long, text string, q double, lang string",
        defaults={"lang": "und"},
    )
    rows = {r["id"]: r for r in out.collect()}
    assert set(out.columns) == {"id", "text", "q", "lang"}
    assert rows[1]["q"] is None and rows[1]["lang"] == "und"
    assert rows[2]["q"] == 0.9 and rows[2]["lang"] == "und"


def test_jsonl_ingest_with_quarantine(spark, tmp_path):
    """Round 10 raw-corpus ingest: JSONL shards (one gzipped) read
    with an explicit schema, corrupt lines quarantined not fatal,
    n_chars canonicalized from the text, digest added, and the landing
    parquet written size-aware. The full JSONL -> parquet -> query
    path a 100 TB pipeline runs before anything else."""
    import gzip
    import json
    import os

    from emr_trino_autoscale_spark import io as eio

    src = tmp_path / "shards"
    src.mkdir()
    rows = [
        {"doc_id": i, "text": f"doc {i} body text", "lang": "en",
         "source": "web", "n_chars": -1}  # n_chars deliberately wrong
        for i in range(20)
    ]
    with open(src / "part-0.jsonl", "w") as f:
        for r in rows[:10]:
            f.write(json.dumps(r) + "\n")
        f.write("{this is not json\n")
        f.write('{"doc_id": "also-not-a-long"}\n')
    with gzip.open(src / "part-1.jsonl.gz", "wt") as f:
        for r in rows[10:]:
            f.write(json.dumps(r) + "\n")

    dest = str(tmp_path / "landing")
    stats = eio.ingest_documents(spark, str(src / "*"), dest)
    assert stats["n_clean"] == 20
    assert stats["n_corrupt"] == 2
    assert stats["n_files"] >= 1

    landed = spark.read.parquet(dest)
    got = {r.doc_id: r for r in landed.collect()}
    assert set(got) == set(range(20))
    # canonicalized length, not the upstream lie
    assert all(r.n_chars == len(r.text) for r in got.values())
    assert all(len(r.digest) == 32 for r in got.values())


def test_csv_ingest_multiline_text(spark, tmp_path):
    """CSV ingest: quoted multiline document text survives the parse;
    schema is explicit (no inference scan)."""
    from emr_trino_autoscale_spark import io as eio

    p = tmp_path / "docs.csv"
    p.write_text(
        'doc_id,text,lang,source,n_chars\n'
        '1,"line one\nline two",en,web,0\n'
        '2,"plain",de,books,0\n'
    )
    df = eio.read_documents_csv(spark, str(p))
    clean, bad = eio.split_corrupt(df)
    rows = {r.doc_id: r for r in clean.collect()}
    # full-row collect, not count(): a count over the quarantine frame
    # prunes to the corrupt column alone, which Spark forbids on raw
    # file scans (see split_corrupt docstring)
    assert len(bad.collect()) == 0
    assert rows[1].text == "line one\nline two"
    assert rows[2].lang == "de"
