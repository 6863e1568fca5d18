"""The bus adapter is a SEAM, not a new engine path: a serving twin
run over the Kafka-shaped stream produces exactly the results it
produces over the plain file stream, and the bus metadata honors the
Kafka contracts consumers rely on (key→partition stability, offset
uniqueness/monotonicity per key, value round-trip)."""

from __future__ import annotations

import pytest

from scala_reactivex_spark.sources.bus import (
    BUS_PARTITIONS,
    bus_stream,
    parse_bus,
    to_bus,
)
from scala_reactivex_spark.streaming import twins

DOCS_DDL = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, "
    "n_chars BIGINT"
)


@pytest.fixture(scope="module")
def docs_stream_src(spark, sf_dir, tmp_path_factory):
    src = tmp_path_factory.mktemp("bus_docs_src")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(2)
        .write.mode("overwrite")
        .parquet(str(src))
    )
    return str(src)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return str(tmp_path_factory.mktemp("bus_ckpt"))


def test_bus_schema_is_literal_kafka_surface(spark, sf_dir):
    """Column names AND types match Spark's Kafka source exactly —
    key/value BINARY, the time column named 'timestamp' with its
    timestampType companion (ADVICE r15) — so format('kafka') is a
    drop-in swap, not a near-miss."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bus = to_bus(docs, "doc_id", "docs-topic")
    assert [(f.name, f.dataType.simpleString()) for f in bus.schema] == [
        ("key", "binary"),
        ("value", "binary"),
        ("topic", "string"),
        ("partition", "int"),
        ("offset", "bigint"),
        ("timestamp", "timestamp"),
        ("timestampType", "int"),
    ]
    assert {r["timestampType"] for r in bus.limit(5).collect()} == {0}


def test_bus_value_round_trips_and_metadata_contracts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bus = to_bus(docs, "doc_id", "docs-topic")
    back = parse_bus(bus, DOCS_DDL)
    got = {
        r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
        for r in back.collect()
    }
    want = {
        r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
        for r in docs.collect()
    }
    assert got == want
    meta = bus.select("key", "partition", "offset", "topic").collect()
    assert all(r["topic"] == "docs-topic" for r in meta)
    assert all(0 <= r["partition"] < BUS_PARTITIONS for r in meta)
    # key→partition is a pure function (Kafka default partitioner);
    # keys are BINARY now — hash as bytes
    by_key = {}
    for r in meta:
        by_key.setdefault(bytes(r["key"]), set()).add(r["partition"])
    assert all(len(ps) == 1 for ps in by_key.values())
    # offsets unique (stable-id contract)
    assert len({r["offset"] for r in meta}) == len(meta)


def test_twin_over_bus_equals_twin_over_plain_stream(
    spark, sf_dir, docs_stream_src, ckpt
):
    """twin_nb_filter consumes the bus-shaped stream through parse_bus
    and drains to exactly the decisions it drains from the plain file
    stream — the one-reader-swap Kafka posture, asserted."""
    model, thr = twins.nb_serving_pack(spark, sf_dir)
    plain = twins.run_stream_to_table(
        twins.twin_nb_filter(
            twins.docs_stream(spark, docs_stream_src), model, thr
        ),
        "t_nbf_plain",
        ckpt,
    )
    bus = bus_stream(
        spark, docs_stream_src, DOCS_DDL, "doc_id", "docs-topic"
    )
    over_bus = twins.run_stream_to_table(
        twins.twin_nb_filter(parse_bus(bus, DOCS_DDL), model, thr),
        "t_nbf_bus",
        ckpt,
    )
    got = {
        r["doc_id"]: (r["pred_lang"], r["band"], r["kept"])
        for r in over_bus.collect()
    }
    want = {
        r["doc_id"]: (r["pred_lang"], r["band"], r["kept"])
        for r in plain.collect()
    }
    assert got == want and len(got) > 0


def test_stateful_gate_twin_over_bus_equals_plain_stream(
    spark, sf_dir, ckpt, tmp_path_factory
):
    """Second twin over the bus seam (r15 verdict #5): twin_dedup_gate
    — the heaviest gate, whose plan runs stream-static equi-joins, a
    per-row MinHash signature and a stateful dropDuplicates OVER THE
    PARSED BUS VALUES — drains to exactly the match set it drains from
    the plain file stream.  One-twin evidence (nb_filter, a stateless
    projection) didn't exercise joins or state over from_json output;
    this does."""
    from scala_reactivex_spark.streaming.latency import _incremental_setup

    work = str(tmp_path_factory.mktemp("bus_gate_work"))
    incoming_src, ex_hashes, ex_index = _incremental_setup(
        spark, sf_dir, work
    )

    def drain(sdf, name):
        return {
            (r["doc_id"], r["doc_ex"], r["match_type"], r["jaccard"])
            for r in twins.run_stream_to_table(
                twins.twin_dedup_incremental(sdf, ex_hashes, ex_index),
                name,
                ckpt,
            ).collect()
        }

    plain = drain(twins.docs_stream(spark, incoming_src), "t_gate_plain")
    bus = bus_stream(spark, incoming_src, DOCS_DDL, "doc_id", "docs-topic")
    over_bus = drain(parse_bus(bus, DOCS_DDL), "t_gate_bus")
    assert over_bus == plain and len(over_bus) > 0
