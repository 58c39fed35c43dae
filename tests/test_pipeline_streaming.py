"""End-to-end streaming ingestion (streaming/pipeline.py): file drops
drive ALL legs at once — online indicators, online VWAP, and the
incremental dedup store — and every sink is re-checked against the
batch computation over the union of the drops."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from marketdatapipeline_spark.streaming import TICK_SCHEMA


def _doc_rows(ids_texts):
    return [
        (int(i), t, "en", "web", len(t)) for i, t in ids_texts
    ]


BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a slow waltz under the warm evening sky near the old harbor wall"
)
NEAR = BASE.replace("slow waltz", "slow tango")  # near-dup of BASE
DISTINCT_A = (
    "parquet files partition cleanly when the writer buckets on a "
    "stable key and the reader prunes directories before any scan"
)
DISTINCT_B = (
    "gradient descent converges faster when features are scaled and "
    "the learning rate schedule decays on validation plateaus"
)
DISTINCT_C = (
    "volcanic soil drains quickly yet holds minerals that vines need "
    "during the dry months on the island's southern slopes"
)


@pytest.fixture()
def drops(spark, bars_pdf, tmp_path):
    """(tick_dir, docs_dir, writers): directories plus closures that
    write drop N on demand, so the test controls micro-batch cuts."""
    tick_dir = str(tmp_path / "ticks")
    docs_dir = str(tmp_path / "docs")
    os.makedirs(tick_dir)
    os.makedirs(docs_dir)

    pdf = bars_pdf.rename(
        columns={"datetime": "ts", "close": "price", "volume": "size"}
    )[["symbol", "ts", "price", "size"]]
    half = len(pdf) // 2
    # split by time so drop 2 CONTINUES each symbol's history
    pdf = pdf.sort_values(["ts", "symbol"]).reset_index(drop=True)

    def drop_ticks(n: int) -> None:
        part = pdf.iloc[:half] if n == 1 else pdf.iloc[half:]
        spark.createDataFrame(part, TICK_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(tick_dir)

    doc_batches = {
        1: _doc_rows(
            [(1, BASE), (2, DISTINCT_A), (3, NEAR), (4, DISTINCT_B)]
        ),
        # 11 duplicates a batch-1 doc (store hit), 12 and 13 duplicate
        # each other within the batch (keep-min-id), 14 is fresh
        2: _doc_rows(
            [
                (11, BASE),
                (12, DISTINCT_C),
                (13, DISTINCT_C + " indeed"),
                (14, "totally unrelated short text about tide tables"),
            ]
        ),
    }

    def drop_docs(n: int) -> None:
        from marketdatapipeline_spark.streaming.pipeline import DOC_SCHEMA

        spark.createDataFrame(doc_batches[n], DOC_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(docs_dir)

    return tick_dir, docs_dir, drop_ticks, drop_docs


def test_await_any_termination_timeout_is_seconds(spark):
    """Regression (ADVICE r7): the timeout is SECONDS, passed through
    unchanged — the old ms conversion made a 1s wait block ~1000s."""
    import time

    from marketdatapipeline_spark.streaming.pipeline import IngestionPipeline

    # queries stopped by EARLIER tests stay in the manager's terminated
    # set until reset — without this the call returns True instantly
    # and proves nothing about the timeout path
    spark.streams.resetTerminated()
    t0 = time.time()
    res = IngestionPipeline().await_any_termination(timeout=1)
    assert time.time() - t0 < 30
    assert res is False  # no query terminated inside the window


def test_streaming_ingestion_end_to_end(spark, bars_pdf, tmp_path, drops):
    from marketdatapipeline_spark.streaming import (
        online_indicators_batch,
        online_vwap_batch,
    )
    from marketdatapipeline_spark.streaming.pipeline import start_ingestion

    tick_dir, docs_dir, drop_ticks, drop_docs = drops
    out = str(tmp_path / "out")

    drop_ticks(1)
    drop_docs(1)
    pipe = start_ingestion(
        spark, out, tick_dir=tick_dir, docs_dir=docs_dir, anchor="day"
    )
    try:
        # ONE query serves both tick sinks (fused operator + foreachBatch
        # fan-out) and one serves dedup — each tick file is read once
        assert len(pipe.queries) == 2
        pipe.process_all()
        drop_ticks(2)
        drop_docs(2)
        pipe.process_all()
    finally:
        pipe.stop()

    # ---- tick legs: sink == batch twin over the union of the drops
    all_ticks = spark.read.schema(TICK_SCHEMA).parquet(tick_dir)
    key = ["symbol", "ts"]

    got_ind = (
        spark.read.parquet(os.path.join(out, "indicators"))
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    want_ind = (
        online_indicators_batch(
            all_ticks.withColumnRenamed("price", "close"),
            order_cols=("ts",),
        )
        .toPandas()
        .rename(columns={"close": "price"})
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(got_ind) == len(bars_pdf)
    for col in ("rsi", "macd", "macd_signal", "macd_histogram"):
        a = got_ind[col].to_numpy()
        b = want_ind[col].to_numpy()
        assert ((a == b) | (pd.isna(a) & pd.isna(b))).all(), col

    got_vwap = (
        spark.read.parquet(os.path.join(out, "vwap"))
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    want_vwap = (
        online_vwap_batch(all_ticks, anchor="day")
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(got_vwap) == len(bars_pdf)
    for col in ("vwap", "vwap_dev"):
        assert (
            got_vwap[col].to_numpy() == want_vwap[col].to_numpy()
        ).all(), col

    # ---- dedup leg: verdicts match incremental semantics across the
    # micro-batch cut, corpus holds exactly the accepted docs
    verdicts = (
        spark.read.parquet(os.path.join(out, "verdicts"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert verdicts["doc_id"].tolist() == [1, 2, 3, 4, 11, 12, 13, 14]
    vmap = dict(zip(verdicts["doc_id"], verdicts["is_duplicate"]))
    assert not vmap[1]
    assert not vmap[2]
    assert vmap[3]  # near-dup of 1 within drop 1
    assert not vmap[4]
    assert vmap[11]  # duplicates doc 1 ACROSS the micro-batch cut
    assert not vmap[12]
    assert vmap[13]  # duplicates 12 within drop 2 (keep-min-id)
    assert not vmap[14]
    dup_of = dict(zip(verdicts["doc_id"], verdicts["dup_of"]))
    assert dup_of[11] == 1 and dup_of[3] == 1 and dup_of[13] == 12

    corpus = (
        spark.read.parquet(os.path.join(out, "corpus"))
        .toPandas()
        .sort_values("doc_id")
    )
    assert corpus["doc_id"].tolist() == [1, 2, 4, 12, 14]

    # restartability: a fresh handle over the same out_dir reuses the
    # persisted store — a rerun of an already-seen doc is a duplicate
    pipe2 = start_ingestion(spark, out, docs_dir=docs_dir)
    try:
        from marketdatapipeline_spark.streaming.pipeline import DOC_SCHEMA

        spark.createDataFrame(
            _doc_rows([(21, DISTINCT_B + " again today")]), DOC_SCHEMA
        ).coalesce(1).write.mode("append").parquet(docs_dir)
        pipe2.process_all()
    finally:
        pipe2.stop()
    v2 = spark.read.parquet(os.path.join(out, "verdicts")).toPandas()
    row21 = v2[v2["doc_id"] == 21].iloc[0]
    assert row21["is_duplicate"] and row21["dup_of"] == 4
