"""X1 with real Structured Streaming: file-source readStream →
foreachBatch → DynamicGraph ingestion, compared against batch state."""

import json
import os
import tempfile

from graphchi_cpp_spark.streaming.ingest import DynamicGraph


def test_readstream_foreachbatch_ingest(spark):
    with tempfile.TemporaryDirectory() as d:
        indir = os.path.join(d, "in")
        ckpt = os.path.join(d, "ckpt")
        os.makedirs(indir)

        base = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
        dg = DynamicGraph(base)

        stream = (
            spark.readStream.schema("src long, dst long, op string")
            .option("maxFilesPerTrigger", 1)  # X1 backpressure knob
            .json(indir)
        )

        def handle(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            dg.ingest_batch(batch_df)

        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        # two micro-batch files: adds and a delete
        with open(os.path.join(indir, "b0.json"), "w") as f:
            f.write(json.dumps({"src": 2, "dst": 3, "op": "add"}) + "\n")
        with open(os.path.join(indir, "b1.json"), "w") as f:
            f.write(json.dumps({"src": 0, "dst": 1, "op": "delete"}) + "\n")
        q.awaitTermination(120)

        # re-run a second availableNow pass in case files landed after
        # the first trigger enumerated
        q2 = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)

        got = {(r["src"], r["dst"]) for r in dg.edges().collect()}
        assert got == {(1, 2), (2, 3)}
        dg.compact()
        assert dg.base_count == 2


def test_streaming_hourly_windows_match_batch(spark):
    """X5 streaming twin: readStream → watermark → tumbling F.window agg
    must produce exactly the batch hourly_event_stats rows on the same
    events (complete-mode memory sink, availableNow trigger)."""
    from graphchi_cpp_spark.streaming.windows import (
        hourly_event_stats,
        hourly_event_stats_stream,
    )

    rows = [
        ("2024-01-01T10:05:00", "view", 1.0),
        ("2024-01-01T10:55:00", "view", 2.5),
        ("2024-01-01T10:59:00", "purchase", 10.0),
        ("2024-01-01T11:01:00", "view", 4.0),
        ("2024-01-01T13:30:00", "purchase", 7.25),
        # late arrival inside the watermark, lands in the 10:00 window
        ("2024-01-01T10:20:00", "purchase", 3.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        indir = os.path.join(d, "in")
        os.makedirs(indir)
        for i, (ts, et, v) in enumerate(rows):
            with open(os.path.join(indir, f"e{i}.json"), "w") as f:
                f.write(json.dumps({"ts": ts, "event_type": et, "value": v}))

        schema = "ts timestamp, event_type string, value double"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .json(indir)
        )
        q = (
            hourly_event_stats_stream(stream)
            .writeStream.format("memory")
            .queryName("hourly_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        batch_df = spark.createDataFrame(
            [(r[0].replace("T", " "), r[1], r[2]) for r in rows],
            "ts string, event_type string, value double",
        ).selectExpr("cast(ts as timestamp) ts", "event_type", "value")
        expect = {
            tuple(r) for r in hourly_event_stats(batch_df).collect()
        }
        got = {tuple(r) for r in spark.sql("SELECT * FROM hourly_stream").collect()}
        assert got == expect
        assert len(got) == 4  # 10h view / 10h purchase / 11h view / 13h purchase


def test_apply_in_pandas_with_state_running_totals(spark):
    """Arbitrary-stateful streaming (applyInPandasWithState): per-user
    running totals survive across micro-batches via the engine state
    store; the final update per user equals the batch aggregate."""
    from graphchi_cpp_spark.streaming.stateful import running_user_totals

    rows = [
        (1, 10.0), (2, 5.0), (1, 2.5),   # batch 0 (one file)
        (2, 1.0), (3, 4.0), (1, 0.5),    # batch 1
    ]
    with tempfile.TemporaryDirectory() as d:
        indir = os.path.join(d, "in")
        os.makedirs(indir)
        for b in range(2):
            with open(os.path.join(indir, f"b{b}.json"), "w") as f:
                for u, v in rows[b * 3 : b * 3 + 3]:
                    f.write(json.dumps({"user_id": u, "value": v}) + "\n")

        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .json(indir)
        )
        q = (
            running_user_totals(stream)
            .writeStream.format("memory")
            .queryName("running_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        upd = spark.sql("SELECT * FROM running_totals").collect()
        # update mode appends one row per (user, micro-batch); the row
        # with the user's max n_events is the final state
        final = {}
        for r in upd:
            if r["user_id"] not in final or r["n_events"] > final[r["user_id"]][0]:
                final[r["user_id"]] = (r["n_events"], r["sum_value"])
        assert final == {1: (3, 13.0), 2: (2, 6.0), 3: (1, 4.0)}


def test_session_window_matches_gaps_and_islands(spark, sf_dir):
    """Native F.session_window sessionization equals the batch
    lag/running-sum sessionize on the real events table (stable key =
    (user_id, session_start_us))."""
    from graphchi_cpp_spark.datasets import load_table
    from graphchi_cpp_spark.streaming.windows import (
        sessionize,
        sessionize_session_window,
    )

    ev = load_table(spark, sf_dir, "events")
    a = {
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in sessionize(ev).collect()
    }
    b = {
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in sessionize_session_window(ev).collect()
    }
    assert a == b and len(a) > 0


def test_streaming_exact_dedup_matches_batch_canonicals(spark):
    """Streaming content-hash dedup keeps exactly the batch canonical
    doc ids (first occurrence per distinct text) when all rows arrive
    within the watermark horizon."""
    import uuid

    from graphchi_cpp_spark.operators.dedup import exact_duplicates
    from graphchi_cpp_spark.streaming.dedup import streaming_exact_dedup

    rows = [
        (1, "2024-01-01T10:00:00", "alpha beta gamma"),
        (2, "2024-01-01T10:01:00", "delta epsilon"),
        (3, "2024-01-01T10:02:00", "alpha beta gamma"),  # dup of 1
        (4, "2024-01-01T10:03:00", "zeta eta theta"),
        (5, "2024-01-01T10:04:00", "delta epsilon"),  # dup of 2
    ]
    with tempfile.TemporaryDirectory() as d:
        indir = os.path.join(d, "in")
        os.makedirs(indir)
        # two micro-batches, duplicates split across them
        with open(os.path.join(indir, "b0.json"), "w") as f:
            for doc_id, ts, text in rows[:3]:
                f.write(json.dumps({"doc_id": doc_id, "ts": ts, "text": text}) + "\n")
        with open(os.path.join(indir, "b1.json"), "w") as f:
            for doc_id, ts, text in rows[3:]:
                f.write(json.dumps({"doc_id": doc_id, "ts": ts, "text": text}) + "\n")
        stream = (
            spark.readStream.schema("doc_id long, ts timestamp, text string")
            .option("maxFilesPerTrigger", 1)
            .json(indir)
        )
        sink = f"dedup_sink_{uuid.uuid4().hex[:8]}"
        q = (
            streaming_exact_dedup(stream, watermark="1 hour")
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {r["doc_id"] for r in spark.sql(f"SELECT * FROM {sink}").collect()}

    # exactly one survivor per distinct text; which copy wins depends on
    # micro-batch arrival order (the file source does not promise it),
    # so assert group membership, not specific ids
    text_of = {i: t for i, _, t in rows}
    assert len(got) == 3
    assert {text_of[i] for i in got} == {
        "alpha beta gamma",
        "delta epsilon",
        "zeta eta theta",
    }
    # batch twin agrees on the group structure (3 canonical groups)
    batch = spark.createDataFrame(
        [(i, t) for i, _, t in rows], ["doc_id", "text"]
    )
    assert exact_duplicates(batch).select("canonical_id").distinct().count() == 3


def test_streaming_lsh_candidates_matches_batch(spark, sf_dir):
    """The streaming MinHash-LSH candidate op must emit exactly the
    batch lsh_candidates pair set (after the consumer-side distinct)
    when the corpus is replayed across micro-batches — near-dup pairs
    split across batches included."""
    from graphchi_cpp_spark.operators.dedup import lsh_candidates
    from graphchi_cpp_spark.streaming.dedup import streaming_lsh_candidates

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id % 4 = 0")
    )
    rows = docs.collect()
    assert len(rows) > 50
    expected = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidates(docs).collect()
    }
    assert expected, "fixture must contain near-dup candidates"

    with tempfile.TemporaryDirectory() as d:
        indir = os.path.join(d, "in")
        ckpt = os.path.join(d, "ckpt")
        os.makedirs(indir)
        # three micro-batches; interleave so near-dup pairs straddle them
        for b in range(3):
            with open(os.path.join(indir, f"b{b}.json"), "w") as f:
                for i, r in enumerate(rows):
                    if i % 3 == b:
                        f.write(
                            json.dumps({"doc_id": r["doc_id"], "text": r["text"]})
                            + "\n"
                        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(indir)
        )
        q = (
            streaming_lsh_candidates(stream)
            .writeStream.format("memory")
            .queryName("lsh_cand_sink")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r["doc_a"], r["doc_b"])
            for r in spark.table("lsh_cand_sink").collect()
        }
    assert got == expected


def test_streaming_lsh_state_ttl_expires_idle_buckets(spark):
    """With state_ttl_ms set, a bucket idle past the TTL stops pairing:
    a doc arriving after the horizon starts a fresh membership list
    (expiry path (b)), so only the within-horizon pair is emitted. The
    control run (no TTL) over the identical file sequence emits all
    three pairs — proving the TTL, not arrival order, removed them."""
    import time

    from graphchi_cpp_spark.streaming.dedup import streaming_lsh_candidates

    text = "alpha beta gamma delta epsilon"  # identical docs: same bucket

    def run(ttl_ms):
        pairs: set = set()
        with tempfile.TemporaryDirectory() as d:
            indir = os.path.join(d, "in")
            ckpt = os.path.join(d, "ckpt")
            os.makedirs(indir)

            # foreachBatch, not the memory sink: run 2's restart-from-
            # checkpoint is the point of the test, and the memory sink
            # refuses checkpoint recovery
            def collect(batch_df, _batch_id):
                pairs.update(
                    (r["doc_a"], r["doc_b"]) for r in batch_df.collect()
                )

            def stream_once(fname, rows):
                with open(os.path.join(indir, fname), "w") as f:
                    for doc_id in rows:
                        f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
                stream = (
                    spark.readStream.schema("doc_id long, text string")
                    .option("maxFilesPerTrigger", 1)
                    .json(indir)
                )
                q = (
                    streaming_lsh_candidates(
                        stream, bands=2, rows_per_band=2, state_ttl_ms=ttl_ms
                    )
                    .writeStream.foreachBatch(collect)
                    .outputMode("append")
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                assert q.awaitTermination(180), "streaming run timed out"

            # run 1: docs 1,2 share the bucket -> pair (1,2), state [1,2]
            stream_once("b0.json", [1, 2])
            time.sleep(2.5)  # idle past the 2s TTL (when set)
            # run 2 (same checkpoint -> state persisted): doc 3 arrives
            stream_once("b1.json", [3])
        return pairs

    assert run(ttl_ms=2000) == {(1, 2)}          # 3 sees an expired bucket
    assert run(ttl_ms=None) == {(1, 2), (1, 3), (2, 3)}  # control: no expiry


def test_streaming_lsh_overflow_accumulator_counts_dropped(spark):
    """A saturated bucket (max_bucket_size=1) still pairs arrivals against
    stored members but declines to store them — the overflow accumulator
    makes that recall loss observable instead of silent."""
    import uuid

    from graphchi_cpp_spark.streaming.dedup import streaming_lsh_candidates

    text = "zeta eta theta iota kappa"
    acc = spark.sparkContext.accumulator(0)
    sink = f"lsh_ovf_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as d:
        indir = os.path.join(d, "in")
        os.makedirs(indir)
        with open(os.path.join(indir, "b0.json"), "w") as f:
            for doc_id in (1, 2, 3):
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(indir)
        )
        q = (
            streaming_lsh_candidates(
                stream, bands=2, rows_per_band=2,
                max_bucket_size=1, overflow_acc=acc,
            )
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "streaming run timed out"
        pairs = {(r["doc_a"], r["doc_b"]) for r in spark.table(sink).collect()}
    # only doc 1 is stored; 2 and 3 each pair against it and are dropped
    assert pairs == {(1, 2), (1, 3)}
    # identical text -> both bands saturate: 2 dropped docs x 2 bands
    assert acc.value == 4


def test_streaming_lsh_evict_idle_removes_state_rows(spark):
    """evict_idle=True registers ProcessingTimeTimeout timers: buckets
    idle past the TTL are physically removed from the state store
    (observable as numRowsRemoved in the state-operator progress).
    Needs a continuous trigger — availableNow never terminates with
    processing-time timers registered (documented in the operator)."""
    import time
    import uuid

    from graphchi_cpp_spark.streaming.dedup import streaming_lsh_candidates

    text = "lambda mu nu xi omicron"
    sink = f"lsh_evict_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as d:
        indir = os.path.join(d, "in")
        os.makedirs(indir)
        with open(os.path.join(indir, "b0.json"), "w") as f:
            for doc_id in (1, 2):
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(indir)
        )
        q = (
            streaming_lsh_candidates(
                stream, bands=2, rows_per_band=2,
                state_ttl_ms=1500, evict_idle=True,
            )
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            removed = 0
            deadline = time.time() + 120
            while time.time() < deadline and removed == 0:
                time.sleep(2)
                for p in q.recentProgress:
                    for op in p.get("stateOperators", []):
                        removed += op.get("numRowsRemoved", 0) or 0
            pairs = {
                (r["doc_a"], r["doc_b"]) for r in spark.table(sink).collect()
            }
        finally:
            q.stop()
    assert pairs == {(1, 2)}
    # both band buckets were evicted after sitting idle past the TTL
    assert removed >= 2


def test_batched_lsh_dedup_matches_batch_and_is_idempotent(spark, sf_dir):
    """The foreachBatch JVM-join streaming LSH variant must emit exactly
    the batch lsh_candidates pair set when the corpus replays across
    micro-batches, AND reprocessing a batch id (foreachBatch retry
    semantics) must neither duplicate state nor change the pair set."""
    from graphchi_cpp_spark.operators.dedup import lsh_candidates
    from graphchi_cpp_spark.streaming.dedup import BatchedLshDedup

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id % 4 = 0")
    )
    rows = docs.collect()
    expected = {
        (r["doc_a"], r["doc_b"]) for r in lsh_candidates(docs).collect()
    }
    assert expected, "fixture must contain near-dup candidates"

    with tempfile.TemporaryDirectory() as d:
        state = os.path.join(d, "state")
        dedup = BatchedLshDedup(state)
        got: set = set()
        chunks = [
            [r for i, r in enumerate(rows) if i % 3 == b] for b in range(3)
        ]
        for b, chunk in enumerate(chunks):
            batch_df = spark.createDataFrame(
                [(r["doc_id"], r["text"]) for r in chunk], ["doc_id", "text"]
            )
            pairs = dedup.process(batch_df, b)
            got.update((r["doc_a"], r["doc_b"]) for r in pairs.collect())
        assert got == expected

        # retry batch 1: same pairs back, state not duplicated
        batch_df = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in chunks[1]], ["doc_id", "text"]
        )
        retry = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.process(batch_df, 1).collect()
        }
        assert retry <= expected
        n_state = spark.read.parquet(state).count()
        # one banded row per (doc, band): 8 bands x corpus size, exactly once
        assert n_state == 8 * len(rows)

        # expiry: keep only the last batch partition -> batch-0/1 docs
        # stop pairing; a replay of batch 0 now only pairs within itself
        # and against batch 2's retained members
        assert dedup.expire(keep_last=1) == 2
        assert len(dedup._batch_dirs()) == 1


def test_batched_lsh_dedup_state_on_file_uri(spark, sf_dir):
    """Cluster-safety contract: the state dir is listed/expired through
    the Hadoop FileSystem API resolved from the URI scheme, so a
    ``file://`` URI (the local stand-in for hdfs://, s3a://) must work
    end-to-end — the old os.listdir implementation saw such URIs as a
    missing directory and silently emitted zero cross-batch pairs."""
    from graphchi_cpp_spark.operators.dedup import lsh_candidates
    from graphchi_cpp_spark.streaming.dedup import BatchedLshDedup

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id % 4 = 0")
    )
    rows = docs.collect()
    expected = {
        (r["doc_a"], r["doc_b"]) for r in lsh_candidates(docs).collect()
    }
    assert expected

    with tempfile.TemporaryDirectory() as d:
        state_uri = "file://" + os.path.join(d, "state")
        dedup = BatchedLshDedup(state_uri)
        got: set = set()
        chunks = [
            [r for i, r in enumerate(rows) if i % 2 == b] for b in range(2)
        ]
        for b, chunk in enumerate(chunks):
            batch_df = spark.createDataFrame(
                [(r["doc_id"], r["text"]) for r in chunk], ["doc_id", "text"]
            )
            pairs = dedup.process(batch_df, b)
            got.update((r["doc_a"], r["doc_b"]) for r in pairs.collect())
        # cross-batch recall through the URI state dir, not just intra-batch
        assert got == expected
        assert len(dedup._batch_dirs()) == 2
        # expiry deletes through the same FS API
        assert dedup.expire(keep_last=1) == 1
        assert dedup._batch_dirs() == ["batch_id=1"]


def test_streaming_lsh_warns_without_ttl(spark):
    """Unbounded-state foot-gun guidance (VERDICT r9 task 6): calling
    streaming_lsh_candidates with no state_ttl_ms must emit a
    UserWarning pointing at the TTL knob and BatchedLshDedup; with a
    TTL set it must stay silent."""
    import warnings

    import pytest as _pytest

    from graphchi_cpp_spark.streaming.dedup import streaming_lsh_candidates

    with tempfile.TemporaryDirectory() as d:
        stream = spark.readStream.schema("doc_id long, text string").json(d)
        with _pytest.warns(UserWarning, match="BatchedLshDedup"):
            streaming_lsh_candidates(stream)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            streaming_lsh_candidates(stream, state_ttl_ms=60_000)
