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
