"""Incremental/streaming layer tests: AvailableNow file-stream ingest with
exactly-once per file, SCD2 table merge, checkpointed export, changelog."""

from __future__ import annotations

import json
import os

import pytest

RECORD_V1 = {
    "advisory_id": "OSV-1", "aliases": ["CVE-2020-1"], "summary": "first",
    "affected_packages": [{"package": "pkg:pypi/x",
                           "affected_version_range": "vers:pypi/<1.0",
                           "fixed_version": "1.0"}],
    "references": [], "severities": [], "weaknesses": [],
    "date_published": None, "url": "https://example.com/1",
}
RECORD_V2 = dict(RECORD_V1, summary="first (revised)")
RECORD_OTHER = dict(RECORD_V1, advisory_id="OSV-2", aliases=["CVE-2020-2"],
                    summary="second", url="https://example.com/2")


def _write_record(d, name, rec):
    with open(os.path.join(d, name), "w") as f:
        json.dump(rec, f)


class TestStreamIngest:
    def test_available_now_exactly_once(self, spark, tmp_path):
        from vulnerablecode_spark.streaming.incremental import stream_ingest

        src = tmp_path / "src"; src.mkdir()
        table = str(tmp_path / "advisories")
        ckpt = str(tmp_path / "ckpt")

        _write_record(src, "a.json", RECORD_V1)
        stream_ingest(spark, str(src), table, ckpt)
        t1 = spark.read.parquet(table)
        assert t1.count() == 1 and t1.first().is_latest

        # second trigger: only the NEW file is processed; revised content
        # becomes the latest version, the old row is retained (SCD2)
        _write_record(src, "b.json", RECORD_V2)
        _write_record(src, "c.json", RECORD_OTHER)
        stream_ingest(spark, str(src), table, ckpt)
        t2 = spark.read.parquet(table)
        assert t2.count() == 3  # OSV-1 ×2 versions + OSV-2
        latest = {r.advisory_id: r.summary
                  for r in t2.filter("is_latest").collect()}
        assert latest == {"OSV-1": "first (revised)", "OSV-2": "second"}

        # third trigger with no new files: no change
        stream_ingest(spark, str(src), table, ckpt)
        assert spark.read.parquet(table).count() == 3

    def test_merge_job_maintains_serving_view(self, spark, tmp_path):
        """VERDICT r6 directive #1, maintenance half: the ingest merge
        job keeps the materialized serving view fresh — per batch it
        refreshes only the purls the batch touched."""
        from pyspark.sql import functions as F

        from vulnerablecode_spark.operators.serve import read_bulk_responses
        from vulnerablecode_spark.streaming.incremental import stream_ingest

        src = tmp_path / "src"; src.mkdir()
        table = str(tmp_path / "advisories")
        ckpt = str(tmp_path / "ckpt")
        view = str(tmp_path / "serving_view")

        def builder(sess, merged, batch):
            # per-purl response from the LATEST advisory rows of the
            # purls present in this batch (batch-proportional: semi-join
            # the merged table down to touched purls first)
            touched = batch.select(
                F.explode("affected_packages").alias("ap")
            ).select(F.col("ap.package").alias("purl")).distinct()
            latest = merged.filter("is_latest").select(
                F.explode("affected_packages").alias("ap"),
                "advisory_id", "summary",
            ).select(F.col("ap.package").alias("purl"),
                     "advisory_id", "summary")
            latest = latest.join(F.broadcast(touched), "purl", "left_semi")
            return (latest.groupBy("purl")
                    .agg(F.to_json(F.array_sort(F.collect_list(
                        F.struct("advisory_id", "summary"))))
                        .alias("response")))

        _write_record(src, "a.json", RECORD_V1)
        stream_ingest(spark, str(src), table, ckpt,
                      serving_view_path=view,
                      serving_response_builder=builder)
        got = {r.purl: r.response for r in read_bulk_responses(
            spark, view, ["pkg:pypi/x"]).collect()}
        assert "first" in got["pkg:pypi/x"]

        # a revision lands: the view reflects the new latest summary
        _write_record(src, "b.json", RECORD_V2)
        stream_ingest(spark, str(src), table, ckpt,
                      serving_view_path=view,
                      serving_response_builder=builder)
        got = {r.purl: r.response for r in read_bulk_responses(
            spark, view, ["pkg:pypi/x"]).collect()}
        assert "first (revised)" in got["pkg:pypi/x"]
        assert '"first"' not in got["pkg:pypi/x"]


class TestExport:
    @pytest.fixture()
    def advisories(self, spark):
        from vulnerablecode_spark.operators.ingest import to_canonical_advisories
        from vulnerablecode_spark.schemas import ADVISORY_PARSED

        parsed = spark.createDataFrame(
            [RECORD_V1, RECORD_OTHER], ADVISORY_PARSED)
        return to_canonical_advisories(parsed, "osv", "p", "2024-01-01 00:00:00")

    def test_incremental_export_checkpoint(self, spark, advisories, tmp_path):
        from vulnerablecode_spark.operators.ingest import (
            merge_advisories, to_canonical_advisories)
        from vulnerablecode_spark.schemas import ADVISORY_PARSED
        from vulnerablecode_spark.streaming.export import export_advisories

        out = str(tmp_path / "export")
        ckpt = str(tmp_path / "export.ckpt.json")
        n1 = export_advisories(advisories, out, ckpt)
        assert n1 == 2
        # nothing new → nothing exported
        assert export_advisories(advisories, out, ckpt) == 0
        # a later collection exports only the delta
        parsed_v2 = spark.createDataFrame([RECORD_V2], ADVISORY_PARSED)
        v2 = to_canonical_advisories(parsed_v2, "osv", "p", "2024-02-01 00:00:00")
        merged = merge_advisories(advisories, v2)
        assert export_advisories(merged, out, ckpt) == 1
        exported = spark.read.json(out)
        assert exported.count() == 3
        assert exported.first().export_path.startswith("osv/")


class TestChangelog:
    def test_import_vs_update_actions(self, spark):
        from vulnerablecode_spark.operators.ingest import (
            merge_advisories, to_canonical_advisories)
        from vulnerablecode_spark.schemas import ADVISORY_PARSED
        from vulnerablecode_spark.streaming.changelog import changelog_for_merge

        parsed1 = spark.createDataFrame([RECORD_V1], ADVISORY_PARSED)
        t1 = to_canonical_advisories(parsed1, "osv", "p", "2024-01-01 00:00:00")
        log1 = changelog_for_merge(None, t1, actor="osv_importer")
        assert [r.action_type for r in log1.collect()] == [1]

        parsed2 = spark.createDataFrame([RECORD_V2, RECORD_OTHER], ADVISORY_PARSED)
        t2raw = to_canonical_advisories(parsed2, "osv", "p", "2024-02-01 00:00:00")
        merged = merge_advisories(t1, t2raw)
        log2 = changelog_for_merge(t1, merged, actor="osv_importer")
        actions = {r.entity_pk: r.action_type for r in log2.collect()}
        assert len(actions) == 2
        assert sorted(actions.values()) == [1, 2]  # one new, one revised


class TestStatefulSessionize:
    def test_sessions_across_microbatches(self, spark, tmp_path):
        from vulnerablecode_spark.streaming.stateful import sessionize

        src = tmp_path / "events"; src.mkdir()
        out = str(tmp_path / "sessions")
        ckpt = str(tmp_path / "ckpt")

        def run_batch():
            stream = (spark.readStream
                      .schema("user_id bigint, ts timestamp")
                      .json(str(src)))
            (sessionize(stream, gap_seconds=60)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start().awaitTermination())

        # batch 1: two events 10s apart (one open session), nothing closes
        with open(src / "b1.json", "w") as f:
            f.write('{"user_id": 1, "ts": "2024-01-01T00:00:00"}\n')
            f.write('{"user_id": 1, "ts": "2024-01-01T00:00:10"}\n')
        run_batch()
        assert spark.read.parquet(out).count() == 0

        # batch 2: an event 190s later closes the first session
        with open(src / "b2.json", "w") as f:
            f.write('{"user_id": 1, "ts": "2024-01-01T00:03:20"}\n')
        run_batch()
        sessions = spark.read.parquet(out).collect()
        assert len(sessions) == 1
        s = sessions[0]
        assert s.user_id == 1 and s.n_events == 2
        assert (s.session_end - s.session_start).total_seconds() == 10


class TestRunLog:
    def test_success_and_failure_rows(self, spark, tmp_path):
        from vulnerablecode_spark.streaming.runlog import (EXIT_FAILURE,
                                                           EXIT_SUCCESS,
                                                           PipelineRun,
                                                           load_run_log)

        log_dir = str(tmp_path / "runs")
        with PipelineRun("osv_importer", log_dir) as run:
            run.log("collected 3 advisories")
        try:
            with PipelineRun("broken_pipeline", log_dir) as run:
                raise ValueError("boom")
        except ValueError:
            pass
        df = load_run_log(spark, log_dir)
        rows = {r.pipeline_id: r for r in df.collect()}
        assert rows["osv_importer"].exit_code == EXIT_SUCCESS
        assert rows["osv_importer"].status == "success"
        assert "collected 3" in rows["osv_importer"].log
        assert rows["broken_pipeline"].exit_code == EXIT_FAILURE
        assert "boom" in rows["broken_pipeline"].log


class TestStreamingCodecStage:
    """The real media-decode stage is an ordinary mapInPandas transform, so
    it composes with Structured Streaming unchanged: file-stream source →
    header parse → availableNow sink, exactly the 100 TB ingest shape
    (decode-at-ingest, store typed metadata + bucket columns)."""

    def test_media_meta_over_file_stream(self, spark, tmp_path):
        import numpy as np

        from vulnerablecode_spark.kernel import media as M
        from vulnerablecode_spark.llm.multimodal import extract_media_meta_real

        rng = np.random.default_rng(3)
        rows = []
        for i in range(20):
            if i % 2:
                px = rng.integers(0, 256, size=(4 + i, 6, 3), dtype=np.uint8)
                rows.append((i, bytearray(M.encode_png(px))))
            else:
                s = rng.integers(-500, 500, size=(40 + i, 1), dtype=np.int16)
                rows.append((i, bytearray(M.encode_wav(s, 8000))))
        src = tmp_path / "media_src"
        spark.createDataFrame(rows, "doc_id long, payload binary") \
            .coalesce(1).write.mode("overwrite").parquet(str(src))

        stream = (spark.readStream.schema("doc_id long, payload binary")
                  .parquet(str(src)))
        meta = extract_media_meta_real(stream)
        q = (meta.writeStream.format("memory").queryName("media_meta")
             .trigger(availableNow=True)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        q.awaitTermination(120)
        got = {r.doc_id: r for r in spark.sql(
            "select * from media_meta").collect()}
        assert len(got) == 20
        for i in range(20):
            if i % 2:
                assert got[i].media_format == "png"
                assert (got[i].width, got[i].height) == (6, 4 + i)
            else:
                assert got[i].media_format == "wav"
                assert got[i].n_samples == 40 + i
                assert got[i].sample_rate == 8000


class TestStreamNearDup:
    def test_increment_scores_against_stored_index(self, spark, tmp_path):
        from vulnerablecode_spark.streaming.incremental import \
            stream_near_dup

        src = tmp_path / "docs"; src.mkdir()
        index = str(tmp_path / "nd_index")
        pairs = str(tmp_path / "nd_pairs")
        ckpt = str(tmp_path / "ckpt_nd")

        words = [f"w{i}" for i in range(24)]
        base = " ".join(words)
        d2 = " ".join("x2" if w == "w11" else w for w in words)
        d4 = " ".join("x4" if w == "w5" else w for w in words)
        d5 = " ".join("x4" if w == "w5" else
                      ("x5" if w == "w18" else w) for w in words)
        _write_record(src, "d1.json", {"doc_id": 1, "text": base})
        _write_record(src, "d2.json", {"doc_id": 2, "text": d2})
        _write_record(src, "d3.json",
                      {"doc_id": 3, "text": "totally different words here"})
        stream_near_dup(spark, str(src), index, pairs, ckpt, threshold=0.4)
        p1 = {(r.doc_a, r.doc_b) for r in spark.read.parquet(pairs).collect()}
        assert p1 == {(1, 2)}  # within-batch near-dup found

        # second trigger: a near-dup of STORED doc 1 (doc 4) plus a
        # near-dup of doc 4 itself (doc 5) arrive — (1,4) comes from the
        # index join, (4,5) from within the increment, and the old×old
        # pair (1,2) is NOT re-emitted
        _write_record(src, "d4.json", {"doc_id": 4, "text": d4})
        _write_record(src, "d5.json", {"doc_id": 5, "text": d5})
        stream_near_dup(spark, str(src), index, pairs, ckpt, threshold=0.4)
        p2 = {(r.doc_a, r.doc_b) for r in spark.read.parquet(pairs).collect()}
        assert p2 == {(1, 2), (1, 4), (4, 5)}
        indexed = {r.doc_id for r in
                   spark.read.parquet(f"{index}/hashed")
                   .select("doc_id").distinct().collect()}
        assert indexed == {1, 2, 3, 4, 5}

        # equality vs the batch recompute over the full corpus
        from pyspark.sql import functions as F

        from vulnerablecode_spark.llm.dedup import near_dup_pairs

        docs = spark.read.schema("doc_id long, text string").option(
            "multiLine", "true").json(str(src))
        full = {(r.doc_a, r.doc_b)
                for r in near_dup_pairs(docs, threshold=0.4).collect()}
        assert p2 == full


class TestStreamDsirScore:
    def test_batches_score_against_stored_model(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from vulnerablecode_spark.llm.select import (dsir_bucket_lifts,
                                                     dsir_score)
        from vulnerablecode_spark.streaming.incremental import \
            stream_dsir_score

        # fit the importance model offline on a labeled corpus and store it
        fit = spark.createDataFrame(
            [(100, "spark sql query plan spark sql", "tgt"),
             (101, "banana kiwi mango papaya", "raw"),
             (102, "spark plan sql", "raw")],
            "doc_id long, text string, source string")
        lifts_path = str(tmp_path / "dsir_lifts")
        dsir_bucket_lifts(
            fit, target=F.col("source") == "tgt", n_buckets=64
        ).write.parquet(lifts_path)

        src = tmp_path / "docs"; src.mkdir()
        out = str(tmp_path / "scored")
        ckpt = str(tmp_path / "ckpt_dsir")
        _write_record(src, "d1.json",
                      {"doc_id": 1, "text": "spark sql plan spark"})
        _write_record(src, "d2.json",
                      {"doc_id": 2, "text": "banana kiwi mango"})
        stream_dsir_score(spark, str(src), lifts_path, out, ckpt,
                          n_buckets=64)
        s1 = {r.doc_id: r for r in spark.read.parquet(out).collect()}
        assert set(s1) == {1, 2}
        assert s1[1].importance_bp > s1[2].importance_bp

        # a later trigger scores ONLY the new arrivals, and every stream
        # row equals the batch dsir_score of the same doc against the
        # same stored model
        _write_record(src, "d3.json",
                      {"doc_id": 3, "text": "query plan sql spark papaya"})
        stream_dsir_score(spark, str(src), lifts_path, out, ckpt,
                          n_buckets=64)
        s2 = {r.doc_id: (r.n_tok, r.importance_bp)
              for r in spark.read.parquet(out).collect()}
        assert set(s2) == {1, 2, 3}
        docs = spark.read.schema("doc_id long, text string").option(
            "multiLine", "true").json(str(src))
        batch = {r.doc_id: (r.n_tok, r.importance_bp)
                 for r in dsir_score(
                     docs, spark.read.parquet(lifts_path),
                     n_buckets=64).collect()}
        assert s2 == batch


class TestStreamDedup:
    def test_dedup_state_survives_triggers(self, spark, tmp_path):
        from vulnerablecode_spark.streaming.incremental import stream_dedup

        src = tmp_path / "docs"; src.mkdir()
        out = str(tmp_path / "deduped")
        ckpt = str(tmp_path / "ckpt_dedup")

        _write_record(src, "d1.json", {"doc_id": 1, "text": "alpha beta gamma"})
        _write_record(src, "d2.json", {"doc_id": 2, "text": "alpha beta gamma"})
        _write_record(src, "d3.json", {"doc_id": 3, "text": "other text here"})
        stream_dedup(spark, str(src), out, ckpt)
        t1 = spark.read.parquet(out)
        assert t1.count() == 2  # one row per distinct fingerprint

        # later trigger: a re-arrival of an already-seen fingerprint is
        # suppressed by checkpointed state; a new one passes
        _write_record(src, "d4.json", {"doc_id": 4, "text": "alpha beta gamma"})
        _write_record(src, "d5.json", {"doc_id": 5, "text": "brand new words"})
        stream_dedup(spark, str(src), out, ckpt)
        t2 = spark.read.parquet(out)
        assert t2.count() == 3
        assert {r.doc_id for r in t2.collect()} & {4} == set()


class TestStreamPack:
    def test_offsets_carry_across_triggers_and_match_batch(self, spark, tmp_path):
        from vulnerablecode_spark.streaming.stateful import stream_pack

        src = tmp_path / "pack_docs"; src.mkdir()
        out = str(tmp_path / "manifest")
        ckpt = str(tmp_path / "ckpt_pack")

        def doc(i, n, source):
            return {"doc_id": i, "text": " ".join(f"t{i}w{j}" for j in range(n)),
                    "source": source}

        # trigger 1: source s0 crosses the 10-token boundary mid-doc
        _write_record(src, "d1.json", doc(1, 7, "s0"))
        _write_record(src, "d2.json", doc(2, 6, "s0"))
        _write_record(src, "d3.json", doc(3, 4, "s1"))
        stream_pack(spark, str(src), out, ckpt, seq_len=10)
        t1 = spark.read.parquet(out).collect()
        # doc 2 spans sequences 0 and 1 of s0 (offset 7, 6 tokens)
        assert {(r.stream, r.seq_id, r.doc_id, r.tok_begin, r.tok_end)
                for r in t1} == {
            ("s0", 0, 1, 0, 6), ("s0", 0, 2, 0, 2), ("s0", 1, 2, 3, 5),
            ("s1", 0, 3, 0, 3),
        }

        # trigger 2: later docs continue from the CHECKPOINTED offsets —
        # s0 resumes at offset 13 inside sequence 1, s1 at 4 in sequence 0
        _write_record(src, "d4.json", doc(4, 9, "s0"))
        _write_record(src, "d5.json", doc(5, 2, "s1"))
        stream_pack(spark, str(src), out, ckpt, seq_len=10)
        got = {(r.stream, r.seq_id, r.doc_id, r.tok_begin, r.tok_end)
               for r in spark.read.parquet(out).collect()}

        # row-identical to the batch operator over the full corpus
        from vulnerablecode_spark.llm.curate import pack_sequences

        docs_df = spark.createDataFrame(
            [(1, 7, "s0"), (2, 6, "s0"), (3, 4, "s1"), (4, 9, "s0"),
             (5, 2, "s1")],
            "doc_id long, n long, source string",
        ).selectExpr(
            "doc_id",
            "array_join(transform(sequence(1, n), x -> concat('w', x)), ' ')"
            " AS text",
            "source",
        )
        batch = {(r.stream, r.seq_id, r.doc_id, r.tok_begin, r.tok_end)
                 for r in pack_sequences(docs_df, seq_len=10).collect()}
        assert got == batch


class TestStreamDsirMissingModel:
    def test_missing_lifts_path_raises_before_start(self, spark, tmp_path):
        import pytest as _pytest

        from vulnerablecode_spark.streaming.incremental import \
            stream_dsir_score

        src = tmp_path / "docs"; src.mkdir()
        _write_record(src, "d1.json", {"doc_id": 1, "text": "a b"})
        with _pytest.raises(FileNotFoundError, match="lifts model"):
            stream_dsir_score(spark, str(src),
                              str(tmp_path / "nope"),
                              str(tmp_path / "out"),
                              str(tmp_path / "ckpt"))


class TestSnapshotSwapRecovery:
    def test_crash_mid_swap_restores_from_backup(self, spark, tmp_path):
        from vulnerablecode_spark.streaming.incremental import (read_table,
                                                                write_table)

        path = str(tmp_path / "t")
        write_table(spark.range(5).toDF("n"), path)
        # simulate a crash BETWEEN the two renames: table moved to .old,
        # staging never landed
        import os
        os.replace(path, path + ".old")
        assert read_table(spark, path).count() == 5  # restored, not lost

    def test_stale_backup_never_wedges_next_write(self, spark, tmp_path):
        from vulnerablecode_spark.streaming.incremental import (read_table,
                                                                write_table)

        path = str(tmp_path / "t")
        write_table(spark.range(3).toDF("n"), path)
        # simulate a crash AFTER the swap but before backup cleanup
        import shutil
        shutil.copytree(path, path + ".old")
        write_table(spark.range(7).toDF("n"), path)  # must not raise
        assert read_table(spark, path).count() == 7


class TestSessionizeLateEvents:
    def test_late_event_joins_open_session_without_moving_end(
            self, spark, tmp_path):
        from vulnerablecode_spark.streaming.stateful import sessionize

        src = tmp_path / "events"; src.mkdir()
        out = str(tmp_path / "sessions")
        ckpt = str(tmp_path / "ckpt")

        def run_batch():
            stream = (spark.readStream
                      .schema("user_id bigint, ts timestamp")
                      .json(str(src)))
            (sessionize(stream, gap_seconds=60)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start().awaitTermination())

        with open(src / "b1.json", "w") as f:
            f.write('{"user_id": 1, "ts": "2024-01-01T00:00:00"}\n')
            f.write('{"user_id": 1, "ts": "2024-01-01T00:00:40"}\n')  # t=40
        run_batch()
        # batch 2: a LATE t=20 event (inside the open session) plus an
        # on-time t=80 — 40s after the true latest event t=40, so the
        # session must NOT split (the old code rewound last to 20, making
        # 80-20=60s look like a boundary case and corrupting the end)
        with open(src / "b2.json", "w") as f:
            f.write('{"user_id": 1, "ts": "2024-01-01T00:00:20"}\n')
            f.write('{"user_id": 1, "ts": "2024-01-01T00:01:20"}\n')
        run_batch()
        assert spark.read.parquet(out).count() == 0  # still one open session
        # close it with a far-future event; the closed session holds all 4
        with open(src / "b3.json", "w") as f:
            f.write('{"user_id": 1, "ts": "2024-01-01T01:00:00"}\n')
        run_batch()
        s = spark.read.parquet(out).collect()[0]
        assert s.n_events == 4
        assert (s.session_end - s.session_start).total_seconds() == 80


class TestPackStreamNullText:
    def test_null_text_does_not_shift_offsets(self, spark, tmp_path):
        from vulnerablecode_spark.streaming.stateful import \
            pack_sequences_stream

        src = tmp_path / "docs"; src.mkdir()
        out = str(tmp_path / "packed")
        ckpt = str(tmp_path / "ckpt")
        with open(src / "b1.json", "w") as f:
            f.write('{"doc_id": 1, "source": "s", "text": "a b c"}\n')
            f.write('{"doc_id": 2, "source": "s", "text": null}\n')
            f.write('{"doc_id": 3, "source": "s", "text": "d e"}\n')
        stream = (spark.readStream
                  .schema("doc_id bigint, source string, text string")
                  .json(str(src)))
        (pack_sequences_stream(stream, seq_len=4)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start().awaitTermination())
        rows = {(r.doc_id, r.seq_id, r.tok_begin, r.tok_end)
                for r in spark.read.parquet(out).collect()}
        assert not any(r[0] == 2 for r in rows)  # no row for the null doc
        # doc 3 (2 tokens) starts at stream offset 3, not 4: the null doc
        # advanced nothing, so it spans seqs 0 and 1 exactly like the
        # batch manifest would
        assert rows == {(1, 0, 0, 2), (3, 0, 0, 0), (3, 1, 1, 1)}


class TestStreamApplyIncrement:
    def test_stream_drives_composed_store(self, spark, tmp_path):
        """Two availableNow triggers route micro-batches through the
        atomic multi-artifact store; every serving read equals the batch
        recompute over the full corpus, and a checkpoint replay of an
        already-applied batch is a ledger no-op."""
        from vulnerablecode_spark.llm.dedup import (line_level_dedup,
                                                    near_dup_pairs)
        from vulnerablecode_spark.llm.text import (bm25_topk,
                                                   bm25_topk_from_index)
        from vulnerablecode_spark.streaming import increment as inc
        from vulnerablecode_spark.streaming.incremental import \
            stream_apply_increment

        src = tmp_path / "docs"; src.mkdir()
        root = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")

        words = [f"w{i}" for i in range(24)]
        base = " ".join(words)
        d2 = " ".join("x2" if w == "w11" else w for w in words)
        _write_record(src, "d1.json", {"doc_id": 1, "text": base})
        _write_record(src, "d2.json", {"doc_id": 2, "text": d2})
        stream_apply_increment(spark, str(src), root, ckpt, threshold=0.4)
        n_batches = len(inc.read_ledger(root)["batches"])
        assert n_batches >= 1

        d4 = " ".join("x4" if w == "w5" else w for w in words)
        _write_record(src, "d4.json", {"doc_id": 4, "text": d4})
        stream_apply_increment(spark, str(src), root, ckpt, threshold=0.4)

        docs = spark.read.schema("doc_id long, text string").option(
            "multiLine", "true").json(str(src))
        # near-dup pairs == batch recompute
        got_pairs = {(r.doc_a, r.doc_b)
                     for r in inc.read_pairs(spark, root).collect()}
        want_pairs = {(r.doc_a, r.doc_b)
                      for r in near_dup_pairs(docs, threshold=0.4).collect()}
        assert got_pairs == want_pairs
        # cleaned serving copy == batch line dedup
        got_clean = {r.doc_id: r.cleaned_text
                     for r in inc.read_cleaned(spark, root).collect()}
        want_clean = {r.doc_id: r.cleaned_text
                      for r in line_level_dedup(
                          docs, w=3, boilerplate_min_docs=3).collect()}
        assert got_clean == want_clean
        # BM25 index == batch build
        got_bm = sorted(tuple(r) for r in bm25_topk_from_index(
            inc.read_bm25_postings(spark, root),
            inc.read_bm25_lengths(spark, root), ["w1", "x4"]).collect())
        want_bm = sorted(tuple(r) for r in
                         bm25_topk(docs, ["w1", "x4"]).collect())
        assert got_bm == want_bm
        # replaying the drained stream adds no batches and changes nothing
        before = len(inc.read_ledger(root)["batches"])
        stream_apply_increment(spark, str(src), root, ckpt, threshold=0.4)
        assert len(inc.read_ledger(root)["batches"]) == before
        assert {(r.doc_a, r.doc_b)
                for r in inc.read_pairs(spark, root).collect()} == want_pairs


class TestWindowedEventCounts:
    def test_watermark_closes_windows_and_drops_stale(self, spark, tmp_path):
        """Append-mode tumbling windows: a window emits exactly once when
        the watermark passes its end; open-window state carries across
        availableNow restarts via the checkpoint; late data inside the
        horizon lands in its (still-open) window, late data beyond the
        horizon is dropped instead of corrupting an emitted row."""
        import json as _json

        from vulnerablecode_spark.streaming.windows import (
            windowed_event_counts_stream)

        src = tmp_path / "ev"; src.mkdir()
        out = str(tmp_path / "agg"); ckpt = str(tmp_path / "ck")

        def run():
            stream = (spark.readStream
                      .schema("ts timestamp, event_type string, "
                              "value double")
                      .json(str(src)))
            (windowed_event_counts_stream(
                stream, window="1 hour", watermark="1 hour")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True).start().awaitTermination())

        def emit(name, rows):
            with open(src / name, "w") as f:
                for ts, et, v in rows:
                    f.write(_json.dumps(
                        {"ts": ts, "event_type": et, "value": v}) + "\n")

        emit("b1.json", [
            ("2024-01-01T00:10:00", "a", 1.5),
            ("2024-01-01T00:40:00", "a", 2.5),
            ("2024-01-01T01:10:00", "b", 1.0),
            ("2024-01-01T02:30:00", "a", 3.0),  # watermark → 01:30
        ])
        run()
        got1 = spark.read.parquet(out).collect()
        # only the hour-0 window closed (end 01:00 ≤ watermark 01:30)
        assert {(r.window_start.hour, r.event_type) for r in got1} \
            == {(0, "a")}
        assert got1[0].n_events == 2
        assert got1[0].value_sum_q == 4_000_000

        emit("b2.json", [
            ("2024-01-01T00:50:00", "a", 99.0),  # beyond horizon: dropped
            ("2024-01-01T01:20:00", "b", 2.0),   # hour-1 open: counted
            ("2024-01-01T04:00:00", "c", 0.5),   # watermark → 03:00
        ])
        run()
        final = {(r.window_start.hour, r.event_type):
                 (r.n_events, r.value_sum_q)
                 for r in spark.read.parquet(out).collect()}
        # hour 0 unchanged — the 99.0 late row did NOT mutate it
        assert final[(0, "a")] == (2, 4_000_000)
        # hour 1 closed with BOTH b events (cross-batch open state)
        assert final[(1, "b")] == (2, 3_000_000)
        # hour 2 closed
        assert final[(2, "a")] == (1, 3_000_000)
        # hour 4 still open (watermark 03:00 < its end)
        assert (4, "c") not in final


class TestStreamStreamAttribution:
    def test_interval_join_matches_batch_pairs(self, spark, tmp_path):
        """Stream-stream interval join with watermarks on both sides:
        candidate pairs equal the batch pair enumeration for the same
        horizon, the join emits each pair exactly once across
        availableNow restarts, and an out-of-horizon touch never
        pairs."""
        import json as _json

        from vulnerablecode_spark.streaming.windows import (
            attribution_candidates_stream)

        tsrc = tmp_path / "touch"; tsrc.mkdir()
        csrc = tmp_path / "conv"; csrc.mkdir()
        out = str(tmp_path / "pairs"); ckpt = str(tmp_path / "ck")

        def run():
            schema = "user_id long, ts timestamp, event_id long"
            t = spark.readStream.schema(schema).json(str(tsrc))
            c = spark.readStream.schema(schema).json(str(csrc))
            (attribution_candidates_stream(t, c, horizon="24 hours",
                                           touch_watermark="1 hour",
                                           conv_watermark="1 hour")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start().awaitTermination())

        def emit(d, name, rows):
            with open(d / name, "w") as f:
                for u, ts, i in rows:
                    f.write(_json.dumps(
                        {"user_id": u, "ts": ts, "event_id": i}) + "\n")

        emit(tsrc, "t1.json", [
            (1, "2024-01-01T00:00:00", 10),
            (1, "2024-01-01T06:00:00", 11),
            (2, "2023-12-30T00:00:00", 20),  # >24h before user-2 conv
        ])
        emit(csrc, "c1.json", [
            (1, "2024-01-01T12:00:00", 100),
        ])
        run()
        got1 = {(r.conv_id, r.touch_id)
                for r in spark.read.parquet(out).collect()}
        assert got1 == {(100, 10), (100, 11)}

        # second batch: a conversion for user 2 inside no touch's
        # horizon, and one more user-1 conversion pairing both touches
        emit(csrc, "c2.json", [
            (2, "2024-01-01T00:00:00", 200),
            (1, "2024-01-01T18:00:00", 101),
        ])
        run()
        got2 = {(r.conv_id, r.touch_id)
                for r in spark.read.parquet(out).collect()}
        assert got2 == {(100, 10), (100, 11), (101, 10), (101, 11)}
        # exactly-once: the first batch's pairs were not re-emitted
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 4
