"""Composed incremental maintenance: ONE pass over an arriving document
batch updates EVERY stored index / serving artifact the incremental
operators maintain — atomically, with crash-resume.

The repo's incremental operators each keep their own store: the LSH
near-dup index (llm/dedup.py near_dup_pairs_incremental, graded q63),
the line-dedup segment-count index + postings + cleaned serving copy
(line_level_dedup_incremental / retro_reclean, q105/q110), and the IVF
assignment table (llm/similarity.py ivf_index_incremental, q97). In
production one ingest job maintains all of them, sharing the expensive
batch-derived frames (the shingle hashes feed both the band frame and
the pair scoring; the batch is checkpointed once). This module is that
driver — the reference's analogue is one pipeline run advancing every
derived table it owns (pipelines/__init__.py run-state machine), here
re-expressed as a multi-artifact commit.

Layout (all under one ``root``)::

    root/
      _ledger.json               applied batches + watermark (commit log)
      docs/delta-<b>/            original (doc_id, text) corpus store
      neardup/hashed/delta-<b>/  (doc_id, h) shingle hashes
      neardup/bands/delta-<b>/   band frame rows (doc_id, band, band_sig, n_sh)
      neardup/pairs/delta-<b>/   (doc_a, doc_b, jaccard) touching batch b
      linededup/counts/delta-<b>/   per-batch (seg, n_docs) count DELTAS
      linededup/postings/delta-<b>/ (seg, doc_id)
      linededup/cleaned/delta-<b>/  cleaned rows (+ _batch), LAST BATCH WINS
      ivf/centroids/             centroid snapshot (written on first build)
      ivf/assigned/delta-<b>/    (vec_id, embedding, cell) assignments
      bm25/postings/delta-<b>/   (doc_id, tok, tf) inverted index rows
      bm25/lengths/delta-<b>/    (doc_id, dl) document lengths
      bigramlm/counts/delta-<b>/ (w1, w2, c_big) LM count deltas
      unimax/langtokens/delta-<b>/ (lang, lang_tokens) mixture deltas
      vocab/firstbatch/delta-<b>/  (tok, first_batch) NEW types only
      sketch/kmvtokens/delta-<b>/  (lang, h) the batch's own bottom-k
      sketch/hllregisters/delta-<b>/ (lang, reg, m) the batch's own registers

Every artifact is delta-append (per-batch work ∝ batch — the q63/q97/
q105 discipline): segment counts are ADDITIVE across disjoint batches,
so the stored counts are per-batch deltas summed at read time
(:func:`read_seg_counts`); the cleaned serving copy resolves
last-batch-wins at read time (:func:`read_cleaned` — re-cleaned rows
from a later batch shadow the original clean, the SCD-current-view
shape of operators/ingest.py). On Delta/Iceberg the read-time
resolution becomes periodic compaction/MERGE; with plain parquet it is
a groupBy over the deltas, which stays correct at any scale because
delta count is bounded by compaction cadence, not corpus size.

Commit protocol (the multi-artifact twin of operators/serve.py's staged
shard swap): all of a batch's delta dirs are written under
``root/.staging/`` while live dirs stay untouched; a ``_COMMITTED``
marker (carrying batch_id, watermark and the install list) flips the
run from roll-BACK to roll-FORWARD; installs are one ``os.replace`` per
artifact (idempotent — an already-installed target just drops its
staged copy), and the ledger entry lands INSIDE the roll-forward,
before staging cleanup, so data and watermark commit together (the r8
freshness-inside-marker rule). :func:`recover_increment` — called on
every entry — finishes or undoes an interrupted run, and the ledger
makes driver-level replays (e.g. a foreachBatch retry) no-ops.

SINGLE-WRITER contract, stated precisely: recovery-on-read means a
READER that observes marker-less staging treats it as an aborted run
and rolls it back — so reads must not interleave with an ACTIVE
writer's staging window (between first staged write and marker).
Writers serialize trivially (one ingest job owns the store); readers
run between commits. On Delta/Iceberg this window disappears behind
the table format's own atomic commit.

IVF policy: the composed driver is ASSIGN-ONLY — the per-batch
production shape — and records each batch's assignment quality and max
cell share in the ledger; the drift/skew-triggered REBUILD
(ivf_index_incremental, graded q97) is an offline maintenance decision
made from those recorded stats, not something a streaming commit should
do mid-batch.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.llm import dedup as nd

# relative artifact paths (delta parents)
DOCS = "docs"
ND_HASHED = "neardup/hashed"
ND_BANDS = "neardup/bands"
ND_PAIRS = "neardup/pairs"
LD_COUNTS = "linededup/counts"
LD_POSTINGS = "linededup/postings"
LD_CLEANED = "linededup/cleaned"
IVF_CENTROIDS = "ivf/centroids"
IVF_ASSIGNED = "ivf/assigned"
CC_LABELS = "components/labels"
CC_REMAPS = "components/remaps"
BM25_POSTINGS = "bm25/postings"
BM25_LENGTHS = "bm25/lengths"
BLM_COUNTS = "bigramlm/counts"
LANG_TOKENS = "unimax/langtokens"
VOCAB = "vocab/firstbatch"
SK_TOKENS = "sketch/kmvtokens"
SK_HLLREG = "sketch/hllregisters"

# bottom-k size for the per-language token sketch artifact (q160-q162's
# KMV family as a stored, mergeable summary)
KMV_K = 128

_SCHEMAS = {
    DOCS: "doc_id long, text string",
    ND_HASHED: "doc_id long, h long",
    ND_BANDS: "doc_id long, band int, band_sig long, n_sh long",
    ND_PAIRS: "doc_a long, doc_b long, jaccard double",
    LD_COUNTS: "seg string, n_docs long",
    LD_POSTINGS: "seg string, doc_id long",
    LD_CLEANED: ("doc_id long, cleaned_text string, segs_total long, "
                 "segs_dropped long, _batch long"),
    # cell carries the centroid id = a seed vec_id (ivf_index seeds
    # centroids from corpus rows), hence long, not a 0..n-1 int
    IVF_ASSIGNED: "vec_id long, embedding array<double>, cell long",
    CC_LABELS: "node long, component long, _batch long",
    CC_REMAPS: "_old long, _new long, _batch long",
    BM25_POSTINGS: "doc_id long, tok string, tf long",
    BM25_LENGTHS: "doc_id long, dl long",
    BLM_COUNTS: "w1 string, w2 string, c_big long",
    LANG_TOKENS: "lang string, lang_tokens long",
    VOCAB: "tok string, first_batch long",
    SK_TOKENS: "lang string, h long",
    # reg matches hll_registers' output type (h % 64 stays bigint)
    SK_HLLREG: "lang string, reg long, m int",
}


def _ledger_path(root: str) -> str:
    return os.path.join(root, "_ledger.json")


def _staging(root: str) -> str:
    return os.path.join(root, ".staging")


def _marker(root: str) -> str:
    return os.path.join(_staging(root), "_COMMITTED")


def read_ledger(root: str) -> dict:
    try:
        with open(_ledger_path(root)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {"batches": [], "watermark": None}


def _write_ledger(root: str, ledger: dict) -> None:
    tmp = _ledger_path(root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(ledger, fh)
    os.replace(tmp, _ledger_path(root))


def _finish_commit(root: str) -> None:
    """Roll the committed staging forward: install every staged dir at
    its live path (idempotent — resumable after a crash at any rename),
    append the ledger entry, then drop staging. The ledger write is
    INSIDE the commit so artifacts and watermark advance together."""
    with open(_marker(root)) as fh:
        manifest = json.load(fh)
    for staged_rel, live_rel in manifest["installs"]:
        staged = os.path.join(_staging(root), staged_rel)
        live = os.path.join(root, live_rel)
        if os.path.exists(live):
            shutil.rmtree(staged, ignore_errors=True)
            continue
        os.makedirs(os.path.dirname(live), exist_ok=True)
        if os.path.exists(staged):
            os.replace(staged, live)
    # swaps replace a WHOLE live artifact dir (compaction): park the old
    # dir, install the staged replacement, then drop the parking — each
    # step idempotent so a resumed roll-forward finishes cleanly
    for staged_rel, live_rel in manifest.get("swaps", []):
        staged = os.path.join(_staging(root), staged_rel)
        live = os.path.join(root, live_rel)
        parked = live.rstrip("/") + ".compact-old"
        if os.path.exists(staged):
            if os.path.exists(live) and not os.path.exists(parked):
                os.replace(live, parked)
            elif os.path.exists(live):
                shutil.rmtree(live)
            os.makedirs(os.path.dirname(live), exist_ok=True)
            os.replace(staged, live)
        shutil.rmtree(parked, ignore_errors=True)
    ledger = read_ledger(root)
    entry = manifest.get("entry")
    if entry is not None and entry["batch_id"] not in [
            b["batch_id"] for b in ledger["batches"]]:
        ledger["batches"].append(entry)
        ledger["watermark"] = entry["watermark"]
        _write_ledger(root, ledger)
    comp = manifest.get("compaction")
    if comp is not None and comp["id"] not in [
            c["id"] for c in ledger.get("compactions", [])]:
        ledger["compactions"] = ledger.get("compactions", []) + [comp]
        _write_ledger(root, ledger)
    shutil.rmtree(_staging(root), ignore_errors=True)


def recover_increment(root: str) -> None:
    """Crash recovery, called on every entry: staging without the marker
    rolls BACK (live state untouched = pre-batch); staging with the
    marker rolls FORWARD (finish installs + ledger). Either way readers
    see a consistent multi-artifact state."""
    st = _staging(root)
    if not os.path.isdir(st):
        return
    if os.path.exists(_marker(root)):
        _finish_commit(root)
    else:
        shutil.rmtree(st, ignore_errors=True)


def _read_artifact(spark: SparkSession, root: str, rel: str) -> DataFrame:
    """All delta dirs of one artifact as a single frame (empty frame with
    the declared schema when nothing is installed yet)."""
    recover_increment(root)
    path = os.path.join(root, rel)
    has_data = os.path.isdir(path) and any(
        d.startswith("delta-") for d in os.listdir(path))
    if not has_data:
        # cold start: empty frame with the declared schema (the written
        # parquet's own schema is authoritative once data exists)
        return spark.createDataFrame([], _SCHEMAS[rel])
    return (spark.read.option("recursiveFileLookup", "true").parquet(path))


def read_docs(spark, root):
    return _read_artifact(spark, root, DOCS)


def read_hashed(spark, root):
    return _read_artifact(spark, root, ND_HASHED)


def read_bands(spark, root):
    return _read_artifact(spark, root, ND_BANDS)


def read_pairs(spark, root):
    return _read_artifact(spark, root, ND_PAIRS)


def read_postings(spark, root):
    return _read_artifact(spark, root, LD_POSTINGS)


def read_bm25_postings(spark, root):
    return _read_artifact(spark, root, BM25_POSTINGS)


def read_bm25_lengths(spark, root):
    return _read_artifact(spark, root, BM25_LENGTHS)


def read_bigram_counts(spark, root) -> DataFrame:
    """Summed per-batch bigram-count deltas — exact because counts over
    disjoint batches are additive (llm/text.py bigram_counts). The LM
    vocabulary re-derives from the BM25 postings artifact
    (COUNT(DISTINCT tok)) — one store, two models."""
    return (_read_artifact(spark, root, BLM_COUNTS)
            .groupBy("w1", "w2").agg(F.sum("c_big").alias("c_big")))


def read_lang_tokens(spark, root) -> DataFrame:
    """Summed per-batch language-token deltas — exact because token
    counts over disjoint batches are additive (llm/curate.py
    lang_token_counts). Feed straight into unimax_from_counts (q126):
    the mixture re-derives after every ingest without a corpus scan."""
    return (_read_artifact(spark, root, LANG_TOKENS)
            .groupBy("lang").agg(F.sum("lang_tokens").alias("lang_tokens")))


def read_vocab(spark, root) -> DataFrame:
    """Vocabulary first-seen index (tok, first_batch) — deltas hold NEW
    types only (anti-joined against the stored index at apply time, so
    delta size follows the Heaps-sublinear new-type curve, q145), and
    min() at read keeps the resolution idempotent under any replayed
    delta (llm/text.py vocab_first_seen)."""
    return (_read_artifact(spark, root, VOCAB)
            .groupBy("tok").agg(F.min("first_batch").alias("first_batch")))


def read_token_sketch(spark, root, k: int = KMV_K) -> DataFrame:
    """Per-language KMV bottom-k token sketch (lang, h, pos): each delta
    is its batch's own bottom-k, and the read re-cuts the union
    (llm/sketch.py kmv_merge) — bottom-k of a union IS the re-cut union
    of bottom-k's, so the resolved sketch equals the from-scratch sketch
    over every document ever applied. Distinct-token cardinality and
    cross-group overlap estimates (q160-q162) read off O(langs × k)
    state; per-batch work ∝ batch."""
    from vulnerablecode_spark.llm.sketch import kmv_merge

    return kmv_merge(_read_artifact(spark, root, SK_TOKENS),
                     k=k, group_cols=("lang",))


def read_hll_registers(spark, root) -> DataFrame:
    """Per-language HLL register sketch (lang, reg, m): each delta is
    its batch's own 64-register sketch, and the read resolves the union
    by element-wise MAX (llm/sketch.py hll_merge) — the max-merge
    monoid, so the resolved registers equal the from-scratch sketch
    over every document ever applied. The SECOND merge class the store
    carries (the counts/postings artifacts are ADDITIVE; registers are
    idempotent maxes — replaying a slice cannot inflate them even
    outside the ledger's protection). Distinct-token estimates (q182's
    read-off) come from O(langs × 64) rows; per-batch work ∝ batch."""
    from vulnerablecode_spark.llm.sketch import hll_merge

    return hll_merge(_read_artifact(spark, root, SK_HLLREG),
                     group_cols=("lang",))


def read_seg_counts(spark, root) -> DataFrame:
    """Summed per-batch count deltas — exact because distinct-doc counts
    over disjoint batches are additive (llm/dedup.py line_seg_counts)."""
    return (_read_artifact(spark, root, LD_COUNTS)
            .groupBy("seg").agg(F.sum("n_docs").alias("n_docs")))


def _cleaned_current(df: DataFrame, keep_batch: bool) -> DataFrame:
    """The ONE definition of the cleaned copy's current view: last batch
    wins per doc (re-cleaned rows shadow the batch that first cleaned
    the doc — SCD current). Shared by the read path and compaction so
    the physically compacted store can never diverge from what readers
    resolve."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("_batch").desc())
    out = (df.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") == 1).drop("_rn"))
    return out if keep_batch else out.select(
        "doc_id", "cleaned_text", "segs_total", "segs_dropped")


def read_cleaned(spark, root) -> DataFrame:
    """Current cleaned serving copy (see :func:`_cleaned_current`)."""
    return _cleaned_current(
        _read_artifact(spark, root, LD_CLEANED), keep_batch=False)


def read_ivf_assigned(spark, root):
    return _read_artifact(spark, root, IVF_ASSIGNED)


def read_components(spark, root) -> DataFrame:
    """Current near-dup cluster labels (node, component): per-batch NEW-
    node label rows resolved through the ordered chain of per-batch
    label REMAPS (a remap at batch b folds the components batch b
    merged — min-labels compose, and a remapped-away label can never
    reappear later, so each remap applies safely to every older row;
    chains like 9→3 then 3→1 require the batch-ordered fold). The
    chain length is bounded by compaction cadence: :func:`compact`
    materializes the resolved labels as the new base and empties the
    remap log."""
    labels = _read_artifact(spark, root, CC_LABELS).select(
        "node", "component")
    remaps = _read_artifact(spark, root, CC_REMAPS)
    batches = sorted(r["_batch"] for r in
                     remaps.select("_batch").distinct().collect())
    for b in batches:
        r = remaps.filter(F.col("_batch") == b).select("_old", "_new")
        labels = (labels.join(F.broadcast(r),
                              labels["component"] == r["_old"], "left")
                  .select("node", F.coalesce("_new", "component")
                          .alias("component")))
    return labels


def read_ivf_centroids(spark, root) -> DataFrame | None:
    recover_increment(root)
    path = os.path.join(root, IVF_CENTROIDS)
    if not (os.path.isdir(path)
            and any(f.endswith(".parquet") for f in os.listdir(path))):
        return None
    return spark.read.parquet(path)


def apply_increment(spark: SparkSession, batch_docs: DataFrame, root: str,
                    *, batch_id: int, embeddings: DataFrame | None = None,
                    w: int = 3, boilerplate_min_docs: int = 3,
                    threshold: float = 0.4, n_cells: int = 4,
                    watermark: str | None = None,
                    fault_after: str | None = None) -> dict:
    """Apply one document batch (optionally with its embedding rows) to
    every stored artifact in a single atomic commit.

    Shared-frame discipline: the batch is checkpointed once; the shingle
    hashes are built ONCE and injected into both the band frame and the
    incremental pair scoring (the ``new_hashed``/``new_bands`` injection
    points of near_dup_pairs_incremental); the batch segment counts
    feed the batch clean, the newly-common work list AND the stored
    count delta. Per-batch cost ∝ batch against index scans — old×old
    never re-enters any join.

    ``fault_after`` ∈ {'staged', 'committed', 'mid-install'} injects a
    crash at that point (tests only): 'staged' dies before the marker
    (next run rolls back and re-applies), the others die inside the
    commit (next run rolls forward; the replayed batch is a ledger
    no-op either way).
    """
    os.makedirs(root, exist_ok=True)
    recover_increment(root)
    ledger = read_ledger(root)
    committed = [b["batch_id"] for b in ledger["batches"]]
    if batch_id in committed:
        return {"applied": False, "batch_id": batch_id}
    # The non-additive artifacts (cleaned last-batch-wins, the CC remap
    # chain) SERIALIZE by batch id: resolution folds/resolves in batch-
    # id order, which is apply order for every legitimate producer
    # (foreachBatch ids are monotonic; a replayed committed id is the
    # no-op above). A NEVER-committed lower id arriving after a higher
    # one is out-of-order delivery the store cannot serialize — a stale
    # row with a higher stamp would silently shadow the repair (measured:
    # applying (2, 1) left batch-2 docs serving boilerplate their retro
    # re-clean had already removed). Fail loud instead of serving stale.
    if committed and batch_id <= max(committed):
        raise ValueError(
            f"batch_id {batch_id} arrived after committed "
            f"{max(committed)}: non-monotonic batch ids cannot be "
            f"serialized by the last-batch-wins artifacts; replay a "
            f"committed id for a no-op, or renumber the batch")

    # the batch is pinned ONCE (with its lang column when present) so
    # every artifact — including the LANG_TOKENS deltas — derives from
    # the same frozen row set; re-evaluating batch_docs' lineage later
    # could diverge if the source is nondeterministic (sample/limit/
    # changed re-read)
    _cols = ["doc_id", "text"] + (
        ["lang"] if "lang" in batch_docs.columns else [])
    batch_full = batch_docs.select(*_cols).localCheckpoint(eager=True)
    batch = batch_full.select("doc_id", "text")

    # --- near-dup: shared shingle/band frames, pairs vs stored index ---
    new_hashed = nd.hashed_shingles(batch).localCheckpoint(eager=True)
    new_bands = nd.band_frame(
        nd.minhash_signatures(hashed=new_hashed, with_sizes=True),
        with_sizes=True).localCheckpoint(eager=True)
    pairs = nd.near_dup_pairs_incremental(
        None, read_hashed(spark, root), read_bands(spark, root),
        threshold=threshold, new_hashed=new_hashed,
        new_bands=new_bands).localCheckpoint(eager=True)

    # --- cluster labels: fold the batch's pairs into the stored
    # labeling via the component-level meta-CC (q115) — work ∝ touched
    # components; the stored frame is never re-clustered. Persisted as
    # batch-proportional DELTAS: label rows for NEW nodes + the label
    # remap this batch induced (read_components folds them in order).
    from vulnerablecode_spark.operators.components import \
        connected_components_incremental

    stored_labels = read_components(spark, root).localCheckpoint(eager=True)
    merged_labels = connected_components_incremental(
        stored_labels,
        pairs.select(F.col("doc_a").alias("src"),
                     F.col("doc_b").alias("dst"))).localCheckpoint(
        eager=True)
    label_remap = (
        stored_labels.withColumnRenamed("component", "_old")
        .join(merged_labels.withColumnRenamed("component", "_new"), "node")
        .filter(F.col("_old") != F.col("_new"))
        .select("_old", "_new").distinct()
        .withColumn("_batch", F.lit(batch_id).cast("long"))
    )
    new_label_rows = (
        merged_labels.join(stored_labels.select("node"), "node",
                           "left_anti")
        .withColumn("_batch", F.lit(batch_id).cast("long"))
    )

    # --- vocabulary first-seen index: the stored side MUST be read
    # BEFORE staging begins — _read_artifact runs recover_increment,
    # which rolls back marker-less staging (the compact() single-writer
    # note); the delta holds NEW types only (anti-join probe, q145/q147)
    from vulnerablecode_spark.llm.text import vocab_first_seen

    vocab_delta = vocab_first_seen(
        batch, batch_id=batch_id,
        stored=read_vocab(spark, root)).localCheckpoint(eager=True)

    # --- line dedup: clean batch, emit + repair the retro work list ---
    index_counts = read_seg_counts(spark, root).localCheckpoint(eager=True)
    batch_counts = nd.line_seg_counts(batch, w=w).localCheckpoint(eager=True)
    cleaned_new = nd.line_level_dedup_incremental(
        index_counts, batch, w=w, boilerplate_min_docs=boilerplate_min_docs,
        batch_counts=batch_counts)
    newly = nd.newly_common_segments(
        index_counts, batch_counts, boilerplate_min_docs=boilerplate_min_docs)
    work = nd.retro_reclean_ids(read_postings(spark, root), newly)
    # the work list is usually small but adversarially stale-store-
    # proportional (an increment that poisons a near-universal segment)
    # — same probed guard as every other dim in the family
    affected = read_docs(spark, root).join(
        nd._dim_side(work, 4_000_000), "doc_id", "left_semi")
    recleaned = nd.retro_reclean(
        affected, index_counts, batch_counts, w=w,
        boilerplate_min_docs=boilerplate_min_docs)
    cleaned_delta = (cleaned_new.unionByName(recleaned)
                     .withColumn("_batch", F.lit(batch_id).cast("long")))

    # --- IVF: assign-only against stored centroids (see module doc) ---
    ivf_stats: dict = {}
    staged_centroids = False
    assigned_delta = None
    if embeddings is not None:
        from vulnerablecode_spark.llm.similarity import (
            _assign_cells, ivf_assignment_quality, ivf_index)

        vecs = embeddings.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"))
        centroids = read_ivf_centroids(spark, root)
        if centroids is None:
            centroids, assigned_delta = ivf_index(vecs, n_cells)
            staged_centroids = True
        else:
            assigned_delta = _assign_cells(vecs, centroids, "vec_id",
                                           "embedding", "hof")
        q = ivf_assignment_quality(assigned_delta, centroids)
        share = (assigned_delta.groupBy("cell").count()
                 .agg(F.max("count").alias("mx"), F.sum("count").alias("n"))
                 .first())
        ivf_stats = {"ivf_quality": q,
                     "ivf_max_cell_share":
                         (share["mx"] / share["n"]) if share["n"] else 0.0,
                     "ivf_first_build": staged_centroids}

    # --- stage everything; live dirs untouched until the marker -------
    st = _staging(root)
    shutil.rmtree(st, ignore_errors=True)
    delta = f"delta-{batch_id}"
    installs: list[tuple[str, str]] = []

    def stage(df: DataFrame, rel: str) -> None:
        staged_rel = rel.replace("/", "__") + "-" + delta
        df.write.mode("overwrite").parquet(os.path.join(st, staged_rel))
        installs.append((staged_rel, f"{rel}/{delta}"))

    stage(batch, DOCS)
    stage(new_hashed, ND_HASHED)
    stage(new_bands, ND_BANDS)
    stage(pairs, ND_PAIRS)
    stage(batch_counts.select("seg", "n_docs"), LD_COUNTS)
    stage(label_remap, CC_REMAPS)
    stage(new_label_rows.select("node", "component", "_batch"), CC_LABELS)
    stage(nd.line_seg_postings(batch, w=w), LD_POSTINGS)
    stage(cleaned_delta, LD_CLEANED)
    # --- BM25 inverted index: disjoint doc ids make both artifacts
    # extend by pure delta-append of the batch's own index (q116) —
    # the stored postings are never read during the increment
    from vulnerablecode_spark.llm.text import bigram_counts, bm25_index

    bm25_postings, bm25_lengths = bm25_index(batch)
    stage(bm25_postings, BM25_POSTINGS)
    stage(bm25_lengths, BM25_LENGTHS)
    # --- bigram LM: additive count deltas (q121); vocabulary re-derives
    # from the BM25 postings, so this artifact is counts-only
    stage(bigram_counts(batch), BLM_COUNTS)
    # --- UniMax mixture: additive per-language token deltas (q126) —
    # derived from the SAME checkpointed frame as every other artifact;
    # batches without language labels fold entirely into '__null__'
    from vulnerablecode_spark.llm.curate import lang_token_counts

    lang_src = (batch_full if "lang" in batch_full.columns
                else batch_full.withColumn(
                    "lang", F.lit(None).cast("string")))
    stage(lang_token_counts(lang_src), LANG_TOKENS)
    stage(vocab_delta, VOCAB)
    # --- KMV token sketch: the batch's OWN bottom-k per language —
    # read_token_sketch re-cuts the delta union, so increment ≡ rebuild
    # by the merge property (q161); stored state is O(langs × k)
    from vulnerablecode_spark.llm.sketch import kmv_sketch

    sk_toks = lang_src.select(
        F.coalesce(F.col("lang"), F.lit("__null__")).alias("lang"),
        F.explode(F.split(F.col("text"), " ")).alias("tok"))
    stage(kmv_sketch(sk_toks, F.col("tok"), k=KMV_K,
                     group_cols=("lang",)).select("lang", "h"), SK_TOKENS)
    # --- HLL register sketch: same shared token frame, max-merge monoid
    # (q182) — read_hll_registers resolves the delta union by
    # element-wise max, so increment ≡ rebuild; state is O(langs × 64)
    from vulnerablecode_spark.llm.sketch import hll_registers

    stage(hll_registers(sk_toks, F.col("tok"), group_cols=("lang",)),
          SK_HLLREG)
    if assigned_delta is not None:
        stage(assigned_delta.select("vec_id", "embedding", "cell"),
              IVF_ASSIGNED)
    if staged_centroids:
        out = os.path.join(st, "ivf__centroids")
        centroids.write.mode("overwrite").parquet(out)
        installs.append(("ivf__centroids", IVF_CENTROIDS))

    if fault_after == "staged":
        raise RuntimeError("fault injection: staged")

    entry = {"batch_id": batch_id,
             "watermark": watermark if watermark is not None
             else str(batch_id),
             **ivf_stats}
    tmp = _marker(root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"installs": installs, "entry": entry}, fh)
    os.replace(tmp, _marker(root))

    if fault_after == "committed":
        raise RuntimeError("fault injection: committed")
    if fault_after == "mid-install":
        # perform exactly one install, then die — resume must finish
        staged_rel, live_rel = installs[0]
        live = os.path.join(root, live_rel)
        os.makedirs(os.path.dirname(live), exist_ok=True)
        os.replace(os.path.join(st, staged_rel), live)
        raise RuntimeError("fault injection: mid-install")

    _finish_commit(root)
    return {"applied": True, "batch_id": batch_id, **ivf_stats}


def compact(spark: SparkSession, root: str,
            fault_after: str | None = None) -> dict:
    """Merge every artifact's accumulated delta dirs into ONE base delta
    — the parquet stand-in for Delta/Iceberg compaction that keeps
    read-time delta counts bounded by compaction cadence instead of
    batch count (the module doc's read-time-resolution caveat, made
    real).

    Resolution happens AT compaction exactly as at read time: segment
    counts compact to their summed rows, the cleaned serving copy to its
    last-batch-wins current view (shadowed rows are physically dropped —
    the SCD-current materialization), everything else to a plain merge.
    Readers before/after see identical frames (tested).

    Runs through the same staged commit as :func:`apply_increment`, with
    whole-dir SWAPS instead of delta adds: all compacted artifacts stage
    first, one marker commits them, and the swap parks each old dir
    before installing its replacement — a kill at any point leaves every
    artifact either fully pre- or fully post-compaction. ``fault_after``
    ∈ {'staged', 'committed'} injects the crash (tests)."""
    recover_increment(root)
    ledger = read_ledger(root)
    batches = [b["batch_id"] for b in ledger["batches"]]
    if not batches:
        return {"compacted": False}
    base = f"delta-base-{max(batches)}"
    st = _staging(root)
    shutil.rmtree(st, ignore_errors=True)
    swaps: list[tuple[str, str]] = []

    def resolved(rel: str) -> DataFrame | None:
        # NOTE: must be called BEFORE any staging write — frame
        # construction runs recover_increment, which treats marker-less
        # staging as an aborted run and rolls it back (single-writer
        # protocol; a mid-staging recover would wipe our own outputs)
        path = os.path.join(root, rel)
        if not (os.path.isdir(path) and any(
                d.startswith("delta-") for d in os.listdir(path))):
            return None
        if rel == LD_COUNTS:
            return read_seg_counts(spark, root)
        if rel == BLM_COUNTS:
            return read_bigram_counts(spark, root)
        if rel == LANG_TOKENS:
            return read_lang_tokens(spark, root)
        if rel == VOCAB:
            return read_vocab(spark, root)
        if rel == SK_TOKENS:
            # compaction physically drops hashes the re-cut evicted
            return read_token_sketch(spark, root).select("lang", "h")
        if rel == SK_HLLREG:
            # compaction folds the per-batch registers to their maxes
            return read_hll_registers(spark, root)
        if rel == LD_CLEANED:
            return _cleaned_current(
                _read_artifact(spark, root, rel), keep_batch=True)
        if rel == CC_LABELS:
            # resolved through the remap chain; the compacted base
            # carries the current batch stamp and the remap log empties
            return read_components(spark, root).withColumn(
                "_batch", F.lit(max(batches)).cast("long"))
        return _read_artifact(spark, root, rel)

    rels = (DOCS, ND_HASHED, ND_BANDS, ND_PAIRS, LD_COUNTS,
            LD_POSTINGS, LD_CLEANED, IVF_ASSIGNED, CC_LABELS,
            BM25_POSTINGS, BM25_LENGTHS, BLM_COUNTS, LANG_TOKENS, VOCAB,
            SK_TOKENS, SK_HLLREG)
    frames = {rel: resolved(rel) for rel in rels}  # all BEFORE staging
    for rel, df in frames.items():
        if df is None:
            continue
        staged_rel = rel.replace("/", "__") + "-compacted"
        df.write.mode("overwrite").parquet(
            os.path.join(st, staged_rel, base))
        swaps.append((staged_rel, rel))
    if frames.get(CC_LABELS) is not None:
        # fold-complete: swap in an EMPTY remap log (no delta- subdirs
        # -> read_components sees zero pending remaps)
        empty_rel = CC_REMAPS.replace("/", "__") + "-compacted"
        os.makedirs(os.path.join(st, empty_rel), exist_ok=True)
        swaps.append((empty_rel, CC_REMAPS))

    if fault_after == "staged":
        raise RuntimeError("fault injection: staged")
    comp_id = f"c{max(batches)}-{len(ledger.get('compactions', []))}"
    tmp = _marker(root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"installs": [], "swaps": swaps, "entry": None,
                   "compaction": {"id": comp_id,
                                  "through_batch": max(batches),
                                  "artifacts": [s[1] for s in swaps]}},
                  fh)
    os.replace(tmp, _marker(root))
    if fault_after == "committed":
        raise RuntimeError("fault injection: committed")
    _finish_commit(root)
    return {"compacted": True, "id": comp_id,
            "through_batch": max(batches)}
