"""Federated corpus export: partitioned output with an incremental
checkpoint, plus the FederatedCode per-purl YAML tree layout.

Reference: pipes/export.py:25-100 + exporters/federate_vulnerabilities.py —
full or incremental export of the advisory corpus to per-purl partitioned
paths, with a checkpoint recording what was already exported so the next
run ships only changes. The FederatedCode layout
(aboutcode/hashid/__init__.py:30-96) places each package's
``vulnerabilities.yml``/``purls.yml`` under a purl-hash-balanced
directory tree (``aboutcode-packages-<type>-<hash>/<type>/[<ns>/]<name>``)
and each advisory under ``advisories/<avid>.yml``.

Spark shape: ``partitionBy`` write (partition pruning for consumers) + a
watermark checkpoint on ``date_collected`` (Delta change feed would
replace the watermark with table versions). The YAML-tree export derives
every path as a COLUMN (sha2 + conv arithmetic, no Python in the path
math), renders YAML via Arrow-batched mapInPandas, and writes the file
tree with foreachPartition — executors write in parallel against a
shared filesystem (the git work tree in the reference's deployment).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def load_checkpoint(path: str) -> str | None:
    """Last exported date_collected watermark (export.py:59-76)."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f).get("exported_until")


def save_checkpoint(path: str, exported_until: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"exported_until": exported_until}, f)


def export_advisories(advisories: DataFrame, out_dir: str,
                      checkpoint_path: str | None = None) -> int:
    """Export latest advisories as JSON partitioned by datasource.

    With a checkpoint: only advisories collected after the watermark
    (incremental export, federate_vulnerabilities.py:78-88); the watermark
    advances to the batch max afterwards. Returns exported row count.

    The batch is materialized ONCE (localCheckpoint) so the count, the
    write, and the watermark max all see the same snapshot — without it a
    concurrent table swap between actions could advance the checkpoint
    past rows never written. The strict ``>`` watermark itself assumes
    the sequential scheduler (streaming/runlog.py): merge runs stamp
    monotone ``date_collected`` values, so no later merge can introduce
    rows at-or-before an exported watermark; a concurrent-writer
    deployment replaces the watermark with Delta table versions (the
    module docstring's note).
    """
    batch = advisories.filter(F.col("is_latest"))
    watermark = load_checkpoint(checkpoint_path) if checkpoint_path else None
    if watermark:
        batch = batch.filter(F.col("date_collected") > F.lit(watermark).cast("timestamp"))
    batch = batch.withColumn(
        "export_path",
        F.concat_ws("/", "datasource_id", "advisory_id"),
    ).localCheckpoint(eager=True)
    count = batch.count()
    if count:
        (
            batch.write.mode("append")
            .partitionBy("datasource_id")
            .json(out_dir)
        )
        if checkpoint_path:
            max_ts = batch.agg(F.max("date_collected")).first()[0]
            save_checkpoint(checkpoint_path, str(max_ts))
    return count


# ---------------------------------------------------------------------------
# FederatedCode per-purl YAML tree (VERDICT r6 directive #2)
# ---------------------------------------------------------------------------


def _purl_hash_col(core_purl, type_col):
    """Column twin of kernel.hashid.get_purl_hash: sha256 over the
    canonical core-purl string, low bits modulo the ecosystem's
    2**bit_count, lowercase hex left-padded to ceil(bits/4) chars (one
    char minimum — bit_count 0 renders '0'). Only the digest's low 32
    bits participate (bit_count <= 10), so the modulo runs on
    ``conv(substring(sha2(...), 57, 8))`` — pure JVM arithmetic, no
    Python in the 100 TB path."""
    from vulnerablecode_spark.kernel.hashid import BIT_COUNT_BY_ECOSYSTEM

    bit_pairs, mod_pairs = [], []
    for t, bits in BIT_COUNT_BY_ECOSYSTEM.items():
        bit_pairs.extend([F.lit(t), F.lit(bits)])
        mod_pairs.extend([F.lit(t), F.lit(2 ** bits)])
    bits_col = F.coalesce(
        F.element_at(F.create_map(*bit_pairs), type_col), F.lit(0))
    mod_col = F.coalesce(
        F.element_at(F.create_map(*mod_pairs), type_col),
        F.lit(1)).cast("bigint")
    low32 = F.conv(F.substring(F.sha2(core_purl, 256), 57, 8), 16, 10) \
        .cast("bigint")
    short = low32 % mod_col
    hex_str = F.lower(F.conv(short.cast("string"), 10, 16))
    # pad width ceil(bits/4), minimum 1 — the tier table only yields
    # widths 1 (0 bits), 2 (5/7 bits), 3 (10 bits)
    return (F.when(bits_col > 8, F.lpad(hex_str, 3, "0"))
            .when(bits_col > 4, F.lpad(hex_str, 2, "0"))
            .otherwise(F.lpad(hex_str, 1, "0")))


def _quote_seg(col):
    """Column twin of Python ``urllib.parse.quote(s, safe="")`` — the
    encoding ``Purl.to_string`` applies to name/namespace segments.
    ``url_encode`` is java.net.URLEncoder (form encoding); the full
    symmetric difference vs urllib is space (``+`` vs ``%20``), ``*``
    (java-safe) and ``~`` (python-safe), fixed up below. Literal ``+``
    in the input is already ``%2B`` after url_encode, so the first
    replace only touches encoded spaces."""
    enc = F.url_encode(col)
    enc = F.replace(enc, F.lit("+"), F.lit("%20"))
    enc = F.replace(enc, F.lit("*"), F.lit("%2A"))
    return F.replace(enc, F.lit("%7E"), F.lit("~"))


def package_tree_paths(package_relations: DataFrame) -> DataFrame:
    """Add the FederatedCode layout columns to a per-version package
    frame (columns: type, namespace, name, version, package_url,
    affected_by_advisories, fixing_advisories): ``core_purl`` (the
    versionless canonical purl — the hash input, with name/namespace
    percent-quoted exactly like ``Purl.to_string`` so the column-side
    sha256 matches the driver-side ``kernel.hashid`` pathing for
    reserved-character names) and ``base_dir``
    (``aboutcode-packages-<type>-<hash>/<type>/[<ns>/]<name>``)."""
    ns_quoted = F.array_join(
        F.transform(F.split(F.col("namespace"), "/"),
                    lambda seg: _quote_seg(seg)), "/")
    core = F.concat(
        F.lit("pkg:"), F.col("type"), F.lit("/"),
        F.when(F.col("namespace") != "",
               F.concat(ns_quoted, F.lit("/"))).otherwise(F.lit("")),
        _quote_seg(F.col("name")))
    df = package_relations.withColumn("core_purl", core)
    base = F.concat(
        F.lit("aboutcode-packages-"), F.col("type"), F.lit("-"),
        _purl_hash_col(F.col("core_purl"), F.col("type")), F.lit("/"),
        F.col("type"), F.lit("/"),
        F.when(F.col("namespace") != "",
               F.concat(F.col("namespace"), F.lit("/"))).otherwise(F.lit("")),
        F.col("name"))
    return df.withColumn("base_dir", base)


def _write_tree(files: DataFrame, repo_path: str) -> int:
    """Write (relative_path, content) rows as files under ``repo_path``
    from the executors. Parallel, idempotent (full overwrite per file);
    on a cluster ``repo_path`` is a shared filesystem / git work tree."""
    files = files.localCheckpoint(eager=True)  # snapshot before side effect
    count = files.count()

    def write_partition(rows):
        import os as _os

        for row in rows:
            target = _os.path.join(repo_path, row.relative_path)
            _os.makedirs(_os.path.dirname(target), exist_ok=True)
            with open(target, "w", encoding="utf-8") as fh:
                fh.write(row.content)

    files.foreachPartition(write_partition)
    return count


def export_package_tree(package_relations: DataFrame, repo_path: str,
                        changed_avids: DataFrame | None = None) -> int:
    """Write per-package ``vulnerabilities.yml`` + ``purls.yml`` into the
    purl-hash directory tree (pipes/export.py get_package_related_advisory
    + hashid pathing).

    ``package_relations``: one row per version purl with columns
    (type, namespace, name, version, package_url,
    affected_by_advisories array<string>, fixing_advisories
    array<string>). ``vulnerabilities.yml`` lists every version purl of
    the package with its sorted advisory ids; ``purls.yml`` lists the
    known version purls. Incremental: with ``changed_avids`` (a frame of
    ``avid`` rows), only packages related to a changed advisory are
    rewritten — but each rewritten file still carries ALL versions of
    that package (the file is the unit of consistency), so the frame is
    first semi-joined per package, not per row. Returns files written.
    """
    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(package_relations.sparkSession)

    with_paths = package_tree_paths(package_relations)
    if changed_avids is not None:
        touched = (with_paths
                   .select("core_purl",
                           F.explode(F.concat(
                               F.coalesce("affected_by_advisories",
                                          F.array().cast("array<string>")),
                               F.coalesce("fixing_advisories",
                                          F.array().cast("array<string>")),
                           )).alias("avid"))
                   .join(F.broadcast(changed_avids), "avid", "left_semi")
                   .select("core_purl").distinct())
        with_paths = with_paths.join(F.broadcast(touched), "core_purl",
                                     "left_semi")

    entry = F.struct(
        F.col("package_url").alias("purl"),
        F.array_sort(F.coalesce("affected_by_advisories",
                                F.array().cast("array<string>")))
        .alias("affected_by_advisories"),
        F.array_sort(F.coalesce("fixing_advisories",
                                F.array().cast("array<string>")))
        .alias("fixing_advisories"),
        F.col("version"),
    )
    per_package = (
        with_paths.groupBy("base_dir")
        .agg(F.array_sort(F.collect_list(entry)).alias("entries"))
        .select(
            "base_dir",
            F.to_json(F.col("entries"), {"ignoreNullFields": "false"})
            .alias("entries_json"))
    )

    out_schema = "relative_path string, content string"

    def render(batches):
        import json as _json

        import pandas as _pd

        from vulnerablecode_spark.kernel.yamldump import dump_yaml

        for pdf in batches:
            paths, contents = [], []
            for base_dir, entries_json in zip(pdf["base_dir"],
                                              pdf["entries_json"]):
                entries = _json.loads(entries_json)
                vulns = [{"purl": e["purl"],
                          "affected_by_advisories":
                              e["affected_by_advisories"],
                          "fixing_advisories": e["fixing_advisories"]}
                         for e in entries]
                purls = [e["purl"] for e in entries]
                paths.append(f"{base_dir}/vulnerabilities.yml")
                contents.append(dump_yaml(vulns))
                paths.append(f"{base_dir}/purls.yml")
                contents.append(dump_yaml(purls))
            if paths:
                yield _pd.DataFrame({"relative_path": paths,
                                     "content": contents})

    files = per_package.mapInPandas(render, out_schema)
    return _write_tree(files, repo_path)


def export_advisory_tree(advisories: DataFrame, repo_path: str) -> int:
    """Write one ``advisories/<avid>.yml`` per advisory
    (federate_vulnerabilities.py publish_advisories +
    pipes/export.py serialize_advisory field order).

    ``advisories``: canonical advisory frame with columns advisory_id,
    avid, url, aliases array<string>, summary, and optional nested
    arrays ``impacted_packages`` / ``severities`` / ``weaknesses`` /
    ``references`` (missing ones render as empty lists). Returns files
    written."""
    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(advisories.sparkSession)

    cols = [
        F.col("advisory_id"),
        F.col("avid").alias("datasource_id"),
        F.col("url").alias("datasource_url"),
        F.array_sort(F.coalesce("aliases", F.array().cast("array<string>")))
        .alias("aliases"),
        F.coalesce("summary", F.lit("")).alias("summary"),
    ]
    for opt in ("impacted_packages", "severities", "weaknesses",
                "references"):
        if opt in advisories.columns:
            cols.append(F.col(opt))
    doc = advisories.select(
        F.col("avid"),
        F.to_json(F.struct(*cols), {"ignoreNullFields": "false"})
        .alias("doc_json"))

    out_schema = "relative_path string, content string"

    def render(batches):
        import json as _json

        import pandas as _pd

        from vulnerablecode_spark.kernel.yamldump import dump_yaml

        for pdf in batches:
            paths, contents = [], []
            for avid, doc_json in zip(pdf["avid"], pdf["doc_json"]):
                data = _json.loads(doc_json)
                for opt in ("impacted_packages", "severities",
                            "weaknesses", "references"):
                    data.setdefault(opt, [])
                paths.append(f"advisories/{avid}.yml")
                contents.append(dump_yaml(data))
            if paths:
                yield _pd.DataFrame({"relative_path": paths,
                                     "content": contents})

    files = doc.mapInPandas(render, out_schema)
    return _write_tree(files, repo_path)


def _boundary_dir(checkpoint_path: str) -> str:
    """Side parquet of avids already exported AT the watermark timestamp
    (see federated_export)."""
    return checkpoint_path + ".boundary"


def federated_export(package_relations: DataFrame, advisories: DataFrame,
                     repo_path: str,
                     checkpoint_path: str | None = None) -> dict:
    """Full or incremental FederatedCode export: the per-purl YAML tree
    plus per-advisory files, gated on the ``date_collected`` watermark
    (federate_vulnerabilities.py load_checkpoint/save_checkpoint —
    delete the checkpoint to force a full re-export). Incremental runs
    rewrite only the advisories collected after the watermark and the
    package files related to them. Returns
    {"package_files": n, "advisory_files": n}.

    Watermark semantics: ``date_collected`` can be coarse, so a strict
    ``>`` filter would permanently skip an advisory that arrives later
    but is stamped EQUAL to the watermark. Instead rows at exactly the
    watermark are re-considered and anti-joined against the avids
    already exported at that timestamp (persisted as a parquet side
    file next to the checkpoint — a join, not ``isin`` literals, so a
    million-row boundary batch from one merge run costs one shuffle-free
    broadcast anti-join, never a giant plan). Exactly-once per file,
    late-equal-stamp arrivals included. A crash between the boundary
    write and the checkpoint write at worst re-exports boundary rows
    once — per-file overwrite is idempotent.
    """
    import shutil

    watermark = load_checkpoint(checkpoint_path) if checkpoint_path else None
    batch = advisories
    if watermark:
        wm = F.lit(watermark).cast("timestamp")
        newer = batch.filter(F.col("date_collected") > wm)
        at_wm = batch.filter(F.col("date_collected") == wm)
        bdir = _boundary_dir(checkpoint_path)
        if os.path.isdir(bdir):
            spark = advisories.sparkSession
            seen = spark.read.parquet(bdir).select("avid")
            at_wm = at_wm.join(F.broadcast(seen), "avid", "left_anti")
        batch = newer.unionByName(at_wm)
    batch = batch.localCheckpoint(eager=True)  # one snapshot for both
    # trees and the watermark advance (same rationale as
    # export_advisories above)
    changed = batch.select("avid") if watermark else None
    n_adv = export_advisory_tree(batch, repo_path)
    n_pkg = export_package_tree(package_relations, repo_path,
                                changed_avids=changed)
    if checkpoint_path and n_adv:
        max_ts = batch.agg(F.max("date_collected")).first()[0]
        new_boundary = batch.filter(
            F.col("date_collected") == F.lit(max_ts)).select("avid")
        if watermark and str(max_ts) == str(watermark) \
                and os.path.isdir(_boundary_dir(checkpoint_path)):
            prev = batch.sparkSession.read.parquet(
                _boundary_dir(checkpoint_path)).select("avid")
            new_boundary = new_boundary.unionByName(prev).distinct()
        bdir = _boundary_dir(checkpoint_path)
        tmp = bdir + ".new"
        new_boundary.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(bdir):
            shutil.rmtree(bdir)
        os.rename(tmp, bdir)
        save_checkpoint(checkpoint_path, str(max_ts))
    return {"package_files": n_pkg, "advisory_files": n_adv}
