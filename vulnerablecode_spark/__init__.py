"""vulnerablecode_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of aboutcode-org/vulnerablecode.

The reference (/root/reference) is a Django+PostgreSQL vulnerability-database
builder; this package re-expresses its data model (SURVEY.md §1), operator
inventory (§2) and pipelines (§3) as idiomatic Spark SQL / DataFrame programs
designed for a 1000-executor, 100 TB deployment:

- ``kernel/``     pure-Python semantic kernels (purl, vers, version ordering,
                  canonical content-id, CVSS) — no Spark imports, unit-tested
                  in isolation.
- ``functions/``  Spark column expressions + (pandas-)UDF wrappers over the
                  kernels; everything that CAN be a built-in Catalyst
                  expression IS one.
- ``sources/``    source-format parsers (OSV, EPSS, KEV, GitLab YAML, Debian
                  tracker, OVAL XML) producing the canonical advisory
                  DataFrame.
- ``operators/``  the relational/analytic operator library (dedup+SCD2,
                  tiered search, lookup, version ranking, unfurl, risk,
                  grouping, ghost flagging, exploit enrichment, todos).
- ``llm/``        large-scale training-data operators (exact/minhash/simhash
                  dedup, ANN similarity, text analysis, multimodal columns).
- ``streaming/``  incremental processing: watermarked merges, partitioned
                  export with checkpointing, changelog streams.
"""

__version__ = "0.1.0"


def ensure_shipped(spark) -> None:
    """Ship this package to Spark's Python workers via ``addPyFile``.

    Kernel-backed pandas UDFs (purl/version semantics) are pickled BY
    REFERENCE and unpickled on workers, which import
    ``vulnerablecode_spark`` — but workers only share the driver's
    sys.path when the driver happens to run from the repo root. Zipping
    the package once per session makes every UDF location-independent
    (the cluster equivalent of ``spark-submit --py-files``).

    Idempotent and cheap: called from each UDF-using operator.
    """
    sc = spark.sparkContext
    if getattr(sc, "_vulnerablecode_spark_shipped", False):
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # Content-address the zip name: a fixed name silently ships STALE code
    # to workers after any source edit (and across driver rounds sharing
    # /tmp). Hash every .py's (path, size, mtime) — cheap, no file reads.
    import hashlib

    stat = hashlib.sha256()
    for root, _, files in sorted(os.walk(pkg_dir)):
        for fn in sorted(files):
            if fn.endswith(".py"):
                st = os.stat(os.path.join(root, fn))
                stat.update(f"{root}/{fn}:{st.st_size}:{st.st_mtime_ns};"
                            .encode())
    digest = stat.hexdigest()[:16]
    zpath = os.path.join(tempfile.gettempdir(),
                         f"vulnerablecode_spark-{__version__}-{digest}.zip")
    if not os.path.exists(zpath):
        fd, tmp = tempfile.mkstemp(suffix=".zip")
        os.close(fd)
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    sc._vulnerablecode_spark_shipped = True
