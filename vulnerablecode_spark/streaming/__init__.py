"""Incremental processing: the reference's scheduled pipelines re-expressed
as Structured Streaming / incremental batch jobs (SURVEY.md §2.9).

The reference has no true stream processing — RQ-scheduled pipelines with
watermark bookkeeping (``date_imported is null`` selection, re-unfurl
cutoffs, export checkpoints). Here:

- ``incremental``  file-source Structured Streaming ingest with
                   Trigger.AvailableNow + foreachBatch SCD2 merge, and the
                   equivalent pure-batch merge for orchestrators that
                   schedule their own runs
- ``export``       partitioned full/incremental corpus export with a
                   checkpoint watermark (federate_vulnerabilities.py)
- ``changelog``    append-only audit stream derived from merges
                   (models.py:1530-1717)
"""
