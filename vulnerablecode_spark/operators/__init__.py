"""Relational/analytic operator library over the domain tables.

Each module re-expresses one reference pipeline/queryset family
(SURVEY.md §2.2-§2.10) as set-oriented DataFrame transformations:

- ``ingest``    parsed advisories → canonical SCD2 advisory table
                (content-id dedup, is_latest maintenance)
- ``search``    tiered short-circuit search, purl-aware package search
- ``lookup``    bulk purl → affecting/fixing advisories (API v3 shape)
- ``unfurl``    vers ranges × upstream versions → concrete packages
- ``versions``  version ranking and next/latest non-vulnerable
- ``ghost``     ghost-package flagging (anti-join vs upstream versions)
- ``grouping``  advisory grouping: content-hash + union-find components
- ``exploits``  KEV/exploit catalog enrichment joins
- ``relate``    severity-advisory relation (two-key union join)
- ``todos``     cross-source conflict detection (data-quality issues)
"""
