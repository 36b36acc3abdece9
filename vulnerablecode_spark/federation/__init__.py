"""Cross-database federation (the reference's vulntotal subsystem),
re-expressed as DataFrame stages over a purl manifest.

Registry of datasource adapters; each module exposes
``supported_ecosystem()``, ``request_for(purl)`` (fixture-verified
payload/URL generation), pure ``parse_*`` helpers over recorded
responses, and a Spark ``parse(responses_df)`` stage yielding the
normalized VendorData claims frame that feeds
``operators/compare.py``.

Provenance note: these adapters speak third-party WIRE formats, so the
API constants — endpoint URLs, ecosystem-name tables, JSON/GraphQL
payload shapes, response field names — necessarily match the
reference's (and any other client's); byte-parity there is the point,
verified against the reference's recorded fixtures. The code around
them (DataFrame staging, the stdlib-HTML DOM, the constraint
evaluators) is this engine's own design.
"""

from __future__ import annotations

from vulnerablecode_spark.federation import (deps, github, gitlab,
                                             oss_index, osv, safetydb,
                                             snyk, vulnerablecode_io)
from vulnerablecode_spark.federation.base import (VENDOR_DATA_SCHEMA,
                                                  fetch_stage,
                                                  request_plan)

DATASOURCES = {
    "deps": deps,
    "github": github,
    "gitlab": gitlab,
    "oss_index": oss_index,
    "osv": osv,
    "safetydb": safetydb,
    "snyk": snyk,
    "vulnerablecode": vulnerablecode_io,
}

REQUEST_GENERATORS = {name: module.request_for
                      for name, module in DATASOURCES.items()}

__all__ = [
    "DATASOURCES",
    "REQUEST_GENERATORS",
    "VENDOR_DATA_SCHEMA",
    "fetch_stage",
    "request_plan",
]
