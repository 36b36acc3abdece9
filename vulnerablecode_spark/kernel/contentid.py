"""Canonical, order-independent content hashing for advisory dedup.

Semantics mirror the reference's content addressing
(vulnerabilities/utils.py:623-726 — canonical_value / sha256_digest /
compute_content_id_v2): nested dicts sort by key, lists sort and dedupe,
JSON serializes compactly (separators ``(",", ":")``, sorted keys), sha256
over utf-8 bytes. Byte-exact stability is the point: two advisories with
identical content must collapse to one content id on any engine.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

# V2 advisory fields that participate in the content id, in schema order.
ADVISORY_CONTENT_FIELDS = (
    "advisory_id", "aliases", "summary", "affected_packages", "references",
    "severities", "weaknesses", "patches", "url",
)


def normalize_whitespace(text: str | None) -> str:
    """Collapse runs of whitespace and trim (utils.py:612-616 semantics)."""
    if not text:
        return ""
    return " ".join(text.split())


def _sort_key(value: Any) -> str:
    # stable total order across mixed-type list elements
    return json.dumps(value, sort_keys=True, separators=(",", ":"), default=str)


def canonicalize(value: Any) -> Any:
    """Recursively sort dict keys and list elements, dedupe list elements."""
    if isinstance(value, dict):
        return {k: canonicalize(v) for k, v in sorted(value.items())}
    if isinstance(value, (list, tuple, set)):
        normalized = [canonicalize(v) for v in value]
        deduped = {_sort_key(v): v for v in normalized}
        return [deduped[k] for k in sorted(deduped)]
    return value


def canonical_json(value: Any) -> str:
    return json.dumps(canonicalize(value), sort_keys=True,
                      separators=(",", ":"), default=str)


def content_id(record: dict) -> str:
    """sha256 hex of the canonical JSON of the content-bearing fields.

    ``record`` is a plain dict (e.g. a Row.asDict(recursive=True)); only
    ADVISORY_CONTENT_FIELDS participate, missing fields normalize to
    empty values so sparse sources hash consistently.
    """
    normalized: dict[str, Any] = {}
    for field in ADVISORY_CONTENT_FIELDS:
        v = record.get(field)
        if field in ("summary", "advisory_id"):
            normalized[field] = normalize_whitespace(v)
        elif field == "url":
            normalized[field] = v or ""
        else:
            normalized[field] = canonicalize(v or [])
    return hashlib.sha256(canonical_json(normalized).encode("utf-8")).hexdigest()
