"""String-domain kernels as pure Catalyst expressions (SURVEY.md §2.8).

Each mirrors a reference utility; all JVM-side (no Python):
reference ids, identifier classification, summary cleaning, alias URL
derivation, severity-range rendering, CWE extraction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# identifier classification regexes (importer.py:40-41, utils.py is_cve)
CVE_RE = r"(?i)^CVE-\d{4}-\d{4,19}$"
GHSA_RE = r"^GHSA-[2-9cfghjmpqrvwx]{4}-[2-9cfghjmpqrvwx]{4}-[2-9cfghjmpqrvwx]{4}$"
COMMIT_RE = r"^[0-9a-f]{7,40}$"


def is_cve(col: Column) -> Column:
    return col.rlike(CVE_RE)


def is_ghsa(col: Column) -> Column:
    return col.rlike(GHSA_RE)


def is_commit(col: Column) -> Column:
    return col.rlike(COMMIT_RE)


def clean_summary(col: Column) -> Column:
    """Trim + NUL → U+FFFD (importer.py:717-723)."""
    return F.regexp_replace(F.trim(col), "\x00", "�")


def normalize_text(col: Column) -> Column:
    """Whitespace collapse + trim (utils.py:612-616)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def reference_id_from_url(col: Column) -> Column:
    """Last path segment of a URL (utils.py:342-350)."""
    return F.element_at(F.split(F.regexp_replace(col, "/+$", ""), "/"), -1)


def cwe_number(col: Column) -> Column:
    """'CWE-79' → 79 (utils.py:431-444); non-matching values (e.g.
    'NVD-CWE-noinfo') yield null instead of an ANSI cast error — the
    session default is ansi.enabled, where CAST('' AS INT) throws."""
    return F.nullif(
        F.regexp_extract(col, r"(?i)CWE-(\d+)", 1), F.lit("")).cast("int")


def alias_url(col: Column) -> Column:
    """CVE → nvd.nist.gov, GHSA → github.com advisory URL
    (models.py:1334-1348)."""
    return (
        F.when(is_cve(col), F.concat(F.lit("https://nvd.nist.gov/vuln/detail/"), col))
        .when(is_ghsa(col), F.concat(F.lit("https://github.com/advisories/"), col))
        .otherwise(F.lit(None).cast("string"))
    )


def severity_range(values: Column) -> Column:
    """Array of numeric scores → 'lo - hi' display string
    (utils.py:512-546)."""
    return F.when(
        F.size(values) > 0,
        F.concat_ws(" - ",
                    F.round(F.array_min(values), 1).cast("string"),
                    F.round(F.array_max(values), 1).cast("string")),
    ).otherwise(F.lit(None).cast("string"))


def url_host(col: Column) -> Column:
    """Severity-source host for the weight lookup (risk.py:42-46)."""
    return F.parse_url(col, F.lit("HOST"))


def build_description(summary: Column, description: Column) -> Column:
    """Combine summary + description (utils.py:326-340, vendored from
    scancode): empty description → summary; summary already contained in
    the description → description alone; otherwise summary, newline,
    description."""
    s = F.trim(F.coalesce(summary, F.lit("")))
    d = F.trim(F.coalesce(description, F.lit("")))
    return (
        F.when(d == "", s)
        .when((s != "") & ~d.contains(s), F.concat_ws("\n", s, d))
        .otherwise(d)
    )
