"""Federation core: cross-database vulnerability lookups, Spark-first.

Reference: vulntotal/validator.py (VendorData, DataSource contract) and
vulntotal/vulntotal_utils.py (constraint dialects). The reference fans a
single purl out to N vulnerability databases in a per-purl CLI loop; this
module re-expresses federation as a DataFrame pipeline over a PURL
MANIFEST — the shape that scales to auditing a whole dependency corpus:

1. :func:`request_plan` - manifest × sources → one request row per
   (purl, datasource) with the exact URL/JSON payload the reference
   generates (fixture-verified per source);
2. :func:`fetch_stage` — the NETWORK boundary: an Arrow-batched
   mapInPandas that issues the requests. Network I/O is explicitly out
   of scope for the offline engine (SURVEY §2.10), so this stage raises
   unless the ``requests`` package is importable — every parse stage
   below it is fully offline-testable against the reference's recorded
   fixtures;
3. per-source ``parse_*`` stages (federation/<source>.py) — response
   text → normalized VENDOR_DATA rows, the reference's VendorData
   contract: (purl, aliases, affected_versions, fixed_versions);
4. the claims frame feeds ``operators/compare.py`` (source_claims /
   compare_sources) for the agreement matrix.

Every parser is a self-contained batch kernel (pickled by value): JSON /
YAML / HTML response decoding is per-document semantics Catalyst cannot
express — the approved UDF tier for source parsing.
"""

from __future__ import annotations

import re

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, StringType, StructField,
                               StructType)

VENDOR_DATA_SCHEMA = StructType([
    StructField("purl", StringType()),
    StructField("aliases", ArrayType(StringType())),
    StructField("affected_versions", ArrayType(StringType())),
    StructField("fixed_versions", ArrayType(StringType())),
])

REQUEST_SCHEMA = StructType([
    StructField("purl", StringType()),
    StructField("datasource_id", StringType()),
    StructField("method", StringType()),   # GET | POST
    StructField("url", StringType()),
    StructField("body", StringType()),     # JSON payload for POSTs, else null
    # JSON object of HTTP headers, else null — authenticated sources
    # (GitHub GraphQL, VulnerableCode.io) emit Authorization here as
    # ``${ENV_NAME}`` placeholders (e.g. "bearer ${GH_TOKEN}"), which
    # fetch_stage resolves from the EXECUTOR's environment per request.
    # Credentials therefore never appear in request-plan rows: a plan
    # that is persisted, checkpointed, or logged carries only the
    # placeholder. A header whose placeholder has no env value is
    # dropped (the request goes out unauthenticated and fetch_stage
    # records the 4xx as an error row).
    StructField("headers", StringType()),
])

_ENV_PLACEHOLDER = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def resolve_header_placeholders(headers: dict | None) -> dict | None:
    """Substitute ``${ENV_NAME}`` in header values from os.environ —
    executor-side credential injection (headers in REQUEST_SCHEMA rows
    are placeholders, never secrets). Headers with unresolved
    placeholders are dropped, with a stderr warning per batch.

    Resolution happens on the EXECUTOR: in cluster deployments
    (YARN/k8s) executors do NOT inherit the driver's shell env, so
    tokens exported only on the driver will not resolve. Ship them via
    ``spark.executorEnv.GH_TOKEN=...`` (or the cluster manager's
    executor-env mechanism); without that, requests go out
    unauthenticated and surface as 4xx error rows."""
    import os
    import sys

    if not headers:
        return headers
    resolved = {}
    dropped = []
    for name, value in headers.items():
        if not isinstance(value, str) or "${" not in value:
            resolved[name] = value
            continue
        missing = False

        def sub(m):
            nonlocal missing
            v = os.environ.get(m.group(1))
            if v is None:
                missing = True
                return ""
            return v

        value = _ENV_PLACEHOLDER.sub(sub, value)
        if not missing:
            resolved[name] = value
        else:
            dropped.append(name)
    if dropped:
        print(
            "resolve_header_placeholders: dropped header(s) "
            f"{dropped} — env placeholder unresolved on this executor; "
            "set spark.executorEnv.<NAME> to ship the credential "
            "(requests proceed unauthenticated)",
            file=sys.stderr)
    return resolved or None


class FedVersion:
    """Loose dotted-version ordering for federation range checks
    (vulntotal_utils.py GenericVersion semantics): components split on
    '.', leading v/V stripped, numeric components compared as integers,
    everything else as strings, and — deliberately — only the SHARED
    PREFIX of components decides ('1.5' compares equal to '1.5.2').
    This is the loose ordering the reference applies to vendor range
    strings, distinct from the exact univers schemes in kernel/versions.
    """

    __slots__ = ("parts",)

    def __init__(self, version: str):
        self.parts = tuple(version.replace(" ", "").lstrip("vV").split("."))

    def _cmp(self, other: "FedVersion") -> int:
        for a, b in zip(self.parts, other.parts):
            if a.isnumeric() and b.isnumeric():
                na, nb = int(a), int(b)
                if na == nb:
                    continue
                return -1 if na < nb else 1
            if a == b:
                continue
            return -1 if a < b else 1
        return 0


_OPS: dict[str, Callable[[int], bool]] = {
    "<": lambda c: c < 0,
    ">": lambda c: c > 0,
    "=": lambda c: c == 0,
    "==": lambda c: c == 0,
    "!=": lambda c: c != 0,
    "<=": lambda c: c <= 0,
    ">=": lambda c: c >= 0,
    "(": lambda c: c > 0,   # exclusive lower interval bound
    "[": lambda c: c >= 0,  # inclusive lower interval bound
    ")": lambda c: c < 0,   # exclusive upper interval bound
    "]": lambda c: c <= 0,  # inclusive upper interval bound
}


def split_constraint(constraint: str) -> tuple[str, str] | None:
    """(comparator, version) from one constraint token — prefix operators
    (``>=7.0``, ``[3.0.0``) or interval-suffix brackets (``3.1.25]``)."""
    if constraint.startswith(("<=", ">=", "==", "!=")):
        return constraint[:2], constraint[2:]
    if constraint.startswith(("<", ">", "=", "[", "(")):
        return constraint[0], constraint[1:]
    if constraint.endswith(("]", ")")):
        return constraint[-1], constraint[:-1]
    return None


def _satisfied(version: str, comparator: str, bound: str) -> bool:
    return _OPS[comparator](FedVersion(version)._cmp(FedVersion(bound)))


def _conjunction_satisfied(constraints: Iterable[str], version: str) -> bool:
    for token in constraints:
        # strip each subconstraint before parsing (the reference does the
        # same in gitlab_constraints_satisfied) — a ', '-separated range
        # like '>=4.0, <4.3' must not lose its upper bound to the
        # leading-space token defeating the operator prefix match
        token = token.strip() if token else token
        parsed = split_constraint(token) if token else None
        if not parsed or not parsed[1]:
            continue
        if not _satisfied(version, parsed[0], parsed[1]):
            return False
    return True


def github_range_satisfied(constraint: str, version: str) -> bool:
    """GitHub ``vulnerableVersionRange`` dialect: a comma conjunction
    (``>= 7.0.0, <= 7.6.57``)."""
    return _conjunction_satisfied(
        constraint.strip().replace(" ", "").split(","), version)


def snyk_range_satisfied(constraint: str, version: str) -> bool:
    """Snyk dialect: comma conjunction of prefix operators or interval
    halves (``[3.0.0,3.1.25)`` splits into ``[3.0.0`` and ``3.1.25)``)."""
    return _conjunction_satisfied(
        constraint.strip().replace(" ", "").split(","), version)


def gitlab_range_satisfied(constraint: str, version: str) -> bool:
    """GitLab ``affected_range`` dialect: ``||``-separated disjunction of
    conjunctions; interval syntax pairs bracket halves across commas
    (``[7.0.0,7.0.11),[7.2.0,7.2.4)``), operator syntax conjoins on
    comma or space (``>=4.0,<4.3 || >=5.0,<5.2``, ``>=0.19.0 <0.30.0``).
    """
    text = constraint.strip()
    if text.startswith(("[", "(")):
        halves = text.split(",")
        groups = [f"{a},{b}" for a, b in zip(halves[::2], halves[1::2])]
        delimiter = ","
    else:
        delimiter = "," if "," in text else " "
        groups = text.split("||")
    for group in groups:
        if _conjunction_satisfied(group.strip().split(delimiter), version):
            return True
    return False


def request_plan(purls: DataFrame, sources: dict[str, Callable],
                 purl_col: str = "purl") -> DataFrame:
    """One request row per (purl × supporting datasource).

    ``sources`` maps datasource_id → ``request_for(purl_str) -> dict |
    None`` (the per-source payload generators, fixture-verified). Runs as
    an Arrow batch kernel over the manifest — embarrassingly parallel,
    no driver loop, millions of purls fan out across the cluster.
    """
    items = sorted(sources.items())

    def gen(batches):
        import json as _json

        import pandas as _pd

        for pdf in batches:
            rows = {"purl": [], "datasource_id": [], "method": [],
                    "url": [], "body": [], "headers": []}
            for purl in pdf[purl_col]:
                for source_id, request_for in items:
                    try:
                        req = request_for(purl)
                    except Exception:  # noqa: BLE001 — bad purls skip
                        req = None
                    if not req:
                        continue
                    rows["purl"].append(purl)
                    rows["datasource_id"].append(source_id)
                    rows["method"].append(req.get("method", "GET"))
                    rows["url"].append(req.get("url"))
                    rows["body"].append(req.get("body"))
                    rows["headers"].append(
                        _json.dumps(req["headers"])
                        if req.get("headers") else None)
            yield _pd.DataFrame(rows)

    return (purls.select(F.col(purl_col))
            .mapInPandas(gen, REQUEST_SCHEMA))


def fetch_stage(plan: DataFrame, timeout: float = 30.0) -> DataFrame:
    """The network boundary: execute a request plan, yielding
    (purl, datasource_id, status, response) rows.

    Network I/O is out of the offline engine's scope — this stage
    requires the ``requests`` package at call time and fails loudly
    without it. Everything downstream (the parse stages) is pure and
    fixture-tested offline.

    Credential headers use ``${ENV}`` placeholders resolved on the
    EXECUTOR (see resolve_header_placeholders): on a real cluster the
    env var must be shipped with ``spark.executorEnv.<NAME>`` — a
    driver-only export does not reach executors, and the request falls
    back to unauthenticated (warned on executor stderr, visible as 4xx
    error rows).
    """
    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(plan.sparkSession)  # workers import this module for
    # resolve_header_placeholders (executor-side credential injection)
    try:
        import requests  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "fetch_stage needs the 'requests' package (network fetch is "
            "outside the offline engine scope); parse stages accept "
            "recorded responses and are fully offline-testable"
        ) from exc

    out_schema = StructType([
        StructField("purl", StringType()),
        StructField("datasource_id", StringType()),
        StructField("status", StringType()),
        StructField("response", StringType()),
    ])

    def fetch(batches):  # pragma: no cover - network boundary
        import json as _json

        import pandas as _pd
        import requests as _rq

        for pdf in batches:
            status, text = [], []
            hdr_col = (pdf["headers"] if "headers" in pdf.columns
                       else [None] * len(pdf))
            for method, url, body, hdrs in zip(pdf["method"], pdf["url"],
                                               pdf["body"], hdr_col):
                try:
                    headers = resolve_header_placeholders(
                        _json.loads(hdrs)
                        if isinstance(hdrs, str) and hdrs else None)
                    if method == "POST":
                        resp = _rq.post(url, json=_json.loads(body or "{}"),
                                        headers=headers, timeout=timeout)
                    else:
                        resp = _rq.get(url, headers=headers,
                                       timeout=timeout)
                    status.append(str(resp.status_code))
                    text.append(resp.text)
                except Exception as exc:  # noqa: BLE001 — per-row failure
                    status.append("error")
                    text.append(str(exc))
            yield _pd.DataFrame({
                "purl": pdf["purl"], "datasource_id": pdf["datasource_id"],
                "status": status, "response": text})

    return plan.mapInPandas(fetch, out_schema)


def parse_stage(responses: DataFrame, datasource_id: str,
                row_parser: Callable[[str, str], list[dict]],
                purl_col: str = "purl",
                response_col: str = "response") -> DataFrame:
    """Generic parse fan-out: apply a pure per-row parser
    ``(response_text, purl) -> [vendor_data_dict, ...]`` across a
    response frame, yielding the normalized claims schema plus
    ``datasource_id``. The parser must be self-contained or importable
    on workers (all federation parsers are module-level functions of
    this package, shipped via ensure_shipped).

    Per-row failure isolation mirrors fetch_stage's: when the frame
    carries a ``status`` column (fetch_stage output), only status-200
    rows are parsed — the error/404 rows fetch_stage deliberately emits
    must not feed ``json.loads`` — and a parser raising on one malformed
    body skips that row instead of failing the job (fixture frames
    without a status column parse every row, as before)."""
    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(responses.sparkSession)

    has_status = "status" in responses.columns
    cols = [F.col(purl_col), F.col(response_col)] + (
        [F.col("status")] if has_status else [])

    def gen(batches):
        import pandas as _pd

        for pdf in batches:
            rows = {"purl": [], "aliases": [], "affected_versions": [],
                    "fixed_versions": []}
            statuses = pdf["status"] if has_status else [None] * len(pdf)
            for purl, text, status in zip(
                    pdf[purl_col], pdf[response_col], statuses):
                # str() guard: a caller-built response frame may carry an
                # int status column — type-coerce before the 2xx test so a
                # non-string status skips the row, never raises job-wide
                if status is not None and not str(status).startswith("2"):
                    continue
                if not isinstance(text, str) or not text:
                    continue
                try:
                    parsed = row_parser(text, purl)
                except Exception:  # noqa: BLE001 — per-row isolation
                    continue
                for vd in parsed:
                    rows["purl"].append(vd["purl"])
                    rows["aliases"].append(vd["aliases"])
                    rows["affected_versions"].append(
                        vd["affected_versions"])
                    rows["fixed_versions"].append(vd["fixed_versions"])
            # an all-skipped batch yields NOTHING: an empty DataFrame's
            # numeric-dtype columns fail Arrow's list<string> conversion
            if rows["purl"]:
                yield _pd.DataFrame(rows)

    return (responses.select(*cols)
            .mapInPandas(gen, VENDOR_DATA_SCHEMA)
            .withColumn("datasource_id", F.lit(datasource_id)))


def next_request_stage(responses: DataFrame, datasource_id: str,
                       plan_deriver: Callable[[str, str], list[dict]],
                       purl_col: str = "purl",
                       response_col: str = "response") -> DataFrame:
    """Phase bridge for TWO-PHASE datasources (deps.dev metadata →
    advisory documents, GitLab tree listing → YAML files,
    VulnerableCode bulk search → vulnerability details): apply a pure
    per-row deriver ``(response_text, purl) -> [request dicts]`` to a
    phase-1 response frame, yielding a fresh REQUEST_SCHEMA plan to
    feed ``fetch_stage`` again. The composed flow is::

        plan1 = request_plan(purls, {id: module.request_for})
        resp1 = fetch_stage(plan1)
        plan2 = module.phase2_plan(resp1)      # ← this stage
        claims = module.parse(fetch_stage(plan2))

    Per-row failure isolation matches parse_stage: only 2xx rows
    derive (when a status column exists), and a deriver raising on one
    malformed body skips that row, never the job."""
    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(responses.sparkSession)

    has_status = "status" in responses.columns
    cols = [F.col(purl_col), F.col(response_col)] + (
        [F.col("status")] if has_status else [])

    def gen(batches):
        import json as _json

        import pandas as _pd

        for pdf in batches:
            rows = {"purl": [], "datasource_id": [], "method": [],
                    "url": [], "body": [], "headers": []}
            statuses = pdf["status"] if has_status else [None] * len(pdf)
            for purl, text, status in zip(
                    pdf[purl_col], pdf[response_col], statuses):
                # str() guard: a caller-built response frame may carry an
                # int status column — type-coerce before the 2xx test so a
                # non-string status skips the row, never raises job-wide
                if status is not None and not str(status).startswith("2"):
                    continue
                if not isinstance(text, str) or not text:
                    continue
                try:
                    reqs = plan_deriver(text, purl)
                except Exception:  # noqa: BLE001 — per-row isolation
                    continue
                for req in reqs or []:
                    rows["purl"].append(purl)
                    rows["datasource_id"].append(datasource_id)
                    rows["method"].append(req.get("method", "GET"))
                    rows["url"].append(req.get("url"))
                    rows["body"].append(req.get("body"))
                    rows["headers"].append(
                        _json.dumps(req["headers"])
                        if req.get("headers") else None)
            if rows["purl"]:
                yield _pd.DataFrame(rows)

    return responses.select(*cols).mapInPandas(gen, REQUEST_SCHEMA)
