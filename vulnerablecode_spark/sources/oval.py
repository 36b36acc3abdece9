"""OVAL XML importer: definitions + tests/objects/states → advisories.

Reference: importer.py:789-921 (OvalImporter.get_data_from_xml_doc) +
oval_parser.py:26-198 (OvalParser) over lib_oval.py's DOM accessors.
Full parser parity with the reference's OvalParser semantics:

- test gating: a criterion's test is valid only when its state carries an
  ``evr``-style child whose ``operation`` is in the importer's
  ``translations`` map AND whose ``datatype`` is ``evr_string`` /
  ``debian_evr_string`` (oval_parser.py:78-92 — SUSE uses ``evr_string``,
  Debian/Ubuntu use ``debian_evr_string``);
- package names: object ``name`` text, or Ubuntu-style ``var_ref``
  indirection resolved through the document's variable elements (package
  name quoted inside the variable's ``comment``, oval_parser.py:105-123);
- version ranges: ``translations[operation] + version`` with the
  reference's cleanups — drop ``only``, drop ``0:`` default epochs, and
  the small ``x_version_ranges`` rewrite table (oval_parser.py:125-155);
- vuln ids: every ``ref_id`` with ``source="CVE"`` (prefix before "CVE"
  stripped — SUSE/Ubuntu), falling back to the metadata title
  (Debian), with ONE OUTPUT ADVISORY PER (definition, CVE) exactly like
  get_data_from_xml_doc's fan-out (importer.py:869-875);
- references: ``reference`` elements' ``ref_url`` plus the first
  ``advisory`` element's ``ref`` texts / ``href`` attrs, each carrying
  the advisory-level severity as a generic_textual severity
  (oval_parser.py:157-172, importer.py:879-889);
- date_published: the document generator's timestamp (importer.py:911).

Spark shape: one OVAL document per task (per-distro files are the natural
unit of parallelism), parsed in a self-contained ``mapInPandas`` closure
with ElementTree. At 100 TB-scale the per-file grain is what a
1000-executor cluster wants: each multi-MB distro document parses
independently, no shuffle until the canonical merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.kernel.purl import _LOWERCASE_TYPES
from vulnerablecode_spark.schemas import ADVISORY_PARSED

# Default evr operation → vers comparator map. Debian passes just
# {"less than": "<"} (debian_oval.py:66); SUSE adds equals / >=
# (suse_oval.py:27). The full map is kept for generic callers.
_OP_MAP = {
    "less than": "<", "less than or equal": "<=",
    "greater than": ">", "greater than or equal": ">=",
    "equals": "=", "not equal": "!=",
}

# Reference translations dicts, verbatim (debian_oval.py:66, suse_oval.py:27)
DEBIAN_TRANSLATIONS = {"less than": "<"}
SUSE_TRANSLATIONS = {"less than": "<", "equals": "=", "greater than or equal": ">="}

_EVR_DATATYPES = ("evr_string", "debian_evr_string")

# oval_parser.py:144-152 — literal rewrite table for malformed
# x-suffixed ranges seen in the wild
_X_VERSION_RANGES = {
    "<2.0.x": "2.0.x", "<3.x": "3.x", "<4.6.x": "4.6.x",
    "<8.0.x": "8.0.x", "<8.x": "8.x",
}


def parse_oval_xml(files: DataFrame, datasource_id: str = "oval",
                   purl_type: str = "deb", purl_namespace: str = "debian",
                   qualifiers: dict | None = None,
                   translations: dict | None = None,
                   data_url: str = "") -> DataFrame:
    """(path, content) rows of OVAL XML documents → ADVISORY_PARSED rows.

    One output row per (vulnerability definition, CVE) pair, aliases
    ``[cve]`` — the reference's get_data_from_xml_doc fan-out. The
    ``advisory_id`` is the definition id, suffixed ``#<cve>`` only when a
    definition fans out to more than one CVE (the reference's AdvisoryData
    has no id here; content-id dedup downstream is the real identity).
    """
    op_map = dict(translations) if translations else dict(_OP_MAP)
    quals = dict(qualifiers or {})

    def parse(batches):
        import re
        import xml.etree.ElementTree as ET

        import pandas as pd

        def local(tag):
            return tag.rsplit("}", 1)[-1]

        qual_suffix = ""
        if quals:
            qual_suffix = "?" + "&".join(
                f"{k}={v}" for k, v in sorted(quals.items()))
        ns_seg = f"{purl_namespace}/" if purl_namespace else ""

        def version_range_of(state):
            # oval_parser.py:125-155 — first valid evr child wins
            for child in state:
                operation = child.get("operation")
                if not operation:
                    continue
                operand = op_map.get(operation) or ""
                if not operand:
                    continue
                version = child.text or ""
                if not version:
                    continue
                vr = (operand + version).replace("only", "").strip()
                vr = vr.replace("0:", "").strip()
                return _X_VERSION_RANGES.get(vr, vr)
            return None

        def one_doc(content):
            try:
                root = ET.fromstring(content)
            except ET.ParseError:
                return
            byid = {}
            timestamp = None
            for el in root.iter():
                el_id = el.get("id")
                if el_id:
                    byid[el_id] = el
                if timestamp is None and local(el.tag) == "timestamp":
                    timestamp = (el.text or "").strip()

            def pkgs_of(obj):
                # oval_parser.py:105-123 — var_ref (Ubuntu) or name text
                out = []
                for var in obj:
                    ref = var.get("var_ref")
                    if ref:
                        var_el = byid.get(ref)
                        comment = (var_el.get("comment") or "") \
                            if var_el is not None else ""
                        m = re.match(r"'.+'", comment)
                        if m:
                            out.append(m.group().replace("'", ""))
                    elif var.text:
                        out.append(var.text)
                return out

            # no class filter: the reference's OvalParser processes EVERY
            # definition with valid tests (SUSE uses class="patch",
            # Debian/Ubuntu class="vulnerability"; definitions without
            # resolvable evr tests — e.g. inventory — drop out below)
            for definition in root.iter():
                if local(definition.tag) != "definition":
                    continue

                # -- valid tests of this definition (oval_parser.py:63-95)
                test_ids, seen_refs = [], set()
                for el in definition.iter():
                    ref = el.get("test_ref")
                    if not ref or ref in seen_refs:
                        continue
                    seen_refs.add(ref)
                    test = byid.get(ref)
                    if test is None or len(test) != 2:
                        continue
                    state = byid.get(test[1].get("state_ref"))
                    if state is None:
                        continue
                    for child in state:
                        if (child.get("operation") in op_map
                                and child.get("datatype") in _EVR_DATATYPES):
                            test_ids.append(ref)
                            break
                if not test_ids:
                    continue

                # -- definition-level metadata
                description = None
                title = None
                urls = []
                severity = None
                advisory_seen = False
                metadata = None
                for el in definition:
                    if local(el.tag) == "metadata":
                        metadata = el
                        break
                if metadata is not None:
                    for child in metadata:
                        tag = local(child.tag)
                        if tag == "title" and title is None:
                            title = (child.text or "").strip()
                        elif tag == "description" and description is None:
                            description = (child.text or "").strip()
                        elif tag == "reference":
                            if child.get("ref_url"):
                                urls.append(child.get("ref_url"))
                        elif tag == "advisory" and not advisory_seen:
                            advisory_seen = True
                            for grandchild in child:
                                gtag = local(grandchild.tag)
                                if gtag == "ref" and grandchild.text:
                                    urls.append(grandchild.text.strip())
                                if grandchild.get("href"):
                                    urls.append(grandchild.get("href"))
                                if gtag == "severity" and grandchild.text:
                                    severity = grandchild.text.strip()

                # -- CVE list (oval_parser.py:183-198)
                cves = []
                for el in definition.iter():
                    rid = el.get("ref_id")
                    if rid and el.get("source") == "CVE":
                        if not rid.startswith("CVE") and "CVE" in rid:
                            rid = "CVE" + rid.split("CVE", 1)[1]
                        cves.append(rid)
                if not cves:
                    cves = [title or ""]

                # -- affected (pkg, range) pairs across valid tests
                affected = []
                for ref in sorted(set(test_ids)):
                    test = byid[ref]
                    obj = byid.get(test[0].get("object_ref"))
                    state = byid.get(test[1].get("state_ref"))
                    if obj is None or state is None:
                        continue
                    vr = version_range_of(state)
                    for name in pkgs_of(obj):
                        if not name:
                            continue
                        # packageurl-python lowercases name/namespace only
                        # for case-insensitive ecosystems (deb yes, rpm
                        # NO — SUSE's 'MozillaFirefox' keeps its case).
                        pkg_name = (name.lower()
                                    if purl_type in _LOWERCASE_TYPES
                                    else name)
                        affected.append({
                            "package":
                                f"pkg:{purl_type}/{ns_seg}"
                                f"{pkg_name}{qual_suffix}",
                            "affected_version_range":
                                f"vers:{purl_type}/{vr}" if vr else None,
                            "fixed_version": None,
                        })
                affected.sort(key=lambda a: (a["package"],
                                             a["affected_version_range"] or ""))

                severities = ([{"system": "generic_textual",
                                "value": severity,
                                "scoring_elements": None,
                                "published_at": None, "url": None}]
                              if severity else [])
                references = [
                    {"reference_id": None, "reference_type": None, "url": u}
                    for u in sorted(set(u for u in urls if u))
                ]
                date = (pd.to_datetime(timestamp, errors="coerce")
                        if timestamp else None)
                def_id = definition.get("id")
                for cve in cves:
                    yield {
                        "advisory_id":
                            def_id if len(cves) == 1 else f"{def_id}#{cve}",
                        "aliases": [cve] if cve else [],
                        "summary": description or "",
                        "affected_packages": affected,
                        "references": references,
                        "severities": severities,
                        "weaknesses": [],
                        "date_published": date,
                        "url": data_url or None,
                    }

        for pdf in batches:
            rows = [r for c in pdf["content"] for r in one_doc(c)]
            yield pd.DataFrame(rows, columns=[f.name for f in ADVISORY_PARSED])

    n = files.sparkSession.sparkContext.defaultParallelism
    return files.repartition(n).mapInPandas(parse, ADVISORY_PARSED)


def filter_suse_oval_files(paths: list) -> list:
    """Drop ``name.xml`` when a ``name-affected.xml`` twin exists.

    SUSE publishes both; the ``-affected`` variant is the superset that
    includes issues affecting SUSE (suse_oval.py:49-69).
    """
    trimmed = {p.replace("-affected", "")
               for p in paths if "-affected" in p}
    return [p for p in paths if p not in trimmed]


def read_oval(spark: SparkSession, path: str, datasource_id: str = "oval",
              purl_type: str = "deb", purl_namespace: str = "debian",
              qualifiers: dict | None = None,
              translations: dict | None = None,
              data_url: str = "") -> DataFrame:
    files = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.xml")
        .load(path)
        .select(F.input_file_name().alias("path"), F.col("value").alias("content"))
    )
    return parse_oval_xml(files, datasource_id, purl_type, purl_namespace,
                          qualifiers, translations, data_url)
