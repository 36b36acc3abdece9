"""OVAL XML importer: definitions + tests/objects/states → advisories.

Reference: importer.py:789-921 + oval_parser.py + lib_oval.py (~1.6k LoC of
DOM walking). Spark shape: one OVAL document per task (per-distro files are
the natural unit of parallelism), parsed in a self-contained
``mapInPandas`` closure with ElementTree: index the document's
dpkginfo/rpminfo tests → objects (package name) and states (evr
constraint), then walk each vulnerability definition's criteria tree and
resolve its criterion test_refs into (package, version-range) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED

# evr comparison operation → vers comparator
_OP_MAP = {
    "less than": "<", "less than or equal": "<=",
    "greater than": ">", "greater than or equal": ">=",
    "equals": "=", "not equal": "!=",
}


def parse_oval_xml(files: DataFrame, datasource_id: str = "oval",
                   purl_type: str = "deb", purl_namespace: str = "debian") -> DataFrame:
    """(path, content) rows of OVAL XML documents → ADVISORY_PARSED rows."""
    op_map = dict(_OP_MAP)

    def parse(batches):
        import re
        import xml.etree.ElementTree as ET

        import pandas as pd

        def local(tag):
            return tag.rsplit("}", 1)[-1]

        def one_doc(content):
            try:
                root = ET.fromstring(content)
            except ET.ParseError:
                return
            tests, objects, states = {}, {}, {}
            for el in root.iter():
                tag = local(el.tag)
                el_id = el.get("id")
                if tag.endswith("info_test") and el_id:
                    obj_ref = state_ref = None
                    for child in el:
                        if local(child.tag) == "object":
                            obj_ref = child.get("object_ref")
                        elif local(child.tag) == "state":
                            state_ref = child.get("state_ref")
                    tests[el_id] = (obj_ref, state_ref)
                elif tag.endswith("info_object") and el_id:
                    for child in el:
                        if local(child.tag) == "name":
                            objects[el_id] = (child.text or "").strip()
                elif tag.endswith("info_state") and el_id:
                    for child in el:
                        if local(child.tag) == "evr":
                            states[el_id] = (
                                child.get("operation") or "less than",
                                (child.text or "").strip(),
                            )

            for definition in root.iter():
                if local(definition.tag) != "definition":
                    continue
                if definition.get("class") != "vulnerability":
                    continue
                title = description = date = None
                products = []
                for el in definition.iter():
                    tag = local(el.tag)
                    if tag == "title" and title is None:
                        title = (el.text or "").strip()
                    elif tag == "description" and description is None:
                        description = (el.text or "").strip()
                    elif tag == "date" and date is None:
                        date = (el.text or "").strip()
                    elif tag == "product":
                        products.append((el.text or "").strip())
                affected = []
                seen = set()
                for el in definition.iter():
                    if local(el.tag) != "criterion":
                        continue
                    ref = el.get("test_ref")
                    obj_ref, state_ref = tests.get(ref, (None, None))
                    name = objects.get(obj_ref)
                    evr = states.get(state_ref)
                    if not name or not evr or (name, evr) in seen:
                        continue
                    seen.add((name, evr))
                    op, version = evr
                    comparator = op_map.get(op, "<")
                    affected.append({
                        "package": f"pkg:{purl_type}/{purl_namespace}/{name.lower()}",
                        "affected_version_range":
                            f"vers:{purl_type}/{comparator}{version}",
                        "fixed_version":
                            version if comparator == "<" else None,
                    })
                aliases = []
                if title and re.match(r"(?i)^CVE-\d{4}-\d{4,19}$", title):
                    aliases.append(title)
                yield {
                    "advisory_id": definition.get("id"),
                    "aliases": aliases,
                    "summary": description or "",
                    "affected_packages": affected,
                    "references": [],
                    "severities": [],
                    "weaknesses": [],
                    "date_published":
                        pd.to_datetime(date, errors="coerce") if date else None,
                    "url": None,
                }

        for pdf in batches:
            rows = [r for c in pdf["content"] for r in one_doc(c)]
            yield pd.DataFrame(rows, columns=[f.name for f in ADVISORY_PARSED])

    n = files.sparkSession.sparkContext.defaultParallelism
    return files.repartition(n).mapInPandas(parse, ADVISORY_PARSED)


def read_oval(spark: SparkSession, path: str, datasource_id: str = "oval",
              purl_type: str = "deb", purl_namespace: str = "debian") -> DataFrame:
    files = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.xml")
        .load(path)
        .select(F.input_file_name().alias("path"), F.col("value").alias("content"))
    )
    return parse_oval_xml(files, datasource_id, purl_type, purl_namespace)
