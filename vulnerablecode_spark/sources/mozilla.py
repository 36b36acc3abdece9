"""Mozilla foundation-security-advisories importer (MFSA yml + md).

Reference: pipelines/v2_importers/mozilla_importer.py — the announce/ tree
holds ``mfsa....yml`` (structured) and ``mfsa....md`` (YAML front matter +
markdown body). YML advisories fan out per contained CVE (advisory_id
``mfsa.../CVE-...``) or emit one advisory when no CVE map exists; MD
advisories take their description from the paragraphs under the
"### Description" heading. ``fixed_in`` entries become fixed-version
packages on the "mozilla" purl type; impact maps to a generic severity
(critical/high/moderate→medium/low).

Spark shape: wholetext per-file read → self-contained ``mapInPandas``
(YAML + front-matter split are not Catalyst-expressible). The front-matter
split mirrors utils.py:91-108 (split_markdown_front_matter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED


def read_mozilla(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.{yml,md}")
        .load(path)
        .select("value", F.col("_metadata.file_path").alias("path"))
    )
    return parse_mozilla(raw)


def split_markdown_front_matter(text: str) -> tuple[str, str]:
    """utils.py:91-108 — '---\\n<yaml>\\n---\\n<markdown>' → (yaml, md)."""
    lines = text.split("\n")
    if not lines or lines[0].strip() != "---":
        return "", text
    for i in range(1, len(lines)):
        if lines[i].strip() == "---":
            return "\n".join(lines[1:i]), "\n".join(lines[i + 1:])
    return "", text


def parse_mozilla(files: DataFrame) -> DataFrame:
    colnames = [f.name for f in ADVISORY_PARSED]

    def parse(batches):
        import re

        import pandas as pd
        import yaml

        def fm_split(text):
            # self-contained duplicate of split_markdown_front_matter so the
            # closure pickles by value (workers lack this package on path)
            lines = text.split("\n")
            if not lines or lines[0].strip() != "---":
                return "", text
            for i in range(1, len(lines)):
                if lines[i].strip() == "---":
                    return "\n".join(lines[1:i]), "\n".join(lines[i + 1:])
            return "", text

        cve_re = re.compile(r"^CVE-\d{4}-\d{4,19}$")
        mfsa_re = re.compile(r"mfsa(\d{4}-\d{2,3})")
        tag_re = re.compile(r"<[^>]+>")

        def severity_from_impact(impact):
            impact = (impact or "").lower()
            if impact == "moderate":
                impact = "medium"
            value = "none"
            for level in ("critical", "high", "medium", "low", "none"):
                if level in impact:
                    value = level
                    break
            return {"system": "generic_textual", "value": value,
                    "scoring_elements": "", "published_at": None, "url": None}

        def fixed_in_packages(fixed_in):
            out = []
            for pkg in fixed_in or []:
                if not pkg:
                    continue
                name, _, version = pkg.rpartition(" ")
                if version.count(".") == 3:
                    continue  # reference: invalid SemVer, skipped
                if not name or not version:
                    continue
                out.append({"package": f"pkg:mozilla/{name.replace(' ', '%20')}",
                            "affected_version_range": None,
                            "fixed_version": version})
            return out

        def strip_html(text):
            return tag_re.sub("", text or "").strip()

        h3_re = re.compile(r"^\s*(###\s*description|<h3>\s*description\s*</h3>)",
                           re.IGNORECASE)
        stop_re = re.compile(r"^\s*(#|<h\d)", re.IGNORECASE)

        def md_description(md_text):
            # paragraphs directly under the "Description" heading (either
            # markdown ### or literal <h3> — MFSA md bodies use raw HTML).
            # The reference renders markdown to HTML and walks <p> siblings;
            # scanning the text until the next heading extracts the same
            # paragraphs without the HTML round-trip.
            lines = md_text.split("\n")
            out, in_desc = [], False
            for line in lines:
                if h3_re.match(line):
                    in_desc = True
                    continue
                if in_desc and stop_re.match(line):
                    break
                if in_desc:
                    out.append(line)
            return strip_html("\n".join(out)).strip()

        def base(mfsa_id, data, advisory_url):
            date = data.get("announced")
            try:
                import pandas as _pd
                dt = _pd.Timestamp(str(date)).to_pydatetime() if date else None
                if dt is not None and dt.tzinfo is not None:
                    dt = dt.astimezone(tz=None).replace(tzinfo=None)
            except ValueError:
                dt = None
            return {
                "advisory_id": mfsa_id, "aliases": [], "summary": "",
                "affected_packages": fixed_in_packages(data.get("fixed_in")),
                "references": [{
                    "reference_id": None, "reference_type": "",
                    "url": ("https://www.mozilla.org/en-US/security/advisories/"
                            f"{mfsa_id}")}],
                "severities": [severity_from_impact(data.get("impact"))],
                "weaknesses": [], "date_published": dt, "url": advisory_url,
            }

        def one(content, path):
            fname = path.rsplit("/", 1)[-1]
            m = mfsa_re.search(fname)
            if not m:
                return
            mfsa_id = f"mfsa{m.group(1)}"
            advisory_url = ("https://github.com/mozilla/"
                            "foundation-security-advisories/blob/master/announce/"
                            + "/".join(path.rsplit("/", 2)[-2:]))
            if fname.endswith(".md"):
                yamltext, mdtext = fm_split(content)
                try:
                    data = yaml.safe_load(yamltext) or {}
                except yaml.YAMLError:
                    return
                row = base(mfsa_id, data, advisory_url)
                row["summary"] = md_description(mdtext)
                yield row
                return
            try:
                data = yaml.safe_load(content) or {}
            except yaml.YAMLError:
                return
            mfsa_summary = strip_html(data.get("description") or "")
            advisories = data.get("advisories") or {}
            if not advisories:
                row = base(mfsa_id, data, advisory_url)
                row["summary"] = mfsa_summary
                yield row
                return
            for cve, advisory in advisories.items():
                if not cve_re.match(cve or ""):
                    continue
                row = base(mfsa_id, data, advisory_url)
                row["advisory_id"] = f"{mfsa_id}/{cve}"
                row["aliases"] = [cve]
                row["summary"] = (mfsa_summary + "\n"
                                  + strip_html((advisory or {}).get("description") or ""))
                row["severities"] = [severity_from_impact(
                    (advisory or {}).get("impact") or "")]
                yield row

        for pdf in batches:
            rows = [r for c, p in zip(pdf["value"], pdf["path"])
                    for r in one(c, p)]
            yield pd.DataFrame(rows, columns=colnames)

    return files.mapInPandas(parse, ADVISORY_PARSED)
