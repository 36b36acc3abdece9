"""GitLab advisory-database importer: per-package YAML files → advisories.

Reference: pipelines/v2_importers/gitlab_importer.py (clone the YAML repo,
walk per-ecosystem dirs, parse each advisory YAML). Spark shape: read
files distributed (``wholetext``/binaryFiles-style), parse YAML in an
Arrow-batched ``mapInPandas`` (YAML is the one format Catalyst can't
express), emit ADVISORY_PARSED rows.

The parse closure is self-contained (pickled by value) — workers only
need pyyaml, not this package on sys.path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED

# gitlab package_slug prefix → purl type (gitlab_importer.py PURL_TYPE_BY_GITLAB_SCHEME)
_SLUG_TYPE = {"pypi": "pypi", "npm": "npm", "gem": "gem", "go": "golang",
              "maven": "maven", "packagist": "composer", "nuget": "nuget",
              "conan": "conan", "crates.io": "cargo"}


def parse_gitlab_yaml(files: DataFrame) -> DataFrame:
    """(path, content) rows → ADVISORY_PARSED rows via mapInPandas."""
    slug_type = dict(_SLUG_TYPE)

    def parse(batches):
        import pandas as pd
        import yaml

        def one(path, content):
            try:
                d = yaml.safe_load(content) or {}
            except yaml.YAMLError:
                return None
            slug = d.get("package_slug") or ""
            eco, _, name = slug.partition("/")
            ptype = slug_type.get(eco.lower(), eco.lower() or "generic")
            base_purl = f"pkg:{ptype}/{name.lower()}" if name else None
            affected = []
            if base_purl:
                rng = d.get("affected_range") or ""
                constraints = [c.strip() for c in rng.replace(",", "|").split("|")
                               if c.strip()]
                vers = (f"vers:{ptype}/" + "|".join(constraints)) if constraints \
                    else f"vers:{ptype}/*"
                fixed = (d.get("fixed_versions") or [None])[0]
                affected.append({"package": base_purl,
                                 "affected_version_range": vers,
                                 "fixed_version": fixed})
            severities = []
            for sysname, key in (("cvssv3", "cvss_v3"), ("cvssv2", "cvss_v2")):
                if d.get(key):
                    severities.append({
                        "system": sysname, "value": str(d[key]),
                        "scoring_elements": str(d[key]),
                        "published_at": None, "url": (d.get("urls") or [None])[0],
                    })
            weaknesses = []
            for c in d.get("cwe_ids") or []:
                digits = "".join(ch for ch in str(c) if ch.isdigit())
                if digits:
                    weaknesses.append(int(digits))
            aliases = sorted({i for i in (d.get("identifiers") or [])
                              if i != d.get("identifier")})
            pub = d.get("pubdate") or d.get("date")
            return {
                "advisory_id": d.get("identifier"),
                "aliases": aliases,
                "summary": (d.get("description") or d.get("title") or "").strip(),
                "affected_packages": affected,
                "references": [{"reference_id": None, "reference_type": "advisory",
                                "url": u} for u in (d.get("urls") or [])],
                "severities": severities,
                "weaknesses": weaknesses,
                "date_published": pd.to_datetime(pub, errors="coerce", utc=True)
                    .tz_localize(None) if pub else None,
                "url": (d.get("urls") or [None])[0],
            }

        for pdf in batches:
            rows = [r for r in (one(p, c) for p, c in
                                zip(pdf["path"], pdf["content"])) if r]
            yield pd.DataFrame(rows, columns=[f.name for f in ADVISORY_PARSED])

    n = files.sparkSession.sparkContext.defaultParallelism
    return files.repartition(n).mapInPandas(parse, ADVISORY_PARSED)


def read_gitlab(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory tree of GitLab advisory YAML files."""
    files = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.yml")
        .load(path)
        .select(F.input_file_name().alias("path"), F.col("value").alias("content"))
    )
    return parse_gitlab_yaml(files)
