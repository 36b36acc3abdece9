"""Ruby advisory-db importer: rubysec/ruby-advisory-db YAML → advisories.

Reference: pipelines/v2_importers/ruby_importer.py:37-256 (clone repo,
walk ``gems/**.yml`` and ``rubies/**.yml``, skip ``OSVDB-*`` files,
gem advisories → ``pkg:gem/<gem>``, engine advisories →
``pkg:ruby/<engine>``) and importers/ruby.py:115-141 for the range
semantics this repo's v1-shaped IR uses: both ``patched_versions`` and
``unaffected_versions`` are *safe* gem requirement lists that INVERT into
affected vers ranges (the v2 pipeline instead keeps patched ranges as
``fixed_version_range`` — a field the shared AFFECTED_PACKAGE IR folds
into the same inverted-affected representation).

Spark shape: distributed wholetext read of the YAML tree → Arrow-batched
``mapInPandas`` parse (YAML is the one format Catalyst can't express) →
ADVISORY_PARSED rows. The parse closure is self-contained (pickled by
value): workers need pyyaml only, never this package on sys.path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED

DB_URL = "https://github.com/rubysec/ruby-advisory-db/blob/master/"


def parse_ruby_yaml(files: DataFrame) -> DataFrame:
    """(path, content) rows → ADVISORY_PARSED rows via mapInPandas."""
    db_url = DB_URL

    def parse(batches):
        import pandas as pd
        import yaml

        def gem_constraints(req):
            """One native gem requirement string → [(op, version), ...].

            Handles the comparators ``= != < <= > >=`` and expands the
            pessimistic operator ``~> X.Y.Z`` to ``>=X.Y.Z, <X.(Y+1)``
            (GemVersionRange.from_native semantics)."""
            out = []
            for part in str(req).split(","):
                part = part.strip()
                if not part:
                    continue
                if part.startswith("~>"):
                    v = part[2:].strip()
                    nums = v.split(".")
                    try:
                        # ~> X.Y.Z → >=X.Y.Z, <X.(Y+1); single-segment
                        # ~> X → >=X, <X+1 (Gem pessimistic semantics)
                        bumped = nums[:-1] if len(nums) >= 2 else list(nums)
                        bumped[-1] = str(int(bumped[-1]) + 1)
                        out.append((">=", v))
                        out.append(("<", ".".join(bumped)))
                    except ValueError:
                        out.append((">=", v))
                    continue
                for op in (">=", "<=", "!=", ">", "<", "="):
                    if part.startswith(op):
                        out.append((op, part[len(op):].strip()))
                        break
                else:
                    out.append(("=", part))
            return out

        _FLIP = {"<": ">=", "<=": ">", ">": "<=", ">=": "<",
                 "=": "!=", "!=": "="}

        def inverted_vers(req):
            """Safe-range requirement → affected vers range: flip every
            comparator (GemVersionRange.invert, constraints OR-joined per
            the vers spec)."""
            flipped = [f"{_FLIP[op]}{v}" for op, v in gem_constraints(req)
                       if v]
            return "vers:gem/" + "|".join(flipped) if flipped else None

        def build_description(title, description):
            # utils.py:326-340
            s, d = (title or "").strip(), (description or "").strip()
            if not d:
                return s
            if s and s not in d:
                return s + "\n" + d
            return d

        def one(path, content):
            # advisory_id = path relative to the repo root, no suffix
            # (ruby_importer.py:96-102); only gems/ and rubies/ subtrees,
            # OSVDB-named files skipped (:86-94)
            parts = path.replace("\\", "/").split("/")
            name = parts[-1]
            if name.startswith("OSVDB-"):
                return None
            subdir = next((p for p in ("gems", "rubies") if p in parts[:-1]),
                          None)
            if subdir is None:
                return None
            rel = "/".join(parts[parts.index(subdir):])
            advisory_id = rel.rsplit(".", 1)[0]
            try:
                d = yaml.safe_load(content) or {}
            except yaml.YAMLError:
                return None
            if subdir == "gems":
                pkg_name = d.get("gem")
                purl_type = "gem"
            else:
                pkg_name = d.get("engine")  # enum: jruby, rbx, ruby
                purl_type = "ruby"
            if not pkg_name:
                return None
            purl = f"pkg:{purl_type}/{str(pkg_name).lower()}"
            affected = []
            # v1 range semantics: patched + unaffected are safe lists,
            # each entry inverts to an affected range
            # (importers/ruby.py:121-141)
            safe = list(d.get("patched_versions") or [])
            safe += list(d.get("unaffected_versions") or [])
            for req in safe:
                if not req:
                    continue
                vers = inverted_vers(req)
                if vers:
                    affected.append({"package": purl,
                                     "affected_version_range": vers,
                                     "fixed_version": None})
            aliases = []
            if d.get("cve"):
                aliases.append(f"CVE-{d['cve']}")
            if d.get("osvdb"):
                # the 'OSV-' (not 'OSVDB-') prefix is the reference's own
                # convention, ruby_importer.py:205-206 — kept verbatim
                # for alias parity even though it shadows Google's OSV
                # id namespace
                aliases.append(f"OSV-{d['osvdb']}")
            if d.get("ghsa"):
                aliases.append(f"GHSA-{d['ghsa']}")
            severities = [
                {"system": sysname, "value": str(d[key]),
                 "scoring_elements": None, "published_at": None, "url": None}
                for sysname, key in (("cvssv4", "cvss_v4"),
                                     ("cvssv3", "cvss_v3"),
                                     ("cvssv2", "cvss_v2"))
                if d.get(key) is not None
            ]
            pub = d.get("date")
            return {
                "advisory_id": advisory_id,
                "aliases": aliases,
                "summary": build_description(d.get("title"),
                                             d.get("description")),
                "affected_packages": affected,
                "references": [{"reference_id": None,
                                "reference_type": None,
                                "url": d["url"]}] if d.get("url") else [],
                "severities": severities,
                "weaknesses": [],
                "date_published": (
                    pd.to_datetime(str(pub), errors="coerce", utc=True)
                    .tz_localize(None) if pub else None),
                "url": db_url + rel,
            }

        for pdf in batches:
            rows = [r for r in (one(p, c) for p, c in
                                zip(pdf["path"], pdf["content"])) if r]
            yield pd.DataFrame(rows, columns=[f.name for f in ADVISORY_PARSED])

    n = files.sparkSession.sparkContext.defaultParallelism
    return files.repartition(n).mapInPandas(parse, ADVISORY_PARSED)


def read_ruby(spark: SparkSession, path: str) -> DataFrame:
    """Read a checkout/landing-zone tree of ruby-advisory-db YAML files."""
    files = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.yml")
        .load(path)
        .select(F.input_file_name().alias("path"),
                F.col("value").alias("content"))
    )
    return parse_ruby_yaml(files)
