"""Alpine Linux secdb importer.

Reference: pipelines/v2_importers/alpine_linux_importer.py — one JSON per
(distroversion, reponame): ``{distroversion, reponame, archs, packages:
[{pkg: {name, secfixes: {version: [vuln_ids...]}}}]}``. Each space-
separated vuln-id string fans out to one advisory per (package, version,
vuln_id); ids in parentheses are dropped, ``_``→``-`` and ``.patch``
stripped; the first id is the advisory's vuln_id and CVE-prefixed ids
become aliases; one apk purl per arch (qualifiers distroversion/reponame/
arch); the secfix version is the fixed version (``vers:alpine/<v`` as the
implied affected range).

Spark shape: ``from_json`` + a cascade of ``explode`` — the Spark-native
fan-out matching the reference's nested generators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import (AFFECTED_PACKAGE, REFERENCE,
                                          SEVERITY)

_SECDB = ("struct<distroversion:string, reponame:string, archs:array<string>,"
          " packages:array<struct<pkg:struct<name:string,"
          " secfixes:map<string,array<string>>>>>>")

# alpine_linux_importer.py:278-294 — non-CVE prefixes accepted as aliases;
# CVE- ids must additionally match the strict CVE regex
_VALID_PREFIXES = ("XSA-", "GHSL-", "TALOS-", "RUSTSEC-", "GHSA-", "GNUTLS-",
                   "VSV", "ZDI-CAN-", "DW", "YSA-", "ZBX-", "ALPINE-", "TS-",
                   "OSEC-", "wnpa-sec-")
_CVE_RE = r"^CVE-\d{4}-\d{4,19}$"


def read_alpine_secdb(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true").load(path)
        .select("value", F.col("_metadata.file_path").alias("path"))
    )
    return parse_alpine_secdb(raw)


def parse_alpine_secdb(files: DataFrame) -> DataFrame:
    d = files.select(F.from_json(F.col("value"), _SECDB).alias("s"), "path")
    d = d.filter(
        F.col("s.distroversion").isNotNull() & F.col("s.reponame").isNotNull()
        & F.col("s.packages").isNotNull()
    )
    pkg = d.select(
        F.col("s.distroversion").alias("distroversion"),
        F.col("s.reponame").alias("reponame"),
        F.coalesce(F.col("s.archs"), F.array().cast("array<string>")).alias("archs"),
        "path",
        F.explode("s.packages").alias("p"),
    ).filter(F.col("p.pkg.name").isNotNull())
    fix = pkg.select(
        "distroversion", "reponame", "archs", "path",
        F.col("p.pkg.name").alias("pkg_name"),
        F.explode("p.pkg.secfixes").alias("version", "vuln_ids"),
    ).filter(F.size("vuln_ids") > 0)
    row = fix.select(
        "*", F.explode("vuln_ids").alias("vuln_ids_string")
    )

    # parse_vuln_ids (alpine_linux_importer.py:261-308): strip (...) groups,
    # split on whitespace, ``_``→``-`` and drop ``.patch`` anywhere; keep
    # only ids with a valid prefix (CVE- ids must match the strict CVE
    # regex); vuln_id = first valid id, aliases = ALL valid ids (including
    # the first); rows with no valid id are skipped.
    _prefix_re = "^(" + "|".join(_VALID_PREFIXES) + ")"
    valid_ids = F.filter(
        F.transform(
            F.split(F.trim(F.regexp_replace(F.col("vuln_ids_string"),
                                            r"\(.*?\)", "")), r"\s+"),
            lambda a: F.regexp_replace(F.regexp_replace(a, "_", "-"),
                                       r"\.patch", ""),
        ),
        lambda a: a.rlike(_CVE_RE) | a.rlike(_prefix_re),
    )
    row = row.withColumn("ids", valid_ids).filter(F.size("ids") > 0)
    vuln_id = F.element_at(F.col("ids"), 1)
    aliases = F.col("ids")

    refs = (
        F.when(vuln_id.startswith("XSA"), F.array(F.struct(
            vuln_id.alias("reference_id"), F.lit("").alias("reference_type"),
            F.concat(F.lit("https://xenbits.xen.org/xsa/advisory-"),
                     F.regexp_extract(vuln_id, r"XSA-(\d+)", 1),
                     F.lit(".html")).alias("url"))))
        .when(vuln_id.startswith("ZBX"), F.array(F.struct(
            vuln_id.alias("reference_id"), F.lit("").alias("reference_type"),
            F.concat(F.lit("https://support.zabbix.com/browse/"),
                     vuln_id).alias("url"))))
        .when(vuln_id.startswith("wnpa-sec"), F.array(F.struct(
            vuln_id.alias("reference_id"), F.lit("").alias("reference_type"),
            F.concat(F.lit("https://www.wireshark.org/security/"),
                     vuln_id, F.lit(".html")).alias("url"))))
        .when(vuln_id.startswith("CVE"), F.array(F.struct(
            vuln_id.alias("reference_id"), F.lit("").alias("reference_type"),
            F.concat(F.lit("https://nvd.nist.gov/vuln/detail/"),
                     vuln_id).alias("url"))))
        .otherwise(F.array().cast(f"array<{REFERENCE.simpleString()}>"))
    ).cast(f"array<{REFERENCE.simpleString()}>")

    # one purl per arch (or a single arch-less purl when archs is empty)
    base_quals = F.concat(
        F.lit("distroversion="), F.col("distroversion"),
        F.lit("&reponame="), F.col("reponame"),
    )
    arch_purls = F.transform(
        F.col("archs"),
        lambda arch: F.struct(
            F.concat(F.lit("pkg:apk/alpine/"), F.col("pkg_name"), F.lit("?arch="),
                     arch, F.lit("&"), base_quals).alias("package"),
            F.concat(F.lit("vers:alpine/<"), F.col("version"))
            .alias("affected_version_range"),
            F.col("version").alias("fixed_version"),
        ),
    )
    no_arch = F.array(F.struct(
        F.concat(F.lit("pkg:apk/alpine/"), F.col("pkg_name"), F.lit("?"),
                 base_quals).alias("package"),
        F.concat(F.lit("vers:alpine/<"), F.col("version"))
        .alias("affected_version_range"),
        F.col("version").alias("fixed_version"),
    ))
    affected = F.when(F.size("archs") > 0, arch_purls).otherwise(no_arch) \
        .cast(f"array<{AFFECTED_PACKAGE.simpleString()}>")

    return row.select(
        F.concat_ws("/", F.col("pkg_name"), F.col("distroversion"),
                    F.col("version"), vuln_id).alias("advisory_id"),
        aliases.alias("aliases"),
        F.lit("").alias("summary"),
        affected.alias("affected_packages"),
        refs.alias("references"),
        F.array().cast(f"array<{SEVERITY.simpleString()}>").alias("severities"),
        F.array().cast("array<int>").alias("weaknesses"),
        F.lit(None).cast("timestamp").alias("date_published"),
        F.col("path").alias("url"),
    )
