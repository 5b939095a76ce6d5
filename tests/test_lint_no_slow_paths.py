"""Architecture lint (SURVEY §7 'known hard parts'): no per-row Python
UDFs, no RDD API in the engine — every Python kernel must be a grouped /
Arrow-batched pandas UDF, every plan declarative."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "csd363_sin_spark"

BANNED = [
    # row-at-a-time python UDF registration
    (re.compile(r"\bF\.udf\(|\budf\(\s*lambda|@udf\b"), "per-row python UDF"),
    # RDD API usage (except the sanctioned JVM-side rewrap in lineage.py)
    (re.compile(r"\.rdd\b|\.mapPartitions\(|sparkContext\.parallelize"), "RDD API"),
    (re.compile(r"\bcollect\(\)\s*\)?\s*for\b"), "driver-side loop over collect()"),
]

ALLOWED_RDD_FILES = {"lineage.py"}  # JVM toJavaRDD rewrap, documented


def test_no_slow_paths():
    offenders = []
    for path in PKG.rglob("*.py"):
        text = path.read_text()
        for pattern, label in BANNED:
            for m in pattern.finditer(text):
                if label == "RDD API" and path.name in ALLOWED_RDD_FILES:
                    continue
                line = text[: m.start()].count("\n") + 1
                offenders.append(f"{path.name}:{line} {label}")
    assert not offenders, offenders


def test_pandas_udfs_are_grouped_or_arrow():
    """Any mapInPandas/applyInPandas usage must declare a schema string
    (cheap sanity that the Arrow path is used deliberately)."""
    for path in PKG.rglob("*.py"):
        text = path.read_text()
        for m in re.finditer(r"(applyInPandas|mapInPandas)\(", text):
            tail = text[m.end() : m.end() + 400]
            assert re.search(r'"[\w\s,<>]+"', tail), (
                f"{path.name}: {m.group(1)} without inline schema"
            )
