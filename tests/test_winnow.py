"""Winnowing fingerprints: python spec mirror + SWA coverage guarantee."""

from __future__ import annotations

import hashlib
import re

from csd363_sin_spark.functions.dedup import winnow_fingerprints, winnow_near_pairs


def _py_tokens(text: str) -> list[str]:
    s = re.sub(r"[^a-z0-9\s]", " ", text.lower()).strip()
    return re.split(r"\s+", s) if s else []


def _py_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    toks = _py_tokens(text)
    if len(toks) < k:
        return set()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    n = len(hs)
    out = set()
    for start in range(max(1, n - w + 1)):
        win = hs[start : start + w]
        m = min(win)
        # rightmost occurrence of the min
        off = max(i for i, h in enumerate(win) if h == m)
        out.add((start + off + 1, m))
    return out


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"d{i:03d}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )


def test_winnow_python_mirror(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog and the quick brown cat",
        "short one",            # < k tokens -> no fingerprints
        "a b c d e f",          # exactly one window when grams < w
        "x x x x x x x x x x",  # all-equal hashes: rightmost tie-break
    ]
    k, w = 5, 4
    got = {}
    for r in winnow_fingerprints(_docs(spark, texts), k=k, w=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, t in enumerate(texts):
        expected = _py_winnow(t, k, w)
        assert got.get(f"d{i:03d}", set()) == expected, f"doc {i}"


def test_winnow_shared_run_guarantee(spark):
    # SWA: any shared run of k+w-1 tokens yields >= 1 shared fingerprint
    k, w = 4, 3
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = k+w-1 tokens
    a = "one two three " + shared + " four five"
    b = "nine eight " + shared + " seven"
    fps = winnow_fingerprints(_docs(spark, [a, b]), k=k, w=w)
    sets = {}
    for r in fps.collect():
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    assert sets["d000"] & sets["d001"], "shared run must share a fingerprint"

    pairs = winnow_near_pairs(
        _docs(spark, [a, b, "totally different words here entirely unrelated"]),
        k=k,
        w=w,
        threshold=0.2,
    ).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [("d000", "d001")]
    p = pairs[0]
    assert p["shared"] >= 1 and 0 < p["overlap"] <= 1


def test_winnow_density_bound(spark):
    # expected fingerprint density ~ 2/(w+1); sanity: selected count is
    # well below the gram count and covers every window
    text = " ".join(f"tok{i % 17}" for i in range(200))
    k, w = 5, 8
    fps = winnow_fingerprints(_docs(spark, [text]), k=k, w=w).collect()
    n_grams = 200 - k + 1
    assert 0 < len(fps) < n_grams / 2
    assert _py_winnow(text, k, w) == {(r["pos"], r["fp"]) for r in fps}
