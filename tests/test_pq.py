"""Product quantization: python Lloyd/ADC mirror + recall on clustered data."""

from __future__ import annotations

from csd363_sin_spark.functions.similarity import (
    pq_encode,
    pq_topk,
    pq_train,
)


def _clustered_vecs(n: int, dim: int, n_clusters: int):
    # deterministic clustered vectors: center(c) + small per-vector jitter
    vecs = []
    for i in range(n):
        c = i % n_clusters
        v = [
            round(
                (1.0 if (d % n_clusters) == c else 0.1)
                + 0.01 * (((i * 31 + d * 17) % 7) - 3),
                6,
            )
            for d in range(dim)
        ]
        vecs.append((i, v))
    return vecs


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )


def _py_pq_train(vecs, dim, m, n_codes, iters, quantize, round_to):
    sub = dim // m
    seeds = [v for _, v in sorted(vecs)[:n_codes]]
    books = [
        [list(s[j * sub : (j + 1) * sub]) for s in seeds] for j in range(m)
    ]

    def assign(sv, book):
        best, bi = None, 0
        for ci, code in enumerate(book):
            d = sum((a - b) * (a - b) for a, b in zip(sv, code))
            if round_to is not None:
                d = round(d, round_to)
            if best is None or d < best:
                best, bi = d, ci
        return bi

    for _ in range(iters):
        sums = {}
        for _, v in vecs:
            for j in range(m):
                sv = v[j * sub : (j + 1) * sub]
                c = assign(sv, books[j])
                key = (j, c)
                acc = sums.setdefault(key, [[0.0, 0] for _ in range(sub)])
                for p, x in enumerate(sv):
                    acc[p][0] += x
                    acc[p][1] += 1
        for (j, c), acc in sums.items():
            for p, (s, cnt) in enumerate(acc):
                mn = s / cnt
                if quantize is not None:
                    mn = round(mn, quantize)
                books[j][c][p] = mn
    return books, assign


def test_pq_train_encode_python_mirror(spark):
    dim, m, n_codes, iters = 16, 4, 4, 2
    vecs = _clustered_vecs(24, dim, 3)
    emb = _emb_df(spark, vecs)
    books = pq_train(
        emb, dim, m=m, n_codes=n_codes, iters=iters, quantize=6, round_to=9
    )
    py_books, assign = _py_pq_train(vecs, dim, m, n_codes, iters, 6, 9)
    assert len(books) == m and len(books[0]) == n_codes
    for j in range(m):
        for c in range(n_codes):
            for a, b in zip(books[j][c], py_books[j][c]):
                assert abs(a - b) < 1e-9, (j, c)

    codes = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, books, round_to=9).collect()
    }
    sub = dim // m
    for i, v in vecs:
        expected = [assign(v[j * sub : (j + 1) * sub], py_books[j]) for j in range(m)]
        assert codes[i] == expected, i


def test_pq_topk_recall_on_clustered_data(spark):
    dim, m, n_codes = 16, 4, 8
    vecs = _clustered_vecs(60, dim, 4)
    emb = _emb_df(spark, vecs)
    probes = spark.createDataFrame(
        [(i, v) for i, v in vecs[:3]], "probe_id long, probe_vec array<double>"
    )
    got = pq_topk(emb, probes, dim, k=5, m=m, n_codes=n_codes, portable=True)
    rows = got.collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], []).append(r["vec_id"])

    # the ADC score IS the inner product with the codebook-reconstructed
    # vector — check it exactly against a python reconstruction
    books = pq_train(emb, dim, m=m, n_codes=n_codes, quantize=6, round_to=9)
    py_books, assign = _py_pq_train(vecs, dim, m, n_codes, 3, 6, 9)
    sub = dim // m
    vd = dict(vecs)
    for r in rows:
        qv, xv = vd[r["probe_id"]], vd[r["vec_id"]]
        expected = sum(
            sum(
                a * b
                for a, b in zip(
                    qv[j * sub : (j + 1) * sub],
                    py_books[j][assign(xv[j * sub : (j + 1) * sub], py_books[j])],
                )
            )
            for j in range(m)
        )
        assert abs(r["score"] - round(expected, 6)) < 1e-9, r

    # semantic recall: retrieved neighbors come from the probe's cluster
    cluster_hits = [
        sum(1 for v in approx if v % 4 == pid % 4) / len(approx)
        for pid, approx in by_probe.items()
    ]
    assert sum(cluster_hits) / len(cluster_hits) >= 0.8, cluster_hits
    # ranks are 1..5 and deterministic across runs
    again = {
        (r["probe_id"], r["rank"]): r["vec_id"]
        for r in pq_topk(
            emb, probes, dim, k=5, m=m, n_codes=n_codes, portable=True
        ).collect()
    }
    for r in rows:
        assert again[(r["probe_id"], r["rank"])] == r["vec_id"]


def test_pq_dim_not_divisible_raises(spark):
    import pytest

    emb = _emb_df(spark, _clustered_vecs(8, 10, 2))
    with pytest.raises(ValueError):
        pq_train(emb, 10, m=4)
