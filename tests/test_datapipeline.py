"""Dedup / text-analysis / similarity / multimodal operator tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from csd363_sin_spark.functions.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from csd363_sin_spark.functions.similarity import (
    cosine_topk,
    embedding_near_dups,
    lsh_topk,
)
from csd363_sin_spark.functions.text import (
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)
from csd363_sin_spark.functions.multimodal import (
    decode_features,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # case dup of 0
        (2, "The quick brown fox jumps over the lazy cat"),  # near dup
        (3, "Der Hund ist nicht mit der Katze und das ist gut"),
        (4, "completely different text about spark engines and scale"),
        (5, "!!! ??? ... ###"),  # junk
        (6, ""),  # empty
        (7, "the  quick   brown fox jumps over the lazy dog  "),  # ws dup of 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.persist().count()
    return df


def test_token_stats(spark, docs):
    got = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert got[0]["n_tokens"] == 9
    assert got[6]["n_tokens"] == 0
    assert got[5]["punct_ratio"] > 0.5
    assert got[0]["punct_ratio"] == 0.0


def test_language_id(spark, docs):
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(docs).collect()}
    assert got[0] == "en"
    assert got[3] == "de"
    assert got[5] == "und"
    assert got[6] == "und"


def test_quality_score(spark, docs):
    got = {r["doc_id"]: r["quality"] for r in quality_score(docs, min_chars=40).collect()}
    assert got[0] > got[5]
    assert got[0] > 0.6
    assert got[6] < 0.5
    assert all(0.0 <= v <= 1.0 for v in got.values())


def test_fingerprint_normalization(spark, docs):
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
    assert got[0] == got[1] == got[7]  # case/whitespace insensitive
    assert got[0] != got[2]


def test_exact_dedup(spark, docs):
    kept = sorted(r["doc_id"] for r in dedup_exact(docs).collect())
    assert 0 in kept and 1 not in kept and 7 not in kept
    dups = exact_duplicates(docs).collect()
    # 5 ("!!! ??? ...") and 6 ("") both normalize to empty -> dup pair
    assert {(r["canonical_doc_id"], r["dup_doc_id"]) for r in dups} == {(0, 1), (0, 7), (5, 6)}


def test_ngram_jaccard(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0 and pairs[(0, 7)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert not any(4 in p for p in pairs)
    # oracle recount for (0, 2)
    def shingles(t):
        toks = [w for w in t.lower().replace(",", " ").split() if w]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    a = shingles("The quick brown fox jumps over the lazy dog")
    b = shingles("The quick brown fox jumps over the lazy cat")
    expected = len(a & b) / len(a | b)
    assert pairs[(0, 2)] == pytest.approx(expected, abs=1e-6)


def test_dedup_clusters_transitive(spark):
    """A~B and B~C must land in ONE cluster even if the A~C pair was never
    emitted; unrelated docs stay singletons mapping to themselves."""
    from csd363_sin_spark.functions.dedup import dedup_clusters

    rows = [
        (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (11, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (12, "alpha beta gamma delta epsilon zeta eta theta mu lambda"),
        (20, "completely different text about spark engines and scale"),
        (21, "short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["canonical_doc_id"], r["cluster_size"])
        for r in dedup_clusters(docs, n=3, threshold=0.4).collect()
    }
    assert len(got) == 5  # every input doc appears exactly once
    assert got[10] == got[11] == got[12] == (10, 3)
    assert got[20] == (20, 1) and got[21] == (21, 1)
    # keep-one view: exactly one canonical per cluster
    kept = [d for d, (c, _) in got.items() if d == c]
    assert sorted(kept) == [10, 20, 21]


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and (0, 7) in pairs
    # verified against exact jaccard: no false positives
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert pairs <= exact
    sigs = minhash_signatures(docs, n=3, num_hashes=16).collect()
    assert all(len(r["sig"]) == 16 for r in sigs)


def test_simhash_near_pairs(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs, n=1).collect()}
    assert sh[0] == sh[1] == sh[7]  # identical token multisets
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(docs, max_hamming=8, n=1).collect()
    }
    assert pairs[(0, 1)] == 0
    # hamming verified manually
    for (a, b), hm in pairs.items():
        assert bin((sh[a] ^ sh[b]) & (2**64 - 1)).count("1") == hm


@pytest.fixture(scope="module")
def embeddings(spark):
    rows = []
    base = np.array([1.0, 0.0, 0.0, 0.0])
    for i in range(20):
        if i < 10:
            v = base + 0.01 * np.array([0, (i % 3), ((i + 1) % 3), 1]) * (i % 5)
        else:
            v = np.array([0.0, 1.0, float(i % 3), 0.5])
        rows.append((i, [float(x) for x in v], i % 2))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    df.persist().count()
    return df


def test_cosine_topk_exact(spark, embeddings):
    probes = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "probe_id long, probe_vec array<double>"
    )
    got = cosine_topk(embeddings, probes, k=5).collect()
    assert len(got) == 5
    assert got[0]["vec_id"] == 0 and got[0]["cosine"] == pytest.approx(1.0)
    # numpy oracle
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in embeddings.collect()}
    p = np.array([1.0, 0.0, 0.0, 0.0])
    sims = {
        i: float(v @ p / (np.linalg.norm(v) * np.linalg.norm(p)))
        for i, v in vecs.items()
    }
    expected = sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:5]
    assert [r["vec_id"] for r in got] == [i for i, _ in expected]


def test_knn_graph_and_semantic_clusters(spark):
    from csd363_sin_spark.functions.similarity import knn_graph, semantic_clusters

    # three tight planted clusters of 6 vectors in 6-d, plus one outlier
    import itertools

    rng = np.random.RandomState(3)
    centers = np.eye(3, 6) * 10.0
    rows = []
    for c in range(3):
        for j in range(6):
            v = centers[c] + rng.uniform(-0.5, 0.5, 6)
            rows.append((c * 6 + j, [float(x) for x in v]))
    rows.append((99, [float(x) for x in -np.ones(6)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got_edges = {
        (r["src"], r["dst"]) for r in knn_graph(emb, k=3).collect()
    }
    # numpy mirror of the spec: top-3 by (6dp cosine DESC, id ASC), mutual
    vecs = {i: np.array(v) for i, v in rows}
    topk = {}
    for i, v in vecs.items():
        sims = [
            (
                -round(
                    float(v @ w / (np.linalg.norm(v) * np.linalg.norm(w))), 6
                ),
                j,
            )
            for j, w in vecs.items()
            if j != i
        ]
        topk[i] = {j for _, j in sorted(sims)[:3]}
    expected_edges = {
        (min(i, j), max(i, j))
        for i, j in itertools.permutations(vecs, 2)
        if j in topk[i] and i in topk[j] and i < j
    }
    assert got_edges == expected_edges

    got = {
        r["vec_id"]: (r["cluster_id"], r["cluster_size"])
        for r in semantic_clusters(emb, k=3).collect()
    }
    # union-find mirror over the expected mutual edges
    parent = {i: i for i in vecs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in expected_edges:
        parent[find(a)] = find(b)
    comp: dict = {}
    for i in vecs:
        comp.setdefault(find(i), []).append(i)
    expected = {}
    for members in comp.values():
        lab = min(members)
        for m in members:
            expected[m] = (lab, len(members))
    assert got == expected
    # the plant is recovered: 3 clusters of 6 + the singleton outlier
    sizes = sorted(s for _, s in set(got.values()))
    assert sizes == [1, 6, 6, 6]
    assert got[99] == (99, 1)


def test_lsh_topk_recall(spark, embeddings):
    probes = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 1.0, 0.5])],
        "probe_id long, probe_vec array<double>",
    )
    exact = cosine_topk(embeddings, probes, k=3).collect()
    approx = lsh_topk(embeddings, probes, dim=4, k=3, num_planes=4, num_tables=8).collect()
    exact_top1 = {r["probe_id"]: r["vec_id"] for r in exact if r["rank"] == 1}
    approx_top1 = {r["probe_id"]: r["vec_id"] for r in approx if r["rank"] == 1}
    # with 8 tables of 4 planes recall@1 should hold on this easy set
    assert approx_top1 == exact_top1


def test_knn_graph_candidate_generators(spark):
    """The lsh/ivf candidate generators share the exact mode's
    rank/mutual/canonicalize tail: recall >= 0.9 vs exact on the gate
    corpus, and the production plan contains no all-pairs join."""
    from csd363_sin_spark.functions.similarity import knn_graph

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {(r["src"], r["dst"]) for r in knn_graph(emb, k=5).collect()}
    for mode in ("lsh", "ivf"):
        g = knn_graph(emb, k=5, candidates=mode, dim=64)
        plan = g._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        got = {(r["src"], r["dst"]) for r in g.collect()}
        recall = len(got & exact) / len(exact)
        assert recall >= 0.9, (mode, recall)


def test_embedding_near_dups_exact_mode(spark, embeddings):
    pairs = embedding_near_dups(embeddings, threshold=0.999, exact=True).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 5) in got  # i=0 and i=5 are both exactly `base`
    for r in pairs:
        assert r["cosine"] >= 0.999


def test_multimodal_pipeline(spark):
    media = synth_media(spark, n=30)
    feats = decode_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert 0.0 <= r["mean_intensity"] <= 255.0
        assert len(r["histogram8"]) == 8
        assert sum(r["histogram8"]) > 0
    # deterministic across runs
    feats2 = decode_features(synth_media(spark, n=30)).collect()
    key = lambda r: r["media_id"]
    assert sorted(feats, key=key) == sorted(feats2, key=key)

    resized = resize_images(media, out_w=2, out_h=2).collect()
    assert all(len(bytes(r["payload"])) == 4 + 6 + 4 for r in resized)

    frames = sample_frames(media, every_k=2).collect()
    vids = media.filter(F.col("kind") == "video").count()
    assert len({r["media_id"] for r in frames}) == vids


def test_multimodal_real_decoder_stubbed(spark):
    # decoder="real" decodes BMP/PPM/PNG bytes (test_multimodal_real.py);
    # non-image payloads (here: the synthetic SYN0 format) still raise the
    # honest JPEG/video stub error — at execution time, inside the kernel
    from pyspark.errors import PythonException

    media = synth_media(spark, n=3)
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_features(media, decoder="real").collect()


def test_portable_hash64_cross_engine(spark):
    """The md5-portable hash family must be identical in Spark, Python
    (hashlib — used for the literal LSH plane coefficients), and DuckDB
    (the driver-gate oracle)."""
    import hashlib

    import duckdb

    from csd363_sin_spark.functions.dedup import portable_hash64

    samples = ["", "a", "hello world", "0:shingle text", "unicode ñé"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", portable_hash64(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    for s in samples:
        py = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        duck = con.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)", [s]
        ).fetchone()[0]
        assert got[s] == py == duck


def test_ivf_topk_recall_and_determinism(spark):
    """IVF-flat ANN (second scale path next to hyperplane LSH): seeded
    deterministic coarse quantizer; recall@5 vs the exact baseline is
    high on the synthetic embeddings; repeated runs identical."""
    from csd363_sin_spark.functions.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5).selectExpr(
        "vec_id as probe_id", "embedding as probe_vec"
    )
    exact = cosine_topk(emb, probes, k=5).collect()
    approx = ivf_topk(emb, probes, dim=64, k=5, n_clusters=8, n_probe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["probe_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["probe_id"], set()).add(r["vec_id"])
    hits = sum(len(exact_sets[p] & approx_sets.get(p, set())) for p in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.6, (hits, total)
    # every probe must at least find itself (cosine 1.0 in its own bucket)
    for p, s in approx_sets.items():
        assert p in s
    # determinism
    again = ivf_topk(emb, probes, dim=64, k=5, n_clusters=8, n_probe=4).collect()
    key = lambda r: (r["probe_id"], r["rank"])
    assert sorted([(r["probe_id"], r["rank"], r["vec_id"]) for r in approx]) == \
           sorted([(r["probe_id"], r["rank"], r["vec_id"]) for r in again])


def test_repetition_stats_hand_computed(spark):
    from csd363_sin_spark.functions.text import repetition_stats

    rows = [
        # toks: [a b a b a] -> top tok a:3/5; bigrams: ab ba ab ba ->
        # top 2/4, ALL duplicated -> dup frac 1.0; mean len 1.0
        (1, "a b a b a"),
        # all-distinct tokens, no repeated bigram
        (2, "one two three"),
        # single token: no bigrams -> 0.0 columns
        (3, "lonely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["top_token_ratio"] == pytest.approx(3 / 5)
    assert got[1]["mean_word_len"] == pytest.approx(1.0)
    assert got[1]["top_bigram_ratio"] == pytest.approx(2 / 4)
    assert got[1]["dup_bigram_frac"] == pytest.approx(1.0)
    assert got[2]["top_token_ratio"] == pytest.approx(1 / 3)
    assert got[2]["mean_word_len"] == pytest.approx(11 / 3)
    assert got[2]["top_bigram_ratio"] == pytest.approx(1 / 2)
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[3]["top_token_ratio"] == 1.0
    assert got[3]["top_bigram_ratio"] == 0.0
    assert got[3]["dup_bigram_frac"] == 0.0


def test_quality_filter_precedence_and_reasons(spark):
    from csd363_sin_spark.functions.text import quality_filter

    rows = [
        (1, "a b"),  # 2 tokens -> too_short
        # 6 repeated tokens: too_short does NOT fire (>=5); top_token
        # (6/6 = 1.0) outranks dup_bigram even though both fail
        (2, "spam spam spam spam spam spam"),
        # healthy: 6 distinct words, mean len in band, no repetition
        (3, "quick brown foxes jumped over dogs"),
        # short words (mean len 1.0) -> word_len_low fires before
        # top_token (precedence)
        (4, "a b a b a b a b"),
        (5, "!!! ??? ... !!! ??? abcde fghij klmno pqrst uvwxy"),  # punct
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["keep"], r["reject_reason"])
        for r in quality_filter(
            docs, min_tokens=5, max_punct=0.2, min_mean_word_len=2.0
        ).collect()
    }
    assert got[1] == (False, "too_short")
    assert got[2] == (False, "top_token")
    assert got[3] == (True, None)
    assert got[4] == (False, "word_len_low")
    assert got[5] == (False, "punct")


def test_redact_pii(spark):
    from csd363_sin_spark.functions.text import redact_pii

    rows = [
        (1, "mail me at jo.doe+x@sub.example.org or jo@ex.io thanks"),
        (2, "server 192.168.0.1 and 10.0.0.255 up"),
        (3, "call +1 555 010 1234 or 0800-123-4567 now"),
        (4, "clean text with no pii at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert got[1]["redacted"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (2, 0, 0)
    assert got[2]["redacted"] == "server <IP> and <IP> up"
    assert (got[2]["n_email"], got[2]["n_ip"], got[2]["n_phone"]) == (0, 2, 0)
    assert got[3]["redacted"] == "call <PHONE> or <PHONE> now"
    assert (got[3]["n_email"], got[3]["n_ip"], got[3]["n_phone"]) == (0, 0, 2)
    assert got[4]["redacted"] == rows[3][1]
    assert (got[4]["n_email"], got[4]["n_ip"], got[4]["n_phone"]) == (0, 0, 0)


def _py_bucket(key: str, salt: str, buckets: int) -> int:
    import hashlib

    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15], 16) % buckets


def test_stratified_sample_matches_python_hash(spark):
    from csd363_sin_spark.functions.sampling import stratified_sample

    rows = [(i, f"text {i}", "en", "A" if i % 2 == 0 else "B") for i in range(200)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    # rate 0 for A (drop all), 1000 for B (keep all)
    got = stratified_sample(docs, {"A": 0, "B": 1000}, default_permille=500)
    kept = {r["doc_id"] for r in got.collect()}
    assert kept == {i for i in range(200) if i % 2 == 1}
    # default rate path: kept set == python md5 buckets, bucket col correct
    got2 = {
        r["doc_id"]: r["bucket"]
        for r in stratified_sample(docs, {}, default_permille=300).collect()
    }
    exp = {
        i: _py_bucket(str(i), "sample", 1000)
        for i in range(200)
        if _py_bucket(str(i), "sample", 1000) < 300
    }
    assert got2 == exp


def test_train_holdout_split_stable_and_total(spark):
    from csd363_sin_spark.functions.sampling import train_holdout_split

    docs = spark.createDataFrame(
        [(i, "t") for i in range(300)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["split"] for r in train_holdout_split(docs, 100).collect()}
    assert len(got) == 300
    exp_holdout = {i for i in range(300) if _py_bucket(str(i), "split", 1000) < 100}
    assert {k for k, v in got.items() if v == "holdout"} == exp_holdout
    # growing the corpus never reassigns an existing doc
    bigger = spark.createDataFrame(
        [(i, "t") for i in range(600)], "doc_id long, text string"
    )
    got2 = {r["doc_id"]: r["split"] for r in train_holdout_split(bigger, 100).collect()}
    assert all(got2[k] == v for k, v in got.items())


def test_shard_by_token_budget_both_paths(spark):
    from csd363_sin_spark.functions.sampling import shard_by_token_budget

    # doc i has i+1 tokens; budget 10 => shards by prefix sums 0,1,3,6,10,...
    rows = [(i, " ".join(["w"] * (i + 1))) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exp, acc = {}, 0
    for i in range(12):
        exp[i] = (i + 1, acc // 10)
        acc += i + 1
    driver = {
        r["doc_id"]: (r["n_tokens"], r["shard"])
        for r in shard_by_token_budget(docs, 10).collect()
    }
    dist = {
        r["doc_id"]: (r["n_tokens"], r["shard"])
        for r in shard_by_token_budget(docs, 10, local_threshold=0).collect()
    }
    assert driver == exp
    assert dist == exp  # two-phase prefix == global prefix, bit-exact
    # shards are contiguous in doc_id order and budgets respected
    shards = [v[1] for _, v in sorted(driver.items())]
    assert shards == sorted(shards)


def test_contamination_check_hand_computed(spark):
    from csd363_sin_spark.functions.dedup import contamination_check

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # bench
            (2, "a b c x"),      # shingles {a b c, b c x} -> 1 hit -> 0.5
            (3, "z z y"),        # {z z y} -> 0 hits -> 0.0
            (4, "a b c d"),      # exact leak -> {a b c, b c d} -> 1.0
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 1")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hit"], r["contamination"])
        for r in contamination_check(docs, bench, n=3).collect()
    }
    assert set(got) == {2, 3, 4}  # bench docs excluded
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (1, 0, 0.0)
    assert got[4] == (2, 2, 1.0)


def test_tfidf_top_terms_hand_computed(spark):
    import math

    from csd363_sin_spark.functions.text import tfidf_top_terms

    rows = [
        (1, "apple apple banana common"),
        (2, "banana cherry common"),
        (3, "cherry cherry cherry common"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score"])
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    idf = lambda df: math.log(3 / df)
    # doc 1: apple tf=2 df=1 -> 2*ln3 top; banana tf=1 df=2 second
    assert got[(1, 1)][0] == "apple"
    assert got[(1, 1)][2] == pytest.approx(round(2 * idf(1), 6), abs=1e-9)
    assert got[(1, 2)][0] == "banana"
    # doc 3: cherry tf=3 df=2 top; common idf = ln(1) = 0 -> score 0
    assert got[(3, 1)][0] == "cherry"
    assert got[(3, 2)] == ("common", 1, 0.0)
    # ubiquitous term never outranks a distinctive one
    assert all(term != "common" for (d, rk), (term, *_ ) in got.items() if rk == 1)


def _bpe_mirror(word_counts, num_merges, marker="#"):
    """Classic BPE on the word-frequency dict — the spec oracle."""
    seqs = {tuple(w) + (marker,): c for w, c in word_counts.items()}
    merges = []
    for rank in range(num_merges):
        pc: dict = {}
        for s, c in seqs.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + c
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, left + right, cnt))
        new = {}
        for s, c in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        seqs = new
    return merges


def test_bpe_train_vs_python_mirror(spark):
    from csd363_sin_spark.functions.text import bpe_train

    rows = [
        (1, "low low low lower lower"),
        (2, "newest newest widest widest widest"),
        (3, "low newest lowest"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wc: dict = {}
    for _, t in rows:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    expected = _bpe_mirror(wc, 8)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, num_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected
    # overlap semantics: aaaa under the a+a merge yields two "aa" symbols
    # (greedy leftmost non-overlapping), NOT three overlapping pairs; in
    # round 2 (aa,#) ties (aa,aa) at count 1 and '#' < 'a' wins the tie
    docs2 = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    got2 = [
        (r["left"], r["right"], r["pair_count"])
        for r in bpe_train(docs2, num_merges=2).orderBy("merge_rank").collect()
    ]
    assert got2 == [("a", "a", 3), ("aa", "#", 1)]
    assert got2 == [
        (left, right, c) for _, left, right, _, c in _bpe_mirror({"aaaa": 1}, 2)
    ]
    # determinism
    got_again = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, num_merges=8).orderBy("merge_rank").collect()
    ]
    assert got_again == expected


def test_bpe_encode_vs_python_mirror(spark):
    from csd363_sin_spark.functions.text import bpe_encode

    rows = [
        (1, "low low low lower lower"),
        (2, "newest newest widest widest widest"),
        (3, "low newest lowest"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wc: dict = {}
    for _, t in rows:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    merges = [(m[1], m[2]) for m in _bpe_mirror(wc, 8)]

    def encode_word(w):
        s = list(w) + ["#"]
        for left, right in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    expected = {}
    for d, t in rows:
        toks = [x for w in t.split() for x in encode_word(w)]
        expected[d] = (len(toks), ",".join(toks[:10]))
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["bpe_preview"])
        for r in bpe_encode(docs, num_merges=8).collect()
    }
    assert got == expected
    assert got[4] == (0, "")  # empty doc encodes to nothing


def test_bm25_topk_vs_python_mirror(spark):
    import math

    from csd363_sin_spark.functions.text import bm25_topk

    rows = [
        (1, "apple apple banana common common"),
        (2, "banana cherry common"),
        (3, "cherry cherry cherry common apple"),
        (4, "date elderberry"),
        (5, "common banana banana apple"),
        (6, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["doc_id"], r["score_ppm"]) for r in bm25_topk(docs, k=4).collect()]

    # python mirror of the exact spec
    toks = {d: t.split() for d, t in rows}
    n = len(rows)
    tf: dict = {}
    dl: dict = {}
    for d, ts in toks.items():
        if ts:
            dl[d] = float(len(ts))
        for t in ts:
            tf[(d, t)] = tf.get((d, t), 0.0) + 1.0
    avgdl = sum(dl.values()) / n
    dfreq: dict = {}
    for d, t in tf:
        dfreq[t] = dfreq.get(t, 0.0) + 1.0
    probe = sorted(dfreq, key=lambda t: (-dfreq[t], t))[:3]
    k1, b = 1.2, 0.75
    scores: dict = {}
    for (d, t), f in tf.items():
        if t not in probe:
            continue
        idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
        norm = f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * dl[d] / avgdl))
        scores[d] = scores.get(d, 0) + int(math.floor(idf * norm * 1e6 + 0.5))
    expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert got == expected
    # empty doc never scores; probe = the three most-common terms
    assert all(d != 6 for d, _ in got)
    assert set(probe) == {"common", "apple", "banana"}


def test_unigram_lm_score_hand_computed(spark):
    import math

    from csd363_sin_spark.functions.text import unigram_lm_score

    rows = [(1, "a a b"), (2, "b c"), (3, "   ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # corpus: c(a)=2, c(b)=2, c(c)=1; T=5, V=3, denom=8
    p = {"a": 3 / 8, "b": 3 / 8, "c": 2 / 8}
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_nll"])
        for r in unigram_lm_score(docs).collect()
    }
    assert set(got) == {1, 2}  # empty doc excluded
    exp1 = -(2 * math.log(p["a"]) + math.log(p["b"])) / 3
    exp2 = -(math.log(p["b"]) + math.log(p["c"])) / 2
    assert got[1] == (3, round(exp1, 6))
    assert got[2] == (2, round(exp2, 6))
    # junk doc scores higher NLL than a typical one
    assert got[2][1] > got[1][1]


def test_corpus_mix_hand_computed(spark):
    from csd363_sin_spark.functions.text import corpus_mix, quality_score, token_stats

    rows = [
        (1, "one two three", "en", "web"),
        (2, "four five", "en", "web"),
        (3, "sechs sieben", "de", "books"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    got = {
        (r["source"], r["lang"]): (r["n_docs"], r["total_tokens"], r["mean_quality"])
        for r in corpus_mix(docs).collect()
    }
    assert got[("web", "en")] == (2, 5, round((q[1] + q[2]) / 2, 6))
    assert got[("books", "de")] == (1, 2, q[3])


def test_dedup_keep_best_quality_argmax(spark):
    """keep_best must pick the highest-quality doc per cluster (NOT the
    min doc_id), ties broken by lowest doc_id; singletons keep themselves."""
    from csd363_sin_spark.functions.dedup import dedup_keep_best
    from csd363_sin_spark.functions.text import quality_score

    # punctuation is stripped by the shared tokenizer, so doc 10 has the
    # SAME shingles as doc 11 (guaranteed cluster) but a punct ratio > 0.3
    # -> lower quality; doc 12 differs in one trailing word (still near-dup)
    base = "alpha beta gamma delta epsilon zeta eta and the of to in"
    punct = " !?!?;;;!?!?;;;!?!?;;;!?!?;;;!?!?;;;"
    rows = [
        (10, base + " kappa" + punct),  # near-dup, LOW quality (punct-heavy)
        (11, base + " kappa"),
        (12, base + " lambda"),
        (20, "completely unrelated text about spark engines at scale"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert q[11] > q[10]  # the premise of the test
    got = {
        r["doc_id"]: (r["best_doc_id"], r["best_quality"], r["cluster_size"])
        for r in dedup_keep_best(docs, n=3, threshold=0.4).collect()
    }
    assert len(got) == 4
    # cluster {10,11,12}: best is NOT min-id 10 — it's the max-quality doc
    best_id, best_q, size = got[10]
    assert size == 3 and best_q == max(q[10], q[11], q[12])
    assert best_id == min(d for d in (10, 11, 12) if q[d] == best_q)
    assert got[10] == got[11] == got[12]
    assert got[20] == (20, q[20], 1)


def test_bloom_contamination_upper_bounds_exact(spark, docs):
    from csd363_sin_spark.functions.dedup import (
        bloom_contamination,
        contamination_check,
    )

    bench = docs.limit(2)
    exact = {
        r["doc_id"]: (r["n_shingles"], r["n_hit"])
        for r in contamination_check(docs, bench, n=3).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_shingles"], r["n_flagged"])
        for r in bloom_contamination(docs, bench, n=3).collect()
    }
    assert set(bloom) == set(exact)
    for d, (n_sh, n_hit) in exact.items():
        b_sh, b_flag = bloom[d]
        assert b_sh == n_sh
        # one-sided error: bloom flags AT LEAST every true hit
        assert b_flag >= n_hit
    # determinism
    again = {
        r["doc_id"]: (r["n_shingles"], r["n_flagged"])
        for r in bloom_contamination(docs, bench, n=3).collect()
    }
    assert again == bloom


def test_resample_to_mix_expected_multiplicity_and_stability(spark):
    from csd363_sin_spark.functions.sampling import explode_copies, resample_to_mix

    rows = [(i, f"text {i}", "web" if i % 2 == 0 else "wiki") for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    mixed = resample_to_mix(docs, {"web": 0.5, "wiki": 2.25})
    got = {r["doc_id"]: r["n_copies"] for r in mixed.collect()}
    # bounds: floor(w) <= n <= ceil(w)
    for d, n in got.items():
        if d % 2 == 0:
            assert n in (0, 1)
        else:
            assert n in (2, 3)
    # expected multiplicity ~ w (1000 docs/stratum, hash-uniform)
    web_mean = sum(got[d] for d in got if d % 2 == 0) / 1000
    wiki_mean = sum(got[d] for d in got if d % 2 == 1) / 1000
    assert abs(web_mean - 0.5) < 0.06
    assert abs(wiki_mean - 2.25) < 0.06
    # stability: adding docs never changes an existing doc's count
    more = spark.createDataFrame(
        rows + [(9000 + i, "extra", "web") for i in range(50)],
        "doc_id long, text string, source string",
    )
    again = {
        r["doc_id"]: r["n_copies"]
        for r in resample_to_mix(more, {"web": 0.5, "wiki": 2.25}).collect()
    }
    assert all(again[d] == n for d, n in got.items())
    # explode_copies materializes exactly sum(n_copies) rows
    assert explode_copies(mixed).count() == sum(got.values())


def test_bigram_lm_score_hand_computed(spark):
    import math

    from csd363_sin_spark.functions.text import bigram_lm_score

    rows = [
        (1, "a b a b"),      # bigrams: ab ba ab
        (2, "a b c"),        # bigrams: ab bc
        (3, "solo"),         # <2 tokens -> excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    assert 3 not in got
    # corpus: c(ab)=3, c(ba)=1, c(bc)=1; heads c1(a)=3, c1(b)=2; V=4
    v = 4
    p_ab = (3 + 1) / (3 + v)
    p_ba = (1 + 1) / (2 + v)
    p_bc = (1 + 1) / (2 + v)
    assert got[1]["n_bigrams"] == 3
    exp1 = -(math.log(p_ab) * 2 + math.log(p_ba)) / 3
    assert got[1]["avg_nll"] == pytest.approx(exp1, abs=1e-6)
    exp2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert got[2]["avg_nll"] == pytest.approx(exp2, abs=1e-6)
    # fluent text scores lower surprise than shuffled text (same unigrams)
    big = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    big.append((100, "dog the over quick lazy jumps fox brown the"))
    corpus = spark.createDataFrame(big, "doc_id long, text string")
    s = {r["doc_id"]: r["avg_nll"] for r in bigram_lm_score(corpus).collect()}
    assert s[0] < s[100]


def test_semantic_dedup_python_mirror(spark):
    """semantic_dedup vs an independent numpy mirror of the SemDeDup rule
    (cluster via the same quantizer output, drop v iff a same-cluster u
    with cosine >= t has lower (centroid_sim, id)); plus planted-duplicate
    behavior: exactly one survivor per within-cluster duplicate group."""
    from csd363_sin_spark.functions.similarity import (
        ivf_flat_index,
        semantic_dedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # plant near-duplicates: coords + 0.05 (cosine ~0.92-0.94 to original)
    aug = emb.filter(F.col("vec_id") < 10).selectExpr(
        "vec_id + 100000 AS vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE) + 0.05) AS embedding",
    )
    corpus = emb.selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding"
    ).unionByName(aug)
    got = {
        r["vec_id"]: (r["cluster"], r["centroid_sim"], r["keep"])
        for r in semantic_dedup(
            corpus, dim=64, threshold=0.9, n_clusters=4
        ).collect()
    }
    assert len(got) == corpus.count()

    # numpy mirror using the SAME quantizer assignment (the quantizer
    # itself is covered by the ivf tests + DuckDB oracle)
    assigned, centroids = ivf_flat_index(corpus, 64, n_clusters=4)
    cl = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in corpus.collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    csim = {i: cos(v, np.array(centroids[cl[i]])) for i, v in vecs.items()}
    for i in vecs:
        assert got[i][0] == cl[i]
        assert got[i][1] == pytest.approx(csim[i], abs=1e-5)
        dropped = any(
            cl[j] == cl[i]
            and j != i
            and round(cos(vecs[j], vecs[i]), 6) >= 0.9
            and (csim[j], j) < (csim[i], i)
            for j in vecs
        )
        assert got[i][2] == (not dropped), i
    # planted pairs that share a cluster lose exactly one member
    n_dropped = sum(1 for v in got.values() if not v[2])
    shared = sum(1 for i in range(10) if cl[i] == cl[i + 100000])
    assert n_dropped == shared > 0


def test_chunk_documents_hand_computed(spark):
    from csd363_sin_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),      # 10 tokens
            (2, "one two three"),             # 3 tokens (single short chunk)
            (3, "  "),                         # empty -> no chunks
            (4, "Xx, yY! z9"),                 # tokenizer: xx yy z9
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    }
    # doc 1: stride 2, starts while s <= 10-2=8 -> 1,3,5,7 (0-based idx)
    assert got[(1, 0)] == (4, "a b c d")
    assert got[(1, 1)] == (4, "c d e f")
    assert got[(1, 2)] == (4, "e f g h")
    assert got[(1, 3)] == (4, "g h i j")
    assert (1, 4) not in got
    assert got[(2, 0)] == (3, "one two three")
    assert all(d != 3 for d, _ in got)
    assert got[(4, 0)] == (3, "xx yy z9")
    # coverage property on a longer doc: every token index appears
    long = spark.createDataFrame(
        [(9, " ".join(f"t{i}" for i in range(23)))], "doc_id long, text string"
    )
    chunks = chunk_documents(long, chunk_tokens=8, overlap=3).collect()
    seen = set()
    for r in chunks:
        seen.update(r["chunk_text"].split(" "))
    assert seen == {f"t{i}" for i in range(23)}
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_build_vocab_hand_computed(spark):
    from csd363_sin_spark.functions.text import build_vocab

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana apple date"),
            (3, "Cherry! banana."),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["term_id"]: (r["term"], r["count"], r["doc_freq"])
        for r in build_vocab(docs, max_size=3, min_count=1).collect()
    }
    # counts: apple 3, banana 3, cherry 2, date 1; ties (apple/banana) by term
    assert rows == {
        0: ("apple", 3, 2),
        1: ("banana", 3, 3),
        2: ("cherry", 2, 2),
    }
    # min_count filter
    all_rows = build_vocab(docs, max_size=10, min_count=2).collect()
    assert {r["term"] for r in all_rows} == {"apple", "banana", "cherry"}


def test_quantize_embeddings_roundtrip(spark):
    import numpy as np

    from csd363_sin_spark.functions.similarity import quantize_embeddings

    emb = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),          # all-zero: scale 0, codes 0
            (3, [-2.0, 2.0, 1.0, -1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in quantize_embeddings(emb).collect()}
    assert got[2]["codes"] == [0, 0, 0, 0] and got[2]["scale_ppb"] == 0
    # vec 1: scale 1/127 -> codes [127, -64 (floor(-63.5+0.5)), 32 (31.75->32.25 floor 32), 0]
    assert got[1]["codes"] == [127, -63, 32, 0]
    assert got[3]["codes"] == [-127, 127, 64, -63]
    # reconstruction error bound: |x - c*scale| <= scale/2 + eps
    for vid, vec in ((1, [1.0, -0.5, 0.25, 0.0]), (3, [-2.0, 2.0, 1.0, -1.0])):
        scale = got[vid]["scale_ppb"] / 1e9
        worst = max(
            abs(x - c * scale) for x, c in zip(vec, got[vid]["codes"])
        )
        # scale here is ppb-rounded (off by <=0.5e-9, amplified by |c|<=127)
        assert worst <= scale / 2 + 127 * 1e-9
        assert abs(got[vid]["max_err_ppm"] - worst * 1e6) <= 1.0
    assert got[1]["codes_csv"] == "127,-63,32,0"


def test_zipf_fit_planted_law(spark):
    """A corpus with exactly Zipfian counts (count = C / rank) fits slope
    ~ -1 with r2 ~ 1; a flat corpus fits slope 0."""
    import numpy as np

    from csd363_sin_spark.functions.text import zipf_fit

    # terms w0..w19, term i repeated round(200/(i+1)) times
    words = []
    for i in range(20):
        words += [f"w{i}"] * int(round(200 / (i + 1)))
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    row = zipf_fit(docs, max_size=100, min_count=1).collect()[0]
    assert row["n_terms"] == 20
    assert row["slope"] == pytest.approx(-1.0, abs=0.05)
    assert row["r2"] > 0.99
    flat = spark.createDataFrame(
        [(1, " ".join(f"t{i} t{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    row2 = zipf_fit(flat, max_size=100, min_count=1).collect()[0]
    assert row2["slope"] == pytest.approx(0.0, abs=1e-9)


def test_pca_top_component_vs_numpy(spark):
    """Converged power iteration aligns with numpy's leading eigenvector
    of the centered covariance (up to sign) on a planted-direction set."""
    from csd363_sin_spark.functions.similarity import pca_top_component

    rng_free = []
    # planted dominant direction d ~ [3, -2, 1, 0] + structured residue
    for i in range(40):
        t = (i - 20) / 5.0
        rng_free.append(
            (
                i,
                [
                    3.0 * t + 0.1 * ((i * 7) % 5 - 2),
                    -2.0 * t + 0.1 * ((i * 3) % 5 - 2),
                    1.0 * t + 0.1 * ((i * 11) % 5 - 2),
                    0.1 * ((i * 13) % 5 - 2),
                ],
            )
        )
    emb = spark.createDataFrame(rng_free, "vec_id long, embedding array<double>")
    got = {
        r["pos"]: r["loading"]
        for r in pca_top_component(emb, dim=4, iters=60).collect()
    }
    v = np.array([got[j] for j in range(4)])
    X = np.array([row[1] for row in rng_free])
    Xc = X - X.mean(axis=0)
    evals, evecs = np.linalg.eigh(Xc.T @ Xc / len(X))
    top = evecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos == pytest.approx(1.0, abs=1e-6)


def test_repeated_spans_hand_computed(spark):
    """ExactSubstr fixed-window spans (Lee et al. 2021): shared 4-gram
    across docs 1/2 merges overlapping windows into one maximal span;
    within-doc repetition counts toward min_count; unique text yields
    no spans."""
    from csd363_sin_spark.functions.dedup import repeated_spans

    shared = "alpha beta gamma delta epsilon"  # 5 tokens -> two 4-windows
    docs = spark.createDataFrame(
        [
            (1, f"u1 u2 {shared} u3 u4"),        # span at tokens 3..7
            (2, f"{shared} v1 v2 v3"),            # span at tokens 1..5
            (3, "w1 w2 rep rep rep rep rep w3"),  # within-doc 4-gram x2
            (4, "x1 x2 x3 x4 x5 x6 x7 x8"),       # unique -> nothing
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"], r["n_windows"])
        for r in repeated_spans(docs, k=4, min_count=2).collect()
    }
    # doc 1: windows starting at 3 and 4 (1-based) merge -> span 3..7
    assert got[1] == (3, 7, 5, 2)
    assert got[2] == (1, 5, 5, 2)
    # doc 3: "rep rep rep rep" occurs at starts 3 and 4 -> span 3..7
    assert got[3] == (3, 7, 5, 2)
    assert 4 not in got
    # production hash family: identical span set
    got_xx = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"], r["n_windows"])
        for r in repeated_spans(docs, k=4, min_count=2, hash_mode="xxhash64").collect()
    }
    assert got_xx == got


def test_strip_repeated_spans_hand_computed(spark):
    from csd363_sin_spark.functions.dedup import strip_repeated_spans

    shared = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (1, f"u1 u2 {shared} u3"),   # 7 tokens, drop 3..6
            (2, f"{shared} v1"),          # 5 tokens, drop 1..4
            (3, "clean text only here"),  # untouched
            (4, "   "),                    # empty -> 0 tokens
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in strip_repeated_spans(docs, k=4, min_count=2).collect()
    }
    assert got[1] == (7, 4, "u1 u2 u3")
    assert got[2] == (5, 4, "v1")
    assert got[3] == (4, 0, "clean text only here")
    assert got[4] == (0, 0, "")


def test_pack_sequences_hand_computed(spark):
    """Token-stream packing: doc_id order (no salt), capacity 4.
    Stream: d1 = a b c (3), d2 = d e f g h (5), d3 = i (1) ->
    seq0 = a b c d, seq1 = e f g h, seq2 = i."""
    from csd363_sin_spark.functions.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g h"), (3, "i"), (4, "   ")],
        "doc_id long, text string",
    )
    rows = sorted(
        (
            (r["seq_id"], r["seq_offset"], r["doc_id"], r["doc_start"],
             r["n_tokens"], r["frag_text"])
            for r in pack_sequences(docs, seq_tokens=4).collect()
        )
    )
    assert rows == [
        (0, 0, 1, 1, 3, "a b c"),
        (0, 3, 2, 1, 1, "d"),
        (1, 0, 2, 2, 4, "e f g h"),
        (2, 0, 3, 1, 1, "i"),
    ]
    # reassembly invariant under the shuffled order: every sequence except
    # the last is exactly full, and the token multiset is preserved
    long_docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}t{j}" for j in range(i % 7 + 1))) for i in range(40)],
        "doc_id long, text string",
    )
    frags = pack_sequences(long_docs, seq_tokens=8, shuffle_salt="s").collect()
    total = sum(r["n_tokens"] for r in frags)
    assert total == sum(i % 7 + 1 for i in range(40))
    per_seq = {}
    for r in frags:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["n_tokens"]
    last = max(per_seq)
    assert all(v == 8 for s, v in per_seq.items() if s != last)
    assert 0 < per_seq[last] <= 8
    # fragment texts concatenate to each doc's normalized tokens
    by_doc = {}
    for r in sorted(frags, key=lambda r: (r["doc_id"], r["doc_start"])):
        by_doc.setdefault(r["doc_id"], []).append(r["frag_text"])
    for i in range(40):
        assert " ".join(by_doc[i]) == " ".join(f"w{i}t{j}" for j in range(i % 7 + 1))


def test_zero_vector_centroid_assign_arrow_expr_parity(spark):
    """An all-zero embedding must not yield NaN scores (engine-dependent
    argmax/argsort): the query norm is clamped like the centroid norm in
    BOTH the arrow kernel and the expr twin, so the zero vector's scores
    are 0.0 everywhere and the first-index tie-break picks centroid 0 in
    both engines."""
    from csd363_sin_spark.functions.similarity import (
        _nearest_centroid_arrow,
        _nearest_centroid_expr,
        _topk_centroids_arrow,
    )

    cents = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.5, 0.1])], "vec_id long, v array<double>"
    )
    got = df.select(
        "vec_id",
        _nearest_centroid_arrow(cents)(F.col("v")).alias("a"),
        _nearest_centroid_expr(F.col("v"), cents).alias("e"),
        _topk_centroids_arrow(cents, p=2)(F.col("v")).alias("t"),
    ).collect()
    by_id = {r["vec_id"]: r for r in got}
    assert by_id[0]["a"] == by_id[0]["e"] == 0
    assert list(by_id[0]["t"]) == [0, 1]
    assert by_id[1]["a"] == by_id[1]["e"]
