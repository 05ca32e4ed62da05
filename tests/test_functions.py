"""Operator tests: dedup, similarity, text stats, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from newscrawler_spark import codecs, datagen
from newscrawler_spark.functions import dedup as D
from newscrawler_spark.functions import multimodal as MM
from newscrawler_spark.functions import similarity as SIM
from newscrawler_spark.functions import text as T
from newscrawler_spark.functions import textstats as TS

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
    (4, "completely different content about spark dataframes and shuffle tuning"),
    (5, "der schnelle braune fuchs springt und das ist nicht mit einem hund"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_id(spark, docs):
    out = {r["doc_id"] for r in D.exact_dedup(docs, "text", "doc_id").collect()}
    assert out == {1, 3, 4, 5}


def test_minhash_lsh_finds_near_dups(spark, docs):
    sig = D.minhash_signature(docs, "doc_id", "text", num_hashes=32)
    assert sig.count() == 5
    pairs = D.lsh_candidate_pairs(sig, "doc_id", bands=16, rows_per_band=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # identical docs always collide
    verified = D.jaccard_pairs(docs, "doc_id", "text", pairs, threshold=0.7)
    vp = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert (1, 2) in vp
    survivors = {r["doc_id"] for r in D.minhash_dedup(docs, "doc_id", "text", 0.7).collect()}
    assert 1 in survivors and 2 not in survivors
    assert 4 in survivors and 5 in survivors


def test_simhash_near_pairs(spark, docs):
    sh = D.simhash(docs, "doc_id", "text")
    vals = {r["doc_id"]: r["simhash"] for r in sh.collect()}
    assert vals[1] == vals[2]  # identical text -> identical simhash
    # max_hamming=16 needs n_chunks > 16 for the recall guarantee
    pairs = D.simhash_near_pairs(sh, "doc_id", max_hamming=16, n_chunks=32)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 2)] == 0
    # near-dup 1-3 should be within a small distance; 1-4 should not pair at 16
    if (1, 3) in got:
        assert got[(1, 3)] <= 16
    assert (1, 4) not in got or got[(1, 4)] > 10


def test_shingles_and_jaccard_extremes(spark, docs):
    sh = docs.select("doc_id", D.shingles_col(F.col("text"), 3).alias("s")).collect()
    by_id = {r["doc_id"]: set(r["s"]) for r in sh}
    assert by_id[1] == by_id[2]
    assert len(by_id[1] & by_id[4]) == 0


def test_lang_id_markers(spark, docs):
    out = {r["doc_id"]: r["pred_lang"] for r in TS.lang_id(docs, "text").collect()}
    assert out[1] == "en"
    assert out[5] == "de"


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello, world! 42 times")], "id long, text string")
    r = df.select(
        TS.token_count_ws(F.col("text")).alias("ws"),
        TS.token_count_bpe_ish(F.col("text")).alias("bpe"),
    ).first()
    assert r["ws"] == 4
    # hello , world ! 42 times -> 6
    assert r["bpe"] == 6


def test_quality_features_ratios(spark):
    df = spark.createDataFrame([(1, "the cat, the hat!")], "id long, text string")
    r = TS.quality_features(df, "text").first()
    assert r["n_tokens"] == 4
    assert r["n_punct"] == 2
    assert r["n_stopwords"] == 2
    assert r["stopword_ratio"] == 0.5


def test_winnow_fingerprints_properties(spark, docs):
    fps = {r["doc_id"]: r["fps"] for r in TS.winnow_fingerprints(docs, "doc_id", "text").collect()}
    assert fps[1] == fps[2]  # identical docs -> identical fingerprints
    assert fps[1] != fps[4]
    # near-dup shares most fingerprints
    inter = len(set(fps[1]) & set(fps[3]))
    assert inter / len(set(fps[1]) | set(fps[3])) > 0.5


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = SIM.cosine_topk(df, "embedding", [1.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 1, 2]
    assert out[0]["cos_sim"] == pytest.approx(1.0)


def test_ann_lsh_contains_query_neighbors(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal(16)
    rows = [(0, [float(x) for x in base])]
    for i in range(1, 50):
        v = base + rng.standard_normal(16) * (0.01 if i < 5 else 2.0)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = SIM.ann_lsh_topk(df, "embedding", [float(x) for x in base], k=5, bits=4)
    ids = [r["vec_id"] for r in out.collect()]
    assert 0 in ids  # the query vector itself is in its own bucket


def test_embedding_near_dup_pairs_blocked(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.001]),
        (2, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = SIM.embedding_near_dup_pairs(df, "embedding", threshold=0.99, bits=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert all(p != (0, 2) and p != (1, 2) for p in got)


def test_decode_features_real_and_stub(spark):
    payload = datagen.gen_payload_spark(spark, 20, 42)
    out = MM.decode_features(payload).collect()
    assert len(out) == 20
    assert all(r["ok"] for r in out)
    # stubbed external format
    ext = spark.createDataFrame(
        [("x-1", bytearray(b"\xff\xd8\xff"), "jpeg")],
        "image_id string, bytes binary, fmt string",
    )
    r = MM.decode_features(ext).first()
    assert r["ok"] is False and r["reason"] == "codec_unavailable"


def _flip_bits(phash: int, bits) -> int:
    """Flip the given bit positions of a signed int64 phash."""
    v = phash & ((1 << 64) - 1)
    for b in bits:
        v ^= 1 << b
    return v - (1 << 64) if v >= 1 << 63 else v


def _hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_near_pairs_matches_brute_force(spark):
    """Chunk-blocked image near-dup ≡ O(n²) brute force, with planted
    perturbations at known hamming distances straddling the threshold."""
    pdf = datagen.gen_payload_pdf(np.arange(60), 42)
    rows = [(iid, int(ph)) for iid, ph in zip(pdf["image_id"], pdf["phash"])]
    base = int(pdf["phash"].iat[0])
    planted = {
        "zz-ham0": _flip_bits(base, []),        # exact phash dup
        "zz-ham1": _flip_bits(base, [5]),       # 1 bit off
        "zz-ham6": _flip_bits(base, [0, 9, 17, 33, 48, 63]),  # at threshold
        "zz-ham7": _flip_bits(base, [0, 9, 17, 33, 48, 56, 63]),  # past it
    }
    rows += list(planted.items())
    df = spark.createDataFrame(rows, "image_id string, phash long")

    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in MM.phash_near_pairs(df, max_hamming=6).collect()
    }
    want = {
        (min(a, b), max(a, b), _hamming64(pa, pb))
        for i, (a, pa) in enumerate(rows)
        for b, pb in rows[i + 1:]
        if _hamming64(pa, pb) <= 6
    }
    # recall-complete (pigeonhole: 6 < 8 chunks) AND no false pairs
    assert got == want
    assert (pdf["image_id"].iat[0], "zz-ham0", 0) in got
    assert (pdf["image_id"].iat[0], "zz-ham6", 6) in got
    assert not any("zz-ham7" in (a, b) and pdf["image_id"].iat[0] in (a, b)
                   for a, b, _ in got)


def test_phash_dedup_clusters_transitive(spark):
    """a~b and b~c within threshold, a~c past it — transitivity must still
    put all three in one cluster under the min-id label."""
    base = 0x0123_4567_89AB_CDEF
    rows = [
        ("img-a", _flip_bits(base, [])),
        ("img-b", _flip_bits(base, [1, 2, 3, 4, 5, 6])),          # a↔b ham 6
        ("img-c", _flip_bits(base, [1, 2, 3, 4, 5, 6, 10, 11, 12, 13, 14, 15])),  # b↔c 6, a↔c 12
        ("img-z", _flip_bits(base, [b for b in range(0, 64, 2)])),  # far from all
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    comp = {
        r["image_id"]: r["comp"]
        for r in MM.phash_dedup_clusters(df, max_hamming=6).collect()
    }
    assert comp["img-a"] == comp["img-b"] == comp["img-c"] == "img-a"
    assert comp["img-z"] == "img-z"


def test_resize_block_mean(spark):
    payload = datagen.gen_payload_spark(spark, 5, 42)
    out = {r["image_id"]: r for r in MM.resize_images(payload, factor=2).collect()}
    src = {r["image_id"]: r for r in payload.collect()}
    for iid, r in out.items():
        assert r["ok"]
        assert r["w"] == src[iid]["w"] // 2 and r["h"] == src[iid]["h"] // 2
        arr = codecs.decode_ppm(bytes(r["bytes"]))
        assert arr.shape == (r["h"], r["w"], 3)


def test_text_function_parity_examples(spark):
    df = spark.createDataFrame(
        [("  Hello\x00\x1f   World\t!  ",)], "s string"
    )
    r = df.select(
        T.clean_text(F.col("s")).alias("c"),
        T.summary_200(F.lit("x" * 300)).alias("sm"),
        T.strip_source_suffix(F.lit("Big Story - CNN")).alias("st"),
        T.normalize_name(F.lit("U.S.  News & World")).alias("nn"),
        T.digits_only_long(F.lit("1,234,567 views")).alias("d"),
        T.domain_of(F.lit("https://WWW.Example.com/a")).alias("dom"),
        T.resolve_relative(F.lit("./topics/x"), "https://news.google.com").alias("rr"),
    ).first()
    assert r["c"] == "Hello World !"
    assert r["sm"] == "x" * 200 + "..."
    assert r["st"] == "Big Story"
    assert r["nn"] == "us news and world"
    assert r["d"] == 1234567
    assert r["dom"] == "example.com"
    assert r["rr"] == "https://news.google.com/topics/x"


def test_regex_cascade_first_match_wins(spark):
    df = spark.createDataFrame([('<meta name="title" content="A"/>',)], "html string")
    out = df.select(
        T.regex_cascade(
            F.col("html"),
            [r'og:title" content="([^"]*)"', r'name="title" content="([^"]*)"'],
        ).alias("t")
    ).first()
    assert out["t"] == "A"


def test_simhash_blocked_pairs_recall_complete(spark):
    """Pigeonhole guarantee: every pair within max_hamming < n_chunks is
    recovered by the chunk-blocked join (VERDICT r01 recall bug regression)."""
    rng = np.random.default_rng(7)
    rows = []
    expected = set()
    for i in range(40):
        base = int(rng.integers(0, 1 << 63))
        rows.append((2 * i, base))
        d = int(rng.integers(0, 8))  # hamming distance 0..7
        flipped = base
        for b in rng.choice(64, size=d, replace=False):
            flipped ^= 1 << int(b)
        rows.append((2 * i + 1, flipped))
        expected.add((2 * i, 2 * i + 1, d))
    df = spark.createDataFrame(rows, "id long, simhash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_near_pairs(df, "id", max_hamming=7, n_chunks=8).collect()
    }
    assert expected <= got  # every planted pair recovered at its exact distance
    # and the bound is enforced, not silently violated
    with pytest.raises(ValueError):
        D.simhash_near_pairs(df, "id", max_hamming=8, n_chunks=8)


def test_lsh_blocked_near_pairs_subset_of_exact(spark):
    """The LSH-blocked scale path never invents pairs: blocked ⊆ exact, and
    identical-vector pairs (recall floor) are always found."""
    rng = np.random.default_rng(11)
    vecs = [rng.standard_normal(16).astype("float32") for _ in range(30)]
    vecs.append(vecs[0].copy())  # planted exact duplicate -> cosine 1.0
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["id_a"], r["id_b"])
        for r in SIM.cosine_near_pairs_exact(df, "embedding", threshold=0.9).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"])
        for r in SIM.embedding_near_dup_pairs(df, "embedding", threshold=0.9, bits=4).collect()
    }
    assert blocked <= exact
    assert (0, 30) in blocked  # identical vectors share every LSH signature


def test_minhash_md5_dedup_matches_xxhash_semantics(spark):
    """Both hash families agree on exact duplicates (jaccard=1 always passes
    verification regardless of family)."""
    rows = [(1, "alpha beta gamma delta epsilon zeta"), (2, "alpha beta gamma delta epsilon zeta"),
            (3, "totally different words here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(r["doc_id"] for r in D.minhash_md5_dedup(df, "doc_id", "text").collect())
    assert out == [1, 3]


def test_frame_sample_real_qvid_container(spark):
    """Video frame sampling is real for the owned QVID container: every Nth
    frame decoded, per-frame features computed; external containers (mp4)
    pass through the codec seam with zero frames, never an exception."""
    rng = np.random.default_rng(3)
    vids = []
    expected = {}
    for v in range(3):
        frames = [rng.integers(0, 256, size=(16, 16, 3)).astype("uint8") for _ in range(7)]
        vids.append((f"vid-{v}", MM.encode_qvid(frames), "qvid"))
        expected[f"vid-{v}"] = {
            idx: codecs.average_phash(frames[idx]) for idx in (0, 3, 6)
        }
    vids.append(("vid-x", b"\x00\x01\x02", "mp4"))  # external codec seam
    df = spark.createDataFrame(vids, "video_id string, bytes binary, fmt string")
    out = MM.frame_sample(df, every_n=3).collect()
    got = {}
    for r in out:
        got.setdefault(r["video_id"], {})[r["frame_idx"]] = r["phash"]
        assert (r["w"], r["h"]) == (16, 16)
    assert got == expected  # 3 sampled frames per qvid video, none for mp4


def test_connected_components_transitive_chain(spark):
    """a-b, b-c, c-d (no shortcuts): all four must land in one component,
    which single-link 'victims' logic cannot produce; isolated vertex keeps
    its own label. Chain depth exercises multi-iteration convergence."""
    verts = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 7)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["comp"] for r in D.connected_components(verts, edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 6}


def test_ann_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe (query bucket + hamming-1 neighbors) must recover at
    least the single-probe candidates and strictly improve recall of
    planted near neighbors that fall just across one hyperplane."""
    rng = np.random.default_rng(17)
    base = rng.standard_normal(16)
    rows = [(0, [float(x) for x in base])]
    for i in range(1, 120):
        noise = 0.05 if i <= 20 else 2.5
        v = base + rng.standard_normal(16) * noise
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = SIM.ann_index(df, "embedding", bits=6).cache()
    q = [float(x) for x in base]
    single = {r["vec_id"] for r in SIM.ann_lsh_topk(df, "embedding", q, k=10, bits=6).collect()}
    multi = {
        r["vec_id"]
        for r in SIM.ann_multiprobe_topk(idx, "embedding", q, k=10, bits=6).collect()
    }
    exact = {r["vec_id"] for r in SIM.cosine_topk(df, "embedding", q, k=10).collect()}
    assert 0 in multi
    # multi-probe recall of the true top-10 >= single-probe recall
    assert len(multi & exact) >= len(single & exact)
    assert len(multi & exact) >= 6  # and it actually finds most of them


def test_connected_components_string_ids(spark):
    """The convergence witness must be type-agnostic: string ids in a
    3-chain converge to one component (a label-sum witness would silently
    stop after one iteration here)."""
    verts = spark.createDataFrame([("a",), ("b",), ("c",), ("z",)], "id string")
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "id_a string, id_b string")
    comp = {r["id"]: r["comp"] for r in D.connected_components(verts, edges).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "z": "z"}


def test_degenerate_lsh_bucket_cap(spark):
    """VERDICT r02 perf #3: 10^4 identical-signature docs must not turn one
    bucket's self-join quadratic. With the cap the pair count is bounded by
    bands * C(cap, 2) and the job completes near-linearly; the capped
    candidate set is a subset of the uncapped one by construction."""
    import time

    n = 10_000
    df = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate cookie banner accept all rights reserved").alias("text"),
    )
    sig = D.minhash_signature(df, "doc_id", "text", num_hashes=8)
    t0 = time.time()
    pairs = D.lsh_candidate_pairs(
        sig, "doc_id", bands=4, rows_per_band=2, max_bucket=50
    ).collect()
    dt = time.time() - t0
    # all 4 band buckets collapse to the same 50 lowest ids -> C(50,2) pairs
    assert len(pairs) == 50 * 49 // 2
    assert {r["id_a"] for r in pairs} <= set(range(50))
    assert dt < 60, f"capped degenerate bucket took {dt:.1f}s"

    # non-degenerate data is untouched by the cap (identical results)
    small = spark.createDataFrame(DOCS, "doc_id long, text string")
    s2 = D.minhash_signature(small, "doc_id", "text", num_hashes=32)
    a = {(r["id_a"], r["id_b"]) for r in D.lsh_candidate_pairs(s2, "doc_id", 16, 2).collect()}
    b = {(r["id_a"], r["id_b"]) for r in D.lsh_candidate_pairs(s2, "doc_id", 16, 2, max_bucket=None).collect()}
    assert a == b


def test_degenerate_simhash_and_embedding_bucket_cap(spark):
    """Same cap on the simhash chunk join and the embedding LSH join."""
    n = 5_000
    df = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.lit("identical text everywhere the same").alias("text"),
    )
    sh = D.simhash(df, "doc_id", "text")
    pairs = D.simhash_near_pairs(
        sh, "doc_id", max_hamming=3, n_chunks=8, max_bucket=40
    ).collect()
    assert len(pairs) == 40 * 39 // 2  # all chunks identical -> one capped set
    emb = spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(v)) for v in (0.1, 0.2, 0.3, 0.4)]).alias("embedding"),
    )
    ep = SIM.embedding_near_dup_pairs(
        emb, "embedding", threshold=0.9, bits=2, max_bucket=30
    ).collect()
    assert len(ep) == 30 * 29 // 2


def test_ann_multiprobe_recall_at_10_floor_080(spark):
    """Quantified ANN recall gate (VERDICT r02 next #6): mean recall@10 of
    ann_multiprobe_topk vs the exact cosine_topk baseline over 20 seeded
    query vectors is >= 0.80 at bits=4, n_flip=2 (measured 0.845 on the
    deterministic sf0.001 embeddings — uniform synthetic vectors are LSH's
    worst case; clustered real embeddings do better per probe)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = {
        r["vec_id"]: list(r["embedding"]) for r in emb.filter("vec_id < 20").collect()
    }
    idx = SIM.ann_index(emb, "embedding", bits=4).cache()
    idx.count()
    recalls = []
    for q in queries.values():
        exact = {r["vec_id"] for r in SIM.cosine_topk(emb, "embedding", q, k=10).collect()}
        approx = {
            r["vec_id"]
            for r in SIM.ann_multiprobe_topk(
                idx, "embedding", q, k=10, bits=4, n_flip=2
            ).collect()
        }
        recalls.append(len(exact & approx) / 10)
    mean = sum(recalls) / len(recalls)
    idx.unpersist()
    assert len(recalls) == 20
    assert mean >= 0.80, f"mean recall@10 {mean:.3f} < 0.80"


def test_ann_multiprobe_finds_planted_near_duplicates(spark):
    """The retrieval property a dedup pipeline needs: a query that is a
    tiny perturbation of a stored vector returns that vector at rank 1
    through the multi-probe index (10/10 at bits=8, n_flip=2)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    rows = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in emb.filter("vec_id < 10").collect()
    }
    rng = np.random.default_rng(7)
    idx = SIM.ann_index(emb, "embedding", bits=8).cache()
    idx.count()
    for vid, v in rows.items():
        q = list(v + 0.02 * rng.standard_normal(len(v)) * np.linalg.norm(v) / np.sqrt(len(v)))
        top = SIM.ann_multiprobe_topk(idx, "embedding", q, k=1, bits=8, n_flip=2).collect()
        assert top and top[0]["vec_id"] == vid
    idx.unpersist()
