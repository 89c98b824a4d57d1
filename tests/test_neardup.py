"""Near-dup pipeline tests: LSH candidate recall vs the exact all-pairs truth
(VERDICT round-1 item 4) and soundness of the composed verify stage."""

import os

from real_time_anomaly_detection_spark.queries import (
    q26_ngram_jaccard,
    q29_minhash_lsh,
    q34_neardup_lsh_verified,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _pairs(pdf):
    return set(zip(pdf.doc_a, pdf.doc_b))


def test_lsh_recall_against_exact_truth(spark):
    """q34 (LSH candidates -> exact verify) must recover >= 90% of the true
    Jaccard>=0.5 pairs that the all-pairs oracle twin (q26) finds. With 4
    bands of 2 hashes, a pair at similarity s is a candidate with prob
    1-(1-s^2)^4 (0.68 at s=0.5, 0.9987 at s=0.9); this corpus's near-dups sit
    high enough that measured recall is ~0.93 — deterministic (fixed hash
    constants), so the bound is stable, not flaky."""
    truth = _pairs(q26_ngram_jaccard(spark, SF_DIR).toPandas())
    got = _pairs(q34_neardup_lsh_verified(spark, SF_DIR).toPandas())
    assert len(truth) > 0
    recall = len(got & truth) / len(truth)
    assert recall >= 0.90, f"recall {recall:.3f}"


def test_verified_pairs_are_sound(spark):
    """Every composed-pipeline pair is a true Jaccard>=0.5 pair (verification
    makes the pipeline sound; LSH only costs recall, never precision)."""
    truth = _pairs(q26_ngram_jaccard(spark, SF_DIR).toPandas())
    got = _pairs(q34_neardup_lsh_verified(spark, SF_DIR).toPandas())
    assert got <= truth


def test_verified_is_subset_of_candidates(spark):
    cands = _pairs(q29_minhash_lsh(spark, SF_DIR).toPandas())
    got = _pairs(q34_neardup_lsh_verified(spark, SF_DIR).toPandas())
    assert got <= cands


def test_embedding_lsh_recall_and_soundness(spark):
    """VERDICT r2 #1: q42 (banded cosine-LSH -> exact verify) vs the q39
    all-pairs truth. 6 bands x 2 planes: a pair at cosine s is a candidate
    with prob 1-(1-p^2)^6, p = 1-acos(s)/pi (~0.96 at the 0.45 threshold).
    Deterministic planes + data -> measured recall 6/7 at sf0.001 (the one
    miss sits at cosine 0.4501, the worst case for sign-LSH); precision is
    exact by construction (every emitted pair is verified). Pins the
    ORACLE-registry 6x2 geometry explicitly (r5: the bare default derives
    threshold-matched banding instead)."""
    from real_time_anomaly_detection_spark.queries import (
        q39_embedding_neardup,
        q42_embedding_neardup_lsh,
    )

    truth = set(zip(*(lambda p: (p.vec_a, p.vec_b))(
        q39_embedding_neardup(spark, SF_DIR).toPandas())))
    got = set(zip(*(lambda p: (p.vec_a, p.vec_b))(
        q42_embedding_neardup_lsh(
            spark, SF_DIR, n_bands=6, planes_per_band=2
        ).toPandas())))
    assert len(truth) > 0
    assert got <= truth  # sound: verify stage makes precision exact
    recall = len(got & truth) / len(truth)
    assert recall >= 0.85, f"recall {recall:.3f}"


def test_ann_multiprobe_recall_pinned(spark):
    """VERDICT r2 #4: q37's top-5 hits vs q27 brute-force ground truth.
    4 planes + Hamming-1 multi-probe on this near-random corpus: measured
    0.46 at sf0.001 (deterministic). The floor documents the operating point;
    the recall/planes tradeoff is in q37's docstring."""
    from real_time_anomaly_detection_spark.queries import (
        q27_embedding_topk,
        q37_ann_lsh_topk,
    )

    truth, got = {}, {}
    for r in q27_embedding_topk(spark, SF_DIR).collect():
        truth.setdefault(r.probe_id, set()).add(r.cand_id)
    for r in q37_ann_lsh_topk(spark, SF_DIR).collect():
        got.setdefault(r.probe_id, set()).add(r.cand_id)
    hits = sum(len(got.get(p, set()) & c) for p, c in truth.items())
    total = sum(len(c) for c in truth.values())
    assert total == 50  # 10 probes x top-5
    recall = hits / total
    assert recall >= 0.40, f"recall {recall:.3f}"


def test_bucket_size_cap_drops_mega_bucket_only(spark, tmp_path):
    """VERDICT r2 #3: the LSH straggler knob. Corpus: 40 IDENTICAL docs (one
    mega-bucket in every band) + 3 disjoint near-dup pairs. With the cap set
    between 2 and 40: (a) the mega-bucket's O(m^2) pairs vanish from the
    candidate set, (b) recall of true pairs OUTSIDE the mega-bucket is
    unchanged, (c) the candidate join shrinks."""
    import pandas as pd

    from real_time_anomaly_detection_spark.queries import q29_minhash_lsh

    mega = [{"doc_id": i, "text": "alpha beta gamma delta epsilon zeta"}
            for i in range(40)]
    # three near-identical pairs with disjoint, distinctive vocabularies
    pairs = []
    for j, words in enumerate(["red orange yellow chartreuse", "lion tiger leopard jaguar",
                               "oak elm birch maple"]):
        pairs += [{"doc_id": 100 + 2 * j, "text": words + " one"},
                  {"doc_id": 101 + 2 * j, "text": words + " two"}]
    path = str(tmp_path / "docs")
    spark.createDataFrame(pd.DataFrame(mega + pairs)).write.parquet(
        os.path.join(path, "documents.parquet")
    )

    uncapped = q29_minhash_lsh(spark, path).toPandas()
    capped = q29_minhash_lsh(spark, path, max_bucket_size=10).toPandas()
    un, cp = set(zip(uncapped.doc_a, uncapped.doc_b)), set(zip(capped.doc_a, capped.doc_b))
    mega_pairs = {(a, b) for a in range(40) for b in range(40) if a < b}
    assert mega_pairs <= un            # uncapped: the straggler bucket emits all
    assert not (cp & mega_pairs)       # capped: mega-bucket gone
    outside = un - mega_pairs
    assert outside and outside <= cp   # true pairs outside the cap unchanged
    assert len(cp) < len(un) / 10      # the join actually shrank


def test_salted_lsh_candidates_equal_unsalted(spark):
    """The salt knob is EXACT: identical candidate set, only the task-level
    work distribution changes (vs max_bucket_size, which is lossy). Both
    sides pin the oracle 4x2 geometry (the helper builds bands with the
    explicit default; the bare q29 call would derive 8x3 from threshold)."""
    base = q29_minhash_lsh(spark, SF_DIR, n_bands=4, rows_per_band=2).toPandas()
    salted = q29_minhash_lsh_salted(spark, SF_DIR)
    assert _pairs(base) == _pairs(salted.toPandas())


def q29_minhash_lsh_salted(spark, sf_dir):
    from real_time_anomaly_detection_spark.queries import (
        _hashed_tokens, _lsh_candidate_pairs, _minhash_bands_spark, load)
    from pyspark.sql import functions as F

    d = load(spark, sf_dir, "documents")
    htoks = _hashed_tokens(F.col("text"))
    x = d.select("doc_id", F.explode(_minhash_bands_spark(htoks)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return _lsh_candidate_pairs(x, salt=8)


def test_winnowing_finds_contained_span(spark, tmp_path):
    """The winnowing guarantee: two docs sharing a substring of >= k+w-1
    chars share at least one fingerprint — and a long shared span shares many,
    even when the surrounding text (and the bag-of-words profile) is entirely
    different. This is the case whole-doc hashing (q25) and simhash (q40)
    both miss."""
    import pandas as pd

    from real_time_anomaly_detection_spark.queries import q43_winnowing_neardup

    span = ("the shared boilerplate license paragraph that both documents "
            "embed verbatim somewhere inside otherwise unrelated content "
            "providing plenty of rolling windows")
    docs = [
        {"doc_id": 1, "text": "alpha bravo charlie delta " * 8 + span +
                              " echo foxtrot golf hotel " * 8},
        {"doc_id": 2, "text": "one two three four five six " * 9 + span +
                              " seven eight nine ten " * 9},
        {"doc_id": 3, "text": "completely unrelated filler words " * 20},
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(pd.DataFrame(docs)).write.parquet(
        os.path.join(path, "documents.parquet"))
    got = q43_winnowing_neardup(spark, path).toPandas()
    found = set(zip(got.doc_a, got.doc_b))
    assert (1, 2) in found
    assert not any(3 in p for p in found)


def test_ivf_recall_pinned(spark):
    """q44 (IVF, 16 fixed cells, nprobe=2) vs q27 brute-force truth: measured
    0.94 at sf0.001 / 0.92 at sf0.01 while scoring only ~2/16 of the corpus
    per probe — the data-partitioned cells adapt to the corpus where q37's
    fixed hyperplanes (0.46) do not. Deterministic; floor documents the
    operating point."""
    from real_time_anomaly_detection_spark.queries import (
        q27_embedding_topk,
        q44_ann_ivf_topk,
    )

    truth, got = {}, {}
    for r in q27_embedding_topk(spark, SF_DIR).collect():
        truth.setdefault(r.probe_id, set()).add(r.cand_id)
    for r in q44_ann_ivf_topk(spark, SF_DIR).collect():
        got.setdefault(r.probe_id, set()).add(r.cand_id)
    hits = sum(len(got.get(p, set()) & c) for p, c in truth.items())
    recall = hits / sum(len(c) for c in truth.values())
    assert recall >= 0.85, f"recall {recall:.3f}"


def test_embedding_bucket_cap_drops_mega_bucket_only(spark, tmp_path):
    """VERDICT r3 #2: the cap/salt knobs threaded through q42 (the embedding
    pipeline's analog of test_bucket_size_cap_drops_mega_bucket_only). Corpus:
    40 IDENTICAL vectors (one mega-bucket in every band — e.g. a batch of
    all-black spectrogram embeddings) + 3 near-dup pairs along distinct
    directions. Cap between 2 and 40: mega-bucket pairs vanish, pairs outside
    it are unchanged, the join shrinks."""
    import numpy as np
    import pandas as pd

    from real_time_anomaly_detection_spark.queries import q42_embedding_neardup_lsh

    rng = np.random.default_rng(11)
    dim = 64  # must match the LSH planes' dimensionality
    same = [float(x) for x in rng.normal(size=dim)]
    rows = [{"vec_id": i, "embedding": same} for i in range(40)]
    for j in range(3):
        base = rng.normal(size=dim)
        for k in (0, 1):
            v = base + 0.05 * rng.normal(size=dim)
            rows.append({"vec_id": 100 + 2 * j + k,
                         "embedding": [float(x) for x in v]})
    path = str(tmp_path / "emb")
    spark.createDataFrame(pd.DataFrame(rows), "vec_id long, embedding array<float>") \
        .write.parquet(os.path.join(path, "embeddings.parquet"))

    def pairs(pdf):
        return set(zip(pdf.vec_a, pdf.vec_b))

    un = pairs(q42_embedding_neardup_lsh(spark, path).toPandas())
    cp = pairs(q42_embedding_neardup_lsh(spark, path, max_bucket_size=10).toPandas())
    mega = {(a, b) for a in range(40) for b in range(40) if a < b}
    assert mega <= un                 # uncapped: the straggler bucket emits all
    assert not (cp & mega)            # capped: mega-bucket gone
    outside = un - mega
    assert outside and outside <= cp  # true pairs outside the cap unchanged
    assert len(cp) < len(un) / 10


def test_embedding_salted_equals_unsalted(spark):
    """q42's salt knob is EXACT: identical verified pair set at sf0.001."""
    from real_time_anomaly_detection_spark.queries import q42_embedding_neardup_lsh

    base = q42_embedding_neardup_lsh(spark, SF_DIR).toPandas()
    salted = q42_embedding_neardup_lsh(spark, SF_DIR, salt=4).toPandas()
    assert set(zip(base.vec_a, base.vec_b)) == set(zip(salted.vec_a, salted.vec_b))


def test_winnowing_scan_local_equals_window_formulation(spark, tmp_path):
    """VERDICT r3 #4 (long-doc handling): q43 selects fingerprints entirely
    scan-locally (one projection per doc: md5 transform -> shifted-slice
    zip_with mins -> array_distinct), so a 0.5 MB doc is linear per-doc work
    with NO gram-row shuffle. Pinned here on a corpus with one huge doc:
    (a) the result (pairs AND n_shared counts) is IDENTICAL to an
    independent explode + window-min reference formulation; (b) the pair
    containing the big doc is found; (c) the executed plan contains no
    Window operator — the reference's sort-per-doc is exactly what the
    formulation avoids."""
    import pandas as pd
    from pyspark.sql import Window, functions as F

    import real_time_anomaly_detection_spark.queries as Q

    big = " ".join(f"w{i % 997} t{i % 463} q{i % 211}" for i in range(40000))
    docs = [(1, big),
            (2, big[: len(big) // 2] + " entirely different tail text here"),
            (3, "unrelated small document with its own words only")]
    path = str(tmp_path / "docs")
    spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"])) \
        .write.parquet(os.path.join(path, "documents.parquet"))

    plan = Q.q43_winnowing_neardup(spark, path)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan  # fingerprint selection never sorts gram rows

    def res(pdf):
        return {(a, b): n for a, b, n in zip(pdf.doc_a, pdf.doc_b, pdf.n_shared)}

    got = res(Q.q43_winnowing_neardup(spark, path).toPandas())

    # independent reference: the r3 explode + window-min formulation
    d = spark.read.parquet(os.path.join(path, "documents.parquet"))
    txt = F.encode(F.lower(F.col("text")), "utf-8")
    n = F.greatest(F.length(txt) - F.lit(Q._WN_K - 1), F.lit(1))
    g = d.select("doc_id", txt.alias("_t"), n.alias("n")).select(
        "doc_id", "n",
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i"), F.col("_t"),
    ).select(
        "doc_id", "n", "i",
        F.conv(F.substring(F.md5(F.col("_t").substr(F.col("i"), F.lit(Q._WN_K))),
                           1, 15), 16, 10).cast("long").alias("h"),
    )
    wmin = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, Q._WN_W - 1)
    x = (
        g.withColumn("fp", F.min("h").over(wmin))
        .filter(F.col("i") <= F.greatest(F.col("n") - F.lit(Q._WN_W - 1), F.lit(1)))
        .select("doc_id", "fp").distinct().persist()
    )
    rare = (x.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= Q._WN_MAX_DF).drop("_df"))
    x = x.join(F.broadcast(rare), "fp", "left_semi")
    ref = res(
        x.alias("a").join(x.alias("b"), "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= Q._WN_MIN_SHARED)
        .toPandas()
    )
    assert got == ref
    assert (1, 2) in got  # the big doc's near-dup (its own prefix) found


def test_ivf_trained_centroids_beat_fixed_on_held_out_probes():
    """VERDICT r3 #5: q46's trained quantizer vs q44's fixed first-16 one,
    compared at EQUAL nprobe on held-out probes (vec_id 100-199) against
    brute-force cosine truth. Held-out matters: q44/q27's probe set
    (vec_id < 10) IS q44's centroid set, so each of those probes sits at the
    center of its own cell and fixed recall is an artifact (0.92+ there vs
    0.28 held-out). The recall is computed on the EXACT unit-centroid
    float64 literals both Spark plans embed (same normalization, same argmax
    tie-break), so this measures the shipped quantizers, not a re-derivation.
    Deterministic corpus + seeded deterministic training => stable pins:
    trained 0.382 vs fixed 0.280 at sf0.001 (0.41/0.284 at sf0.01,
    0.366/0.322 at sf0.1)."""
    import numpy as np
    import pyarrow.parquet as pq

    from real_time_anomaly_detection_spark.queries import _ivf_trained_centroids

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = np.asarray(t.column("vec_id").to_pylist())
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    x = x[np.argsort(vid, kind="stable")]

    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    xn = unit(x)
    full = xn @ xn.T
    # explicit n_cells=16: apples-to-apples vs q44's fixed 16-cell
    # quantizer (the default now derives ~sqrt(n) cells — r5)
    trained = np.array(_ivf_trained_centroids(SF_DIR, n_cells=16))
    fixed = unit(x[:16])  # q44's quantizer, q44's normalization

    def recall(cents, probes, nprobe=2, k=5):
        sims = xn @ cents.T
        order = np.argsort(-sims, axis=1)
        assign, probe_cells = order[:, 0], order[:, :nprobe]
        rec = tot = 0
        for p in probes:
            s = full[p].copy()
            s[p] = -9.0
            truth = set(np.argsort(-s)[:k])
            cand = np.where(np.isin(assign, probe_cells[p]))[0]
            cand = cand[cand != p]
            got = set(cand[np.argsort(-full[p][cand])[:k]])
            rec += len(truth & got)
            tot += k
        return rec / tot

    held_out = range(100, 200)
    r_fixed = recall(fixed, held_out)
    r_trained = recall(trained, held_out)
    assert r_trained > r_fixed, f"trained {r_trained:.3f} <= fixed {r_fixed:.3f}"
    assert r_trained >= 0.35, f"trained recall {r_trained:.3f}"


def test_threshold_matched_banding_beats_dense_default(spark, tmp_path):
    """Round 4: q42's default 6x2-plane banding collides for a RANDOM pair
    with prob 1-(1-0.25)^6 = 0.82 — candidate volume approaches all-pairs as
    the corpus grows (measured 165M of 200M at sf1). At a production
    near-dup threshold the banding must be matched to the similarity regime:
    on a clustered corpus with planted cosine~0.997 duplicates, 6x12-plane
    bands at threshold 0.9 must (a) recover EVERY planted pair, (b) emit
    nothing else, and (c) generate at least 50x fewer candidates than the
    dense default."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from real_time_anomaly_detection_spark.queries import (
        _lsh_candidate_pairs,
        _nd_bands_expr,
        q42_embedding_neardup_lsh,
    )

    rng = np.random.RandomState(7)
    n, dim = 1000, 64
    x = rng.normal(size=(n, dim))
    x += (rng.normal(size=(10, dim)) * 0.5)[np.arange(n) % 10]  # label clusters
    for p in range(20):
        x[2 * p + 1] = x[2 * p] + rng.normal(size=dim) * 0.01  # planted dups
    rows = [{"vec_id": i, "embedding": [float(v) for v in x[i]]} for i in range(n)]
    path = str(tmp_path / "emb")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(
        os.path.join(path, "embeddings.parquet"))

    got = q42_embedding_neardup_lsh(
        spark, path, n_bands=6, planes_per_band=12, threshold=0.9
    ).toPandas()
    pairs = {tuple(sorted(p)) for p in zip(got.vec_a, got.vec_b)}
    planted = {(2 * p, 2 * p + 1) for p in range(20)}
    assert pairs == planted  # all planted found, nothing spurious

    def n_cands(n_bands, ppb):
        e = spark.read.parquet(os.path.join(path, "embeddings.parquet")).select(
            "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("emb"))
        b = e.select(F.col("vec_id").alias("doc_id"),
                     F.explode(_nd_bands_expr("emb", n_bands, ppb)).alias("bb")
                     ).select("doc_id", F.col("bb.band").alias("band"),
                              F.col("bb.bucket").alias("bucket"))
        return _lsh_candidate_pairs(b).count()

    dense, wide = n_cands(6, 2), n_cands(6, 12)
    assert wide * 50 <= dense, f"wide {wide} vs dense {dense}"


def test_winnowing_degenerate_docs(spark, tmp_path):
    """Null, empty, and shorter-than-k documents must not crash the
    fingerprint UDF and must not affect pairs among normal docs — matching
    the DuckDB oracle on the same corpus (null text yields a null
    fingerprint there, dropped by the fp equi-join)."""
    import duckdb
    import pandas as pd

    from real_time_anomaly_detection_spark.queries import (
        _Q43_SQL,
        q43_winnowing_neardup,
    )

    shared = ("a long enough shared sentence that winnowing certainly "
              "fingerprints in both documents end to end")
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [shared + " tail one", shared + " tail two",
                 None, "", "short"],
    })
    path = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        os.path.join(path, "documents.parquet"))

    got = q43_winnowing_neardup(spark, path).toPandas()
    got_set = {(a, b, n) for a, b, n in zip(got.doc_a, got.doc_b, got.n_shared)}

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('%s')"
                % os.path.join(path, "documents.parquet", "*.parquet"))
    want = con.execute(_Q43_SQL).df()
    want_set = {(a, b, n) for a, b, n in zip(want.doc_a, want.doc_b, want.n_shared)}
    assert got_set == want_set
    assert any(a == 1 and b == 2 for a, b, _ in got_set)
    assert not any(3 in (a, b) or 4 in (a, b) or 5 in (a, b) for a, b, _ in got_set)


def test_winnowing_non_ascii_matches_oracle(spark, tmp_path):
    """ADVICE r4: grams are CHARACTER k-grams (hashed via utf-8 encoding),
    so multi-byte text must produce the same fingerprints — and pairs — as
    the SQL oracle's substr-based formulation, not silently diverge on byte
    offsets. The shared span here is full of 2-byte code points."""
    import duckdb
    import pandas as pd

    from real_time_anomaly_detection_spark.queries import (
        _Q43_SQL,
        q43_winnowing_neardup,
    )

    shared = ("célèbre déjà-vu naïve façade über straße çocuk "
              "schön très bientôt mañana señor æther øre")
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [shared + " queue fin", shared + " queue deux",
                 "plain ascii filler text completely different here"],
    })
    path = str(tmp_path / "docs_nonascii")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        os.path.join(path, "documents.parquet"))

    got = q43_winnowing_neardup(spark, path).toPandas()
    got_set = {(a, b, n) for a, b, n in zip(got.doc_a, got.doc_b, got.n_shared)}

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('%s')"
                % os.path.join(path, "documents.parquet", "*.parquet"))
    want = con.execute(_Q43_SQL).df()
    want_set = {(a, b, n) for a, b, n in zip(want.doc_a, want.doc_b, want.n_shared)}
    assert got_set == want_set
    assert any(a == 1 and b == 2 for a, b, _ in got_set)


def test_ivf_trained_centroids_deterministic():
    """q46's oracle integrity depends on the training being bit-identical
    between the Spark-literal build and the oracle-SQL build (both call
    _ivf_trained_centroids; lru-style caching hides nondeterminism within a
    process). Clear the cache and retrain: identical floats, unit rows."""
    import math

    import real_time_anomaly_detection_spark.queries as Q

    a = Q._ivf_trained_centroids(SF_DIR)
    Q._IVF_CENT_CACHE.clear()
    b = Q._ivf_trained_centroids(SF_DIR)
    assert a == b
    import pyarrow.parquet as _pq

    n_corpus = _pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=[]
    ).num_rows
    assert len(a) == Q._ivf_cells_for(n_corpus)
    for row in a:
        assert math.isclose(sum(v * v for v in row), 1.0, rel_tol=1e-9)


def test_text_threshold_matched_banding(spark, tmp_path):
    """Round 4 (text twin of the embedding banding test): on a corpus where
    every doc shares a boilerplate block (base Jaccard ~0.33 -> the default
    4x2 banding makes ~37% of RANDOM pairs candidates), wide 4x4 bands at a
    production threshold 0.9 must (a) recover every planted J~0.95 pair,
    (b) emit nothing else, and (c) cut the candidate volume >= 5x. The 4x2
    default remains the value-oracled configuration."""
    import pandas as pd

    from real_time_anomaly_detection_spark.queries import (
        q29_minhash_lsh,
        q34_neardup_lsh_verified,
    )

    boiler = [f"boiler{j}" for j in range(60)]
    rows = []
    for d in range(200):
        own = [f"d{d}w{j}" for j in range(60)]
        rows.append({"doc_id": d, "text": " ".join(boiler + own)})
    for p in range(10):  # planted near-dup: docs 2p/2p+1 differ in 3 tokens
        base = rows[2 * p]["text"].split()
        twin = base[:-3] + [f"p{p}x{j}" for j in range(3)]
        rows[2 * p + 1]["text"] = " ".join(twin)
    path = str(tmp_path / "docs")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(
        os.path.join(path, "documents.parquet"))

    got = q34_neardup_lsh_verified(
        spark, path, n_bands=4, rows_per_band=4, threshold=0.9
    ).toPandas()
    pairs = {tuple(sorted(p)) for p in zip(got.doc_a, got.doc_b)}
    assert pairs == {(2 * p, 2 * p + 1) for p in range(10)}

    dense = q29_minhash_lsh(spark, path).count()
    wide = q29_minhash_lsh(spark, path, n_bands=4, rows_per_band=4).count()
    assert wide * 5 <= dense, f"wide {wide} vs dense {dense}"


def test_banding_for_midpoint_matches_threshold():
    """The derived (n_bands, rows) geometry must put the banded S-curve
    midpoint (1/b)^(1/r) — in per-row collision-prob space — near the
    requested threshold, for both the Jaccard identity map and the cosine
    hyperplane map, across the production threshold range."""
    import math

    from real_time_anomaly_detection_spark.queries import (
        _banding_for,
        _cosine_row_prob,
        _resolve_banding,
    )

    for t in (0.5, 0.6, 0.7, 0.8, 0.9, 0.95):
        for prob in (None, _cosine_row_prob):
            tp = prob(t) if prob else t
            b, r = _banding_for(t, prob)
            mid = (1.0 / b) ** (1.0 / r)
            # within one band/row step of the ideal curve
            assert abs(mid - tp) < 0.08, (t, prob, b, r, mid)
            assert 1 <= b <= 8 and 1 <= r <= 32

    # oracle-era sanity: the identity-map derivation at the 0.5 regime stays
    # in the same cost class as the hand-picked 4x2 (not a 100-perm blowup)
    b, r = _banding_for(0.5)
    assert b * r <= 32

    # half-specified geometry is rejected, full passthrough respected
    assert _resolve_banding(6, 12, 0.9) == (6, 12)
    import pytest

    with pytest.raises(ValueError, match="BOTH banding knobs"):
        _resolve_banding(6, None, 0.9)


def test_default_banding_is_scale_safe_at_production_threshold(spark, tmp_path):
    """VERDICT r4 #1 done-criterion: calling the LSH queries with ONLY a
    production threshold (0.9) — no banding knobs — must yield exact recall
    on planted near-dup corpora with bounded candidate volume, for BOTH
    modalities. This pins the derived-geometry DEFAULT, not a hand-tuned
    config."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from real_time_anomaly_detection_spark.queries import (
        _banding_for,
        _cosine_row_prob,
        _hashed_tokens,
        _lsh_candidate_pairs,
        _minhash_bands_spark,
        q34_neardup_lsh_verified,
        q42_embedding_neardup_lsh,
    )

    # --- text: 400 disjoint-vocab docs + 20 planted twins (1 of 150 tokens
    # changed => jaccard 149/151 ~ 0.987)
    rng = np.random.RandomState(11)
    docs = []
    for i in range(400):
        toks = [f"d{i}w{j}" for j in range(150)]
        docs.append((2 * i, " ".join(toks)))
        if i < 20:
            twin = list(toks)
            twin[75] = f"d{i}CHANGED"
            docs.append((2 * i + 1, " ".join(twin)))
    tpath = str(tmp_path / "docs")
    spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]),
                          "doc_id long, text string").write.parquet(
        os.path.join(tpath, "documents.parquet"))

    got = q34_neardup_lsh_verified(spark, tpath, threshold=0.9).toPandas()
    pairs = {tuple(sorted(p)) for p in zip(got.doc_a, got.doc_b)}
    planted = {(2 * i, 2 * i + 1) for i in range(20)}
    assert pairs == planted

    # candidate volume at the derived geometry stays within a small multiple
    # of the planted-pair count (not all-pairs)
    nb, rpb = _banding_for(0.9)
    d = spark.read.parquet(os.path.join(tpath, "documents.parquet"))
    x = d.select(
        "doc_id",
        F.explode(
            _minhash_bands_spark(_hashed_tokens(F.col("text")), nb, rpb)
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    n_cand = _lsh_candidate_pairs(x).count()
    assert n_cand <= 10 * len(planted), n_cand

    # --- embedding: clustered corpus + 20 planted cosine~0.997 twins
    n, dim = 1000, 64
    x = rng.normal(size=(n, dim))
    x += (rng.normal(size=(10, dim)) * 0.5)[np.arange(n) % 10]
    for p in range(20):
        x[2 * p + 1] = x[2 * p] + rng.normal(size=dim) * 0.01
    rows = [{"vec_id": i, "embedding": [float(v) for v in x[i]]} for i in range(n)]
    epath = str(tmp_path / "emb")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(
        os.path.join(epath, "embeddings.parquet"))

    gote = q42_embedding_neardup_lsh(spark, epath, threshold=0.9).toPandas()
    epairs = {tuple(sorted(p)) for p in zip(gote.vec_a, gote.vec_b)}
    eplanted = {(2 * p, 2 * p + 1) for p in range(20)}
    assert epairs == eplanted

    # the derived geometry for cosine-0.9 is in the validated band/row range
    assert _banding_for(0.9, _cosine_row_prob) == (7, 13)


def test_size_prefilter_keeps_pair_set_exact(spark, tmp_path):
    """VERDICT r4 #2: the size-ratio prefilter (J <= min/max sizes) must be
    invisible in the result — identical pair set as the oracle on a corpus
    engineered so many LSH candidates are size-INCOMPATIBLE (a shared
    boilerplate token block forces collisions between docs whose sizes
    differ by >2x, which the prefilter drops before the array join)."""
    import duckdb
    import pandas as pd

    from real_time_anomaly_detection_spark.queries import _Q34_SQL, QUERIES

    boiler = " ".join(f"common{j}" for j in range(30))
    rows = []
    for i in range(60):
        # sizes 31..90 tokens: every doc shares the 30-token boilerplate, so
        # minhash buckets collide across wildly different sizes
        extra = " ".join(f"d{i}x{j}" for j in range(1 + i))
        rows.append((i, boiler + " " + extra))
    # two genuine near-dup twins (ratio compatible)
    rows.append((100, boiler + " twin alpha beta"))
    rows.append((101, boiler + " twin alpha gamma"))
    path = str(tmp_path / "docs")
    spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]),
                          "doc_id long, text string").write.parquet(
        os.path.join(path, "documents.parquet"))

    got = QUERIES["q34_neardup_lsh_verified"](spark, path).toPandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('%s')"
                % os.path.join(path, "documents.parquet", "*.parquet"))
    want = con.execute(_Q34_SQL).df()
    gs = {(a, b, j) for a, b, j in zip(got.doc_a, got.doc_b, got.jaccard)}
    ws = {(a, b, j) for a, b, j in zip(want.doc_a, want.doc_b, want.jaccard)}
    assert gs == ws
    assert any(a == 100 and b == 101 for a, b, _ in gs)


def test_simhash_scan_local_equals_agg_formulation(spark, tmp_path):
    """VERDICT r4 #4: q40's fingerprint stage moved to a scan-local
    mapInPandas (per-doc numpy bit votes, md5 at C speed) — it must produce
    bit-identical fingerprints to the Catalyst explode + 60-vote-agg
    formulation on a corpus exercising empties, whitespace edges, repeated
    tokens, and null text."""
    import pandas as pd

    import real_time_anomaly_detection_spark.queries as Q

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["alpha beta gamma delta", "  leading and trailing  ",
                 "", "repeat repeat repeat unique", None,
                 "tab\tseparated\nnewline mixed   runs"],
    })
    path = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        os.path.join(path, "documents.parquet"))
    d = Q.load(spark, path, "documents")

    got = {r.doc_id: r.fp for r in Q._simhash60(d).collect()}
    want = {r.doc_id: r.fp for r in Q._simhash60_agg(d).collect()}
    assert got == want
    assert 5 not in got  # null text: no row, matching the agg path


def test_ivf_recall_above_080_at_nprobe4_on_clustered_corpus(tmp_path):
    """VERDICT r4 #8: with sqrt-n cells (derived default) and nprobe=4, the
    trained IVF quantizer must reach >= 0.8 held-out top-5 recall on a
    clustered corpus (the regime IVF exists for — cells adapt to clusters
    where fixed hyperplanes and undersized cell counts cannot). Pure-numpy
    simulation of the exact shipped quantizer + probe plan, like the
    trained-vs-fixed pin above."""
    import sys

    import numpy as np
    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import make_sf1

    from real_time_anomaly_detection_spark.queries import (
        _ivf_cells_for,
        _ivf_trained_centroids,
    )

    corpus = str(tmp_path / "emb")
    os.makedirs(corpus, exist_ok=True)
    make_sf1.make_embeddings(corpus, n_vecs=2000)

    t = pq.read_table(f"{corpus}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = np.asarray(t.column("vec_id").to_pylist())
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    x = x[np.argsort(vid, kind="stable")]

    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    xn = unit(x)
    full = xn @ xn.T
    cents = np.array(_ivf_trained_centroids(corpus))  # derived sqrt-n cells
    assert len(cents) == _ivf_cells_for(len(x)) == 45

    sims = xn @ cents.T
    order = np.argsort(-sims, axis=1)
    assign, probe_cells = order[:, 0], order[:, :4]  # nprobe=4
    rec = tot = 0
    for p in range(500, 600):  # held-out probes (not centroids, not planted)
        s = full[p].copy()
        s[p] = -9.0
        truth = set(np.argsort(-s)[:5])
        cand = np.where(np.isin(assign, probe_cells[p]))[0]
        cand = cand[cand != p]
        got = set(cand[np.argsort(-full[p][cand])[:5]])
        rec += len(truth & got)
        tot += 5
    recall = rec / tot
    assert recall >= 0.8, f"recall {recall:.3f}"


def test_banding_for_properties_hypothesis():
    """Property pins for the threshold->banding derivation across the whole
    usable threshold range, both similarity maps: the S-curve midpoint
    tracks the threshold within one geometric step, the geometry respects
    its clamps, and rows are monotone non-decreasing in the threshold
    (higher thresholds never get a LOOSER band)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from real_time_anomaly_detection_spark.queries import (
        _banding_for,
        _cosine_row_prob,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.floats(min_value=0.2, max_value=0.97),
           st.booleans())
    def check(t, cosine):
        prob = _cosine_row_prob if cosine else None
        b, r = _banding_for(t, prob)
        assert 1 <= b <= 8 and 1 <= r <= 32
        tp = min(max(prob(t) if prob else t, 0.05), 0.99)
        mid = (1.0 / b) ** (1.0 / r)
        # within one band step of the ideal curve: the coarsest move is
        # b -> b±1, which shifts the midpoint by ln(1±1/b)/r
        import math
        step = abs(math.log1p(1.0 / b)) / r
        slack = max(0.08, 2 * step)
        assert abs(mid - tp) <= slack, (t, cosine, b, r, mid, tp)

    check()

    # monotonicity: rows never decrease as the threshold rises
    from real_time_anomaly_detection_spark.queries import _banding_for as bf
    prev = 0
    for t in [x / 100 for x in range(20, 98)]:
        _, r = bf(t)
        assert r >= prev, (t, r, prev)
        prev = r


def test_neardup_clusters_transitive_and_keeper(spark, tmp_path):
    """q47's distinctive semantics vs the pair queries: TRANSITIVE grouping
    (a~b and b~c put a,c in one cluster even when a~c itself fails the
    threshold) and a deterministic canonical keeper (min doc_id). Chain
    corpus: doc0~doc1, doc1~doc2 by construction; doc0 vs doc2 differ in 2
    of 11 tokens (jaccard 9/13 = 0.692 >= 0.5 — still a pair here) plus a
    genuinely disjoint pair (10, 11) and a loner."""
    import duckdb
    import pandas as pd

    from real_time_anomaly_detection_spark.queries import _Q47_SQL, QUERIES

    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9".split()
    mk = lambda toks: " ".join(toks)  # noqa: E731
    docs = pd.DataFrame(
        [(0, mk(base + ["a0"])),
         (1, mk(base + ["a1"])),          # ~0 (10/12)
         (2, mk(base[1:] + ["a1", "a2"])),  # ~1; vs 0 shares 9 of 13
         (10, mk([f"x{j}" for j in range(10)] + ["b0"])),
         (11, mk([f"x{j}" for j in range(10)] + ["b1"])),
         (20, mk([f"z{j}" for j in range(12)]))],
        columns=["doc_id", "text"],
    )
    path = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        os.path.join(path, "documents.parquet"))

    got = QUERIES["q47_neardup_clusters"](spark, path).toPandas()
    gm = {int(r.doc_id): (int(r.cluster_id), bool(r.is_keeper))
          for r in got.itertuples()}
    assert gm[0] == (0, True) and gm[1] == (0, False) and gm[2] == (0, False)
    assert gm[10] == (10, True) and gm[11] == (10, False)
    assert 20 not in gm  # loner: not part of any near-dup pair

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('%s')"
                % os.path.join(path, "documents.parquet", "*.parquet"))
    want = con.execute(_Q47_SQL).df()
    wm = {int(r.doc_id): (int(r.cluster_id), bool(r.is_keeper))
          for r in want.itertuples()}
    assert gm == wm


def test_numpy_band_paths_null_embedding_parity(spark):
    """ADVICE r5: the wide-geometry numpy mapInPandas paths must keep the
    Catalyst null semantics — a null embedding row emits NO band rows /
    ranks NO cells, instead of np.stack raising in the executor and failing
    the whole batch (one null row in a streamed epoch previously killed the
    epoch)."""
    from real_time_anomaly_detection_spark.queries import (
        _ivf_topk_from_cents,
        _nd_bands_rows,
        _nd_planes,
    )

    rows = [(i, [float((i * 7 + j) % 5 - 2) for j in range(64)]) for i in range(6)]
    rows.append((99, None))
    e = spark.createDataFrame(rows, "vec_id long, emb array<double>")

    # wide cosine banding (> 12 planes forces the numpy path)
    bands = _nd_bands_rows(e, 7, 3, id_col="vec_id").toPandas()
    assert len(bands) == 6 * 7  # one row per (non-null doc, band)
    assert 99 not in set(bands["doc_id"])

    # >16-cell IVF ranking forces the numpy rank_batches path
    planes = _nd_planes(17)
    cents = [(c, tuple(planes[c])) for c in range(17)]
    topk = _ivf_topk_from_cents(e, cents, nprobe=2).toPandas()
    assert 99 not in set(topk["probe_id"]) and 99 not in set(topk["cand_id"])
    assert len(topk) > 0


def _q50_disagreement_corpus(spark, tmp_path) -> str:
    """Corpus engineered so the two modalities disagree in every possible
    way — text-only pairs, embedding-only pairs, agreeing pairs
    (both_keeper/both_drop), and a doc that TEXT drops but EMBEDDING keeps
    (keeper_conflict)."""
    import numpy as np

    rng = np.random.RandomState(11)
    base = {i: rng.normal(size=64) for i in range(9)}
    emb = dict(base)
    emb[3] = base[2]   # 2,3: embedding pair (texts unrelated)
    emb[6] = base[5]   # 5,6: embedding pair; 4,5 is a TEXT pair -> conflict at 5
    emb[8] = base[7]   # 7,8: embedding pair AND text pair -> agreement

    tw = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    tx = "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9"
    ty = "y0 y1 y2 y3 y4 y5 y6 y7 y8 y9"
    texts = {
        0: tw + " a0", 1: tw + " a1",            # text pair {0,1}
        2: "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9 u10",  # loners in text
        3: "v0 v1 v2 v3 v4 v5 v6 v7 v8 v9 v10",
        4: tx + " b0", 5: tx + " b1",            # text pair {4,5}
        6: "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9 z10",
        7: ty + " c0", 8: ty + " c1",            # text pair {7,8}
    }
    path = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, texts[i]) for i in range(9)], "doc_id long, text string"
    ).write.parquet(os.path.join(path, "documents.parquet"))
    spark.createDataFrame(
        [(i, [float(v) for v in emb[i]]) for i in range(9)],
        "vec_id long, embedding array<float>",
    ).write.parquet(os.path.join(path, "embeddings.parquet"))
    return path


def test_q50_reconciliation_golden_planted_disagreement(spark, tmp_path):
    """VERDICT r5 #7 golden over the planted-disagreement corpus."""
    from real_time_anomaly_detection_spark.queries import QUERIES

    path = _q50_disagreement_corpus(spark, tmp_path)
    got = {
        int(r.doc_id): (r.status, int(r.text_cluster), bool(r.text_keeper),
                        int(r.emb_cluster), bool(r.emb_keeper))
        for r in QUERIES["q50_modality_reconciliation"](spark, path).collect()
    }
    assert got == {
        0: ("text_only", 0, True, -1, False),
        1: ("text_only", 0, False, -1, False),
        2: ("emb_only", -1, False, 2, True),
        3: ("emb_only", -1, False, 2, False),
        4: ("text_only", 4, True, -1, False),
        5: ("keeper_conflict", 4, False, 5, True),
        6: ("emb_only", -1, False, 5, False),
        7: ("both_keeper", 7, True, 7, True),
        8: ("both_drop", 7, False, 7, False),
    }


def test_q50_precomputed_clusters_parity(spark, tmp_path):
    """q50's materialized-input path (how the bench and a production
    pipeline run reconciliation — cluster-update checkpoints per-modality
    labels, the report joins the label tables) must emit exactly the rows
    the recompute path does."""
    from real_time_anomaly_detection_spark.queries import (
        q47_neardup_clusters,
        q49_embedding_clusters,
        q50_modality_reconciliation,
    )

    path = _q50_disagreement_corpus(spark, tmp_path)
    tp = str(tmp_path / "text_clusters")
    ep = str(tmp_path / "emb_clusters")
    q47_neardup_clusters(spark, path).write.parquet(tp)
    q49_embedding_clusters(spark, path).write.parquet(ep)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    recomputed = rows(q50_modality_reconciliation(spark, path))
    precomputed = rows(q50_modality_reconciliation(
        spark, path,
        text_clusters=spark.read.parquet(tp),
        emb_clusters=spark.read.parquet(ep),
    ))
    assert precomputed == recomputed and len(precomputed) == 9
