"""End-to-end Spark pipeline tests: golden byte-equality THROUGH the
mapInArrow kernel, ordering, checkpoint/resume idempotence, ops sanity.
"""

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _fixture_rows(refbuild, golden_cases, limit=40):
    """Golden fragment cases (div context) as transcript rows."""
    rows = []
    for i, case in enumerate(c for c in golden_cases
                             if c["mode"] == "fragment"
                             and c["context"] == "div"):
        with open(os.path.join(refbuild, case["file"]), "rb") as f:
            raw = f.read()
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            continue
        rows.append((case["case"], text, case["dump"], case["error_count"]))
        if len(rows) >= limit:
            break
    return rows


def test_pipeline_matches_goldens(spark, refbuild, golden_cases):
    """Run golden fixture HTML through the REAL Spark job (mapInArrow
    kernel incl. dump column) and assert byte equality with the C
    reference dumps — the north-rule per-turn equality check."""
    import datetime

    from html_parser_spark.spark.udfs import make_dump_map_in_arrow

    rows = _fixture_rows(refbuild, golden_cases)
    assert len(rows) >= 30
    data = [
        ("conv0", i, "user", text, None,
         datetime.datetime(2020, 1, 1))
        for i, (name, text, dump, errc) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    ).repartition(4)
    fn = make_dump_map_in_arrow(["conv_id", "turn_idx"], "fragment", "div")
    out_schema = ("conv_id string, turn_idx int, dump string, "
                  "serialized_html string, extracted_text string, "
                  "parse_errors int")
    got = {
        r.turn_idx: (r.dump, r.parse_errors)
        for r in df.select("conv_id", "turn_idx", "text")
        .mapInArrow(fn, out_schema).collect()
    }
    bad = []
    for i, (name, text, dump, errc) in enumerate(rows):
        gdump, gerr = got[i]
        if gdump != dump or gerr != errc:
            bad.append(name)
    assert not bad, f"spark-pipeline golden mismatches: {bad}"


def test_pipeline_error_texts_match_goldens(spark, refbuild, golden_cases):
    """Parse-error TEXTS through the real tiered extract_turns job must
    equal the reference binaries' stderr (goldens), per turn — mixing
    golden HTML (kernel tier) with plain turns (trivial JVM tier)."""
    import datetime

    from html_parser_spark.spark.pipeline import extract_turns

    rows = _fixture_rows(refbuild, golden_cases)
    texts_by_case = {
        c["case"]: c["errors"] for c in golden_cases
        if c["mode"] == "fragment" and c["context"] == "div"
    }
    data = [
        ("conv0", i, "user", text, None, datetime.datetime(2020, 1, 1))
        for i, (name, text, dump, errc) in enumerate(rows)
    ]
    # trivial-tier rows interleaved: expected texts are the full
    # parser's own output for each (the calibrated constants)
    from html_parser_spark.kernel.api import parse_fragment

    trivial = ["plain words", "", "   ", None]
    # NULL text is defined as the no-op turn (0 errors, no texts);
    # everything else must equal the full parser's own error list
    trivial_want = [
        parse_fragment(t, "div").errors if t is not None else []
        for t in trivial
    ]
    data += [
        ("conv1", j, "user", t, None, datetime.datetime(2020, 1, 1))
        for j, t in enumerate(trivial)
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    ).repartition(4)
    got = {
        (r.conv_id, r.turn_idx): list(r.parse_error_texts)
        for r in extract_turns(df, ordered=False, single_scan=False)
        .select("conv_id", "turn_idx", "parse_error_texts").collect()
    }
    bad = []
    for i, (name, text, dump, errc) in enumerate(rows):
        if got[("conv0", i)] != texts_by_case[name]:
            bad.append((name, texts_by_case[name], got[("conv0", i)]))
    for j, want in enumerate(trivial_want):
        if got[("conv1", j)] != want:
            bad.append(("trivial", j, want, got[("conv1", j)]))
    assert not bad, f"pipeline error-text mismatches: {bad[:3]}"


def test_extract_ordering_window(spark):
    from html_parser_spark.spark.pipeline import extract_turns
    from html_parser_spark.spark.transcripts import transcripts_df

    df = transcripts_df(spark, 300, seed=7, partitions=4)
    out = extract_turns(df)
    rows = out.select("conv_id", "turn_idx", "turn_rank").collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append((r.turn_idx, r.turn_rank))
    for conv, pairs in by_conv.items():
        pairs.sort()
        for rank0, (tidx, rank) in enumerate(pairs):
            assert rank == rank0 + 1, (conv, pairs)


def test_checkpoint_resume_idempotent(spark, tmp_path):
    from html_parser_spark.spark.checkpoint import (
        read_done_keys, run_with_checkpoint,
    )
    from html_parser_spark.spark.transcripts import transcripts_df

    df = transcripts_df(spark, 200, seed=9, partitions=4)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    path = run_with_checkpoint(spark, df, out_dir, ckpt, buckets=8)
    n1 = spark.read.parquet(path).count()
    done1 = read_done_keys(spark, ckpt).count()
    assert n1 == 200 and done1 >= 1
    # resume: everything already done -> nothing reprocessed, output stable
    run_with_checkpoint(spark, df, out_dir, ckpt, buckets=8)
    n2 = spark.read.parquet(path).count()
    assert n2 == 200


def test_exact_dedup_groups(spark):
    from html_parser_spark.spark.ops import exact_dedup

    df = spark.createDataFrame(
        [(1, "aa"), (2, "aa"), (3, "bb")], "doc_id long, text string"
    )
    rows = exact_dedup(df).collect()
    assert sorted((r.canonical_doc_id, r.n_copies) for r in rows) == [
        (1, 2), (3, 1)]


def test_minhash_finds_near_dupes(spark):
    from html_parser_spark.spark.ops import (
        minhash_lsh_candidates, ngram_jaccard_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, base), (2, base + " ok"),  # near-dup pair
        (3, "completely different words describing spark shuffle behavior"),
        (4, "another unrelated sentence about encoding state machines"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cand = minhash_lsh_candidates(df, num_hashes=16, bands=8)
    pairs = {(r.doc_a, r.doc_b) for r in cand.collect()}
    assert (1, 2) in pairs
    verified = ngram_jaccard_pairs(df, threshold=0.5, candidates=cand)
    vpairs = {(r.doc_a, r.doc_b) for r in verified.collect()}
    assert (1, 2) in vpairs and (3, 4) not in vpairs


def test_minhash_hot_bucket_cap_bounds_candidates(spark):
    """A post-exact-dedup boilerplate cluster (near-identical, not
    byte-equal docs) lands in one (band_id, band_hash) bucket; without
    a width cap the self-join emits width^2/2 pairs from it. The cap
    must (a) bound candidates to O(width) chain pairs, (b) keep the
    hot cluster CONNECTED so components still collapse it (nothing
    silently escapes dedup), (c) surface the chained bucket in the
    accounting frame, and (d) leave genuinely-near-dup pairs in
    narrow buckets untouched (recall unchanged)."""
    from html_parser_spark.spark.ops import (
        _components_union_find, minhash_lsh_candidates,
    )

    boiler = ("terms of service apply to all pages on this site "
              "contact us for details about privacy and cookies")
    hot = [(i, boiler + f" v{i}") for i in range(40)]
    base = "the quick brown fox jumps over the lazy dog again and again"
    planted = [(100, base), (101, base + " ok")]
    other = [(200, "completely different words describing spark shuffles"),
             (201, "another unrelated sentence about encoding machines")]
    df = spark.createDataFrame(hot + planted + other,
                               "doc_id long, text string")

    uncapped = minhash_lsh_candidates(df, num_hashes=16, bands=8,
                                      max_bucket=None)
    n_uncapped = uncapped.count()
    # the boilerplate cluster alone contributes ~40*39/2 pairs
    assert n_uncapped >= 40 * 39 // 2

    capped, chained = minhash_lsh_candidates(
        df, num_hashes=16, bands=8, max_bucket=10, with_dropped=True)
    cpairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
    hot_pairs = [(a, b) for a, b in cpairs if a < 40 and b < 40]
    # bounded: O(width * bands) stride-1/2 chain links, nowhere near
    # width^2/2
    assert 39 <= len(hot_pairs) <= 2 * 40 * 8
    assert len(cpairs) < n_uncapped
    # connected: components over the capped candidates still collapse
    # the whole hot cluster to one root — dedup semantics preserved
    roots = dict(_components_union_find(hot_pairs))
    assert {roots[i] for i in range(40)} == {0}
    # recall unchanged for the narrow-bucket planted near-dup
    assert (100, 101) in cpairs
    # accounting: at least one chained bucket, all wider than the cap
    crows = chained.collect()
    assert crows and all(r.bucket_width > 10 for r in crows)

    # contract uniformity: cap disabled -> empty frame, same schema
    _, empty = minhash_lsh_candidates(
        df, num_hashes=16, bands=8, max_bucket=None, with_dropped=True)
    assert empty.columns == ["band_id", "band_hash", "bucket_width"]
    assert empty.count() == 0


def test_ann_lsh_subset_of_bruteforce_corpus(spark):
    from html_parser_spark.spark.ops import ann_bruteforce, ann_lsh

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    bf = ann_bruteforce(emb, [0, 1], k=3).collect()
    assert len(bf) == 6
    lsh = ann_lsh(emb, [0, 1], k=3).collect()
    # LSH returns at most k per query, all with valid cosine
    assert all(-1.0 <= r.cosine <= 1.0 for r in lsh)


def test_embedding_near_dup_finds_planted(spark):
    """LSH-bucketed near-dup must find planted near-identical vectors
    and agree with the exact all-pairs verification."""
    import math
    import random

    from html_parser_spark.spark.ops import embedding_near_dup

    rng = random.Random(3)
    rows = []
    for i in range(30):
        rows.append((i, [rng.gauss(0, 1) for _ in range(16)]))
    # plant 3 near-identical pairs (tiny perturbation -> cosine ~0.999)
    planted = set()
    for j in range(3):
        base_id = j * 5
        vec = rows[base_id][1]
        rows.append((100 + j, [x + rng.gauss(0, 0.01) for x in vec]))
        planted.add((base_id, 100 + j))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    lsh_pairs = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup(df, threshold=0.95).collect()
    }
    exact_pairs = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup(df, threshold=0.95, exact=True).collect()
    }
    assert planted <= exact_pairs
    assert lsh_pairs == exact_pairs  # full recall on near-identical dups
    # sanity: no spurious far pair sneaks in
    assert all(a < b for a, b in lsh_pairs)
    assert math.isfinite(len(lsh_pairs))


def test_simhash_similar_docs_close(spark):
    from html_parser_spark.spark.ops import simhash

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r.simhash for r in simhash(df).collect()}

    def hamming(a, b):
        return bin((a & 0xFFFFFFFFFFFFFFFF) ^ (b & 0xFFFFFFFFFFFFFFFF)).count("1")

    assert hamming(rows[1], rows[2]) < hamming(rows[1], rows[3])


def test_strategies_output_identical(spark):
    """single_scan=True (1 FileScan) and the JVM tier split (2 scans)
    must produce byte-identical results — the property that makes the
    single-scan default safe."""
    from html_parser_spark.spark.pipeline import extract_turns
    from html_parser_spark.spark.transcripts import transcripts_df

    df = transcripts_df(spark, 400, seed=11, partitions=4)

    def canon(q):
        return sorted(
            (r.conv_id, r.turn_idx, r.extracted_text,
             tuple((s.start, s.end, s.path) for s in r.spans),
             r.parse_errors, r.node_count, r.doc_encoding,
             tuple(r.parse_error_texts))
            for r in q.collect())

    a = canon(extract_turns(df, ordered=False, single_scan=True))
    b = canon(extract_turns(df, ordered=False, single_scan=False))
    assert a == b
    # and the plans genuinely differ in scan count
    p1 = extract_turns(df, ordered=False, single_scan=True)
    p2 = extract_turns(df, ordered=False, single_scan=False)
    s1 = p1._jdf.queryExecution().executedPlan().toString()
    s2 = p2._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in s1 and "Union" in s2


def test_fastpath_plan_stays_jvm(spark):
    """The trivial tier must not contain a Python/Arrow eval node and
    the parquet scan must prune columns."""
    from html_parser_spark.spark.pipeline import extract_turns
    from html_parser_spark.spark.transcripts import transcripts_df

    df = transcripts_df(spark, 100, seed=3, partitions=2)
    out = extract_turns(df, ordered=False, single_scan=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one Arrow eval (the hard tier), none in the trivial tier
    assert plan.count("ArrowEvalPython") <= 1 or "MapInArrow" in plan


def test_ann_lsh_build_runs_no_job(spark):
    """Building the ann_lsh query must be pure plan construction: no
    driver-side action (the r1 version probed the dim via .first())."""
    import os as _os

    from html_parser_spark.spark.ops import ann_lsh

    emb = spark.read.parquet(
        _os.path.join("/root/testdata/sf0.001", "embeddings.parquet")
    )
    spark.sparkContext.setJobGroup("ann-build", "ann_lsh construction")
    try:
        ann_lsh(emb, [0, 1], k=3)  # build only, no action
        jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(
            "ann-build"
        )
    finally:
        spark.sparkContext.setJobGroup(None, None)
    assert list(jobs) == []


def test_simhash_plan_is_jvm_only(spark):
    """SimHash must stay inside whole-stage codegen: no Python/Arrow
    eval node anywhere in the physical plan."""
    from html_parser_spark.spark.ops import simhash

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = simhash(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInArrow" not in plan


def test_ngram_jaccard_with_candidates_no_cartesian(spark):
    """The LSH-candidate-verified jaccard must never plan a cartesian
    product or nested-loop join."""
    from html_parser_spark.spark.ops import (
        minhash_lsh_candidates, ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} tok{i + 2} tok{i + 3}") for i in range(8)],
        "doc_id long, text string",
    )
    q = ngram_jaccard_pairs(
        df, threshold=0.5, candidates=minhash_lsh_candidates(df)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_recall_at_threshold(spark):
    """Planted pairs with jaccard just above 0.5 must survive the
    16-band x 2-row LSH candidate stage (the registered ngram_jaccard
    config): P(collide | j=0.5) = 1-(1-0.25)^16 ~ 0.99 per pair, so
    >=90% of 30 planted boundary pairs must be recalled. The old 8x4
    banding recalls ~40% here — this is the gate the exact all-pairs
    oracle relies on."""
    from html_parser_spark.spark.ops import (
        minhash_lsh_candidates, ngram_jaccard_pairs,
    )

    docs = []
    n_pairs = 30
    for p in range(n_pairs):
        shared = [f"p{p}w{i}" for i in range(15)]
        tail_a = [f"p{p}a{i}" for i in range(5)]
        tail_b = [f"p{p}b{i}" for i in range(5)]
        # 3-gram shingles: |A|=|B|=18, shared=13, union=23 -> j~0.565
        docs.append((2 * p, " ".join(shared + tail_a)))
        docs.append((2 * p + 1, " ".join(shared + tail_b)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cand = minhash_lsh_candidates(df, num_hashes=32, bands=16)
    pairs = {(r.doc_a, r.doc_b) for r in cand.collect()}
    planted = {(2 * p, 2 * p + 1) for p in range(n_pairs)}
    recall = len(planted & pairs) / n_pairs
    assert recall >= 0.9, f"LSH recall at threshold boundary: {recall}"
    # exact verification keeps every recalled boundary pair (j >= 0.5)
    verified = ngram_jaccard_pairs(df, threshold=0.5, candidates=cand)
    vpairs = {(r.doc_a, r.doc_b) for r in verified.collect()}
    assert planted & pairs <= vpairs


def _clustered_embeddings(spark, n_clusters=4, per_cluster=25, dim=16,
                          seed=11):
    """Well-separated unit-ish clusters: center c gets coordinates
    concentrated on its own dim block, members are tiny perturbations."""
    import random

    rng = random.Random(seed)
    rows = []
    for c in range(n_clusters):
        center = [0.0] * dim
        for d in range(dim):
            center[d] = 1.0 if d % n_clusters == c else 0.05
        for m in range(per_cluster):
            vec = [x + rng.gauss(0, 0.05) for x in center]
            rows.append((c * per_cluster + m, vec))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_ivf_kmeans_recall_single_probe(spark):
    """The k-means quantizer must place each planted cluster in its own
    cell so n_probe=1 already recovers (nearly) the exact top-k — the
    recall guarantee the old hash-random quantizer could not give
    (random cells -> ~1/n_cells of each neighborhood per probe)."""
    from html_parser_spark.spark.ops import ann_bruteforce, ann_ivf, ivf_fit

    emb = _clustered_embeddings(spark)
    centroids = ivf_fit(emb, n_cells=4, seed=7, n_iters=5)
    qids = [0, 25, 50, 75]
    bf = {}
    for r in ann_bruteforce(emb, qids, k=5).collect():
        bf.setdefault(r.query_id, set()).add(r.corpus_id)
    ivf = {}
    for r in ann_ivf(emb, qids, centroids, k=5, n_probe=1).collect():
        ivf.setdefault(r.query_id, set()).add(r.corpus_id)
    hits = sum(len(bf[q] & ivf.get(q, set())) for q in qids)
    total = sum(len(bf[q]) for q in qids)
    assert hits / total >= 0.9, f"IVF n_probe=1 recall: {hits}/{total}"


def test_ivf_fit_deterministic_under_repartition(spark):
    """Trained centroids must be bit-identical regardless of input
    partitioning (decimal-averaged means; the snapshot oracle depends
    on this)."""
    from html_parser_spark.spark.ops import ivf_fit

    emb = _clustered_embeddings(spark)
    c1 = ivf_fit(emb.repartition(2), n_cells=4, seed=7)
    c2 = ivf_fit(emb.repartition(13, "vec_id"), n_cells=4, seed=7)
    assert c1 == c2


def test_ann_lsh_recall_on_clusters(spark):
    """Cross-derivation for the ann_lsh pin: on clustered data the
    LSH top-k must recover >=80% of the exact bruteforce top-k (OR-
    amplified 4x8-plane sign buckets keep same-cluster vectors
    together), and every LSH hit must carry the exact cosine (so any
    returned pair is verifiable against bruteforce scoring)."""
    from html_parser_spark.spark.ops import ann_bruteforce, ann_lsh

    emb = _clustered_embeddings(spark)
    qids = [0, 25, 50, 75]
    bf_rows = ann_bruteforce(emb, qids, k=5).collect()
    bf = {}
    bf_cos = {}
    for r in bf_rows:
        bf.setdefault(r.query_id, set()).add(r.corpus_id)
        bf_cos[(r.query_id, r.corpus_id)] = r.cosine
    lsh_rows = ann_lsh(emb, qids, k=5).collect()
    lsh = {}
    for r in lsh_rows:
        lsh.setdefault(r.query_id, set()).add(r.corpus_id)
        # identical exact-cosine scoring on the candidates it returns
        if (r.query_id, r.corpus_id) in bf_cos:
            assert r.cosine == bf_cos[(r.query_id, r.corpus_id)]
    hits = sum(len(bf[q] & lsh.get(q, set())) for q in qids)
    total = sum(len(bf[q]) for q in qids)
    assert hits / total >= 0.8, f"ann_lsh recall: {hits}/{total}"


def test_simhash_cross_derivation(spark):
    """Independent value-level re-derivation of the simhash pin: take
    per-token xxhash64 from Spark as the shared primitive, recompute
    the bit-vote fingerprint in plain Python, and demand equality with
    the operator on real sf0.001 documents."""
    from html_parser_spark.spark.ops import simhash

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
        "doc_id", "text")
    got = {r.doc_id: r.simhash for r in simhash(docs).collect()}

    from pyspark.sql import functions as F
    tok_rows = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "").select(
        "doc_id", F.xxhash64("tok").alias("h")).collect()
    by_doc = {}
    for r in tok_rows:
        by_doc.setdefault(r.doc_id, []).append(r.h)
    for r in docs.collect():
        hashes = by_doc.get(r.doc_id, [])
        fp = 0
        n = len(hashes)
        for b in range(64):
            ones = sum((h >> b) & 1 for h in hashes)
            if 2 * ones > n:
                fp |= 1 << b
        # operator emits a signed long; reinterpret for comparison
        expect = fp - (1 << 64) if fp >= (1 << 63) else fp
        assert got[r.doc_id] == expect, r.doc_id


def test_minhash_cross_derivation(spark):
    """Same pattern for the minhash pin: shingle hashes from Spark,
    signature (min over k rehashes) recomputed in Python."""
    from html_parser_spark.spark.ops import minhash_signatures, word_shingles

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
        "doc_id", "text").limit(20)
    got = {r.doc_id: list(r.signature)
           for r in minhash_signatures(docs, num_hashes=8).collect()}

    from pyspark.sql import functions as F
    sh = word_shingles(docs, 3).select(
        "doc_id", F.explode("shingles").alias("sh")
    ).select("doc_id", F.xxhash64("sh").alias("h"))
    rehashed = sh.select(
        "doc_id",
        *[F.xxhash64(F.col("h"), F.lit(k)).alias(f"r{k}") for k in range(8)],
    ).collect()
    by_doc = {}
    for r in rehashed:
        sig = by_doc.setdefault(r.doc_id, [None] * 8)
        for k in range(8):
            v = r[f"r{k}"]
            if sig[k] is None or v < sig[k]:
                sig[k] = v
    for doc_id, sig in by_doc.items():
        assert got[doc_id] == sig, doc_id


def test_source_stats_rollup(spark):
    from html_parser_spark.spark.ops import source_stats

    df = spark.createDataFrame(
        [(1, "aa", "en", "web", 2), (2, "aa", "en", "web", 2),
         (3, "bb", "en", "web", 2), (4, "cc", "en", "books", 2)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    rows = {r.source: r for r in source_stats(df).collect()}
    assert rows["web"].n_docs == 3
    assert rows["web"].n_unique_texts == 2  # "aa" deduped
    assert rows["web"].n_chars_total == 6
    assert rows["books"].n_docs == 1


def test_knn_label_purity_on_clusters(spark):
    """On well-separated labeled clusters, the exact top-k neighbors
    of any member share its label -> purity 1.0 and majority ==
    query label."""
    from html_parser_spark.spark.ops import knn_label_purity

    emb = _clustered_embeddings(spark)  # 4 clusters of 25
    labeled = emb.selectExpr(
        "vec_id", "embedding",
        "cast(vec_id / 25 as int) AS label")
    rows = knn_label_purity(labeled, [0, 25, 50, 75], k=5).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.majority_label == r.query_label
        assert r.purity == 1.0


def test_event_sessions_gap_split(spark):
    import datetime

    from html_parser_spark.spark.ops import event_sessions

    t0 = datetime.datetime(2020, 1, 1, 10, 0, 0)

    def ev(eid, uid, minutes):
        return (eid, t0 + datetime.timedelta(minutes=minutes), uid,
                "click", 1.0, "{}")

    df = spark.createDataFrame(
        [ev(1, 7, 0), ev(2, 7, 10), ev(3, 7, 20),   # session 0
         ev(4, 7, 120), ev(5, 7, 125),              # session 1 (gap>30)
         ev(6, 9, 0)],                              # other user
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = {(r.user_id, r.session_id): r
            for r in event_sessions(df, gap_minutes=30).collect()}
    assert rows[(7, 0)].n_events == 3
    assert rows[(7, 1)].n_events == 2
    assert rows[(9, 0)].n_events == 1
    # near-boundary fractional gaps: semantics are floor-EACH-then-
    # diff (both the operator and its oracle truncate per timestamp):
    # .900 -> .100 is a true 1799.2s gap whose floored diff is exactly
    # 1800 -> merged; the next floored diff is 1801 -> split
    import datetime as _dt
    frac = spark.createDataFrame(
        [(1, _dt.datetime(2020, 1, 1, 10, 0, 0, 900000), 5, "c", 1.0, "{}"),
         (2, _dt.datetime(2020, 1, 1, 10, 30, 0, 100000), 5, "c", 1.0, "{}"),
         (3, _dt.datetime(2020, 1, 1, 11, 0, 1, 200000), 5, "c", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = sorted((r.session_id, r.n_events)
                 for r in event_sessions(frac, gap_minutes=30).collect())
    assert got == [(0, 2), (1, 1)], got
    assert rows[(7, 1)].first_ts == t0 + __import__(
        "datetime").timedelta(minutes=120)


def test_curate_corpus_stages(spark):
    """Planted scenario: the curation plan must drop the low-quality
    doc, the exact duplicate, and the near-duplicate — and keep the
    canonical + unique survivors."""
    from html_parser_spark.spark.ops import curate_corpus

    good = ("the quick brown fox jumps over the lazy dog and then "
            "the dog wanders off to find a quiet spot by the river "
            "where the grass grows tall and the water runs clear "
            "under the old wooden bridge near the mill") * 2
    near = good + " extra tail words here"
    other = ("a completely different passage about spark shuffles and "
             "the cost of wide transformations across a cluster of "
             "executors reading columnar files from object storage "
             "with adaptive query execution enabled for the join") * 2
    docs = [
        (1, good, "en", "web", len(good)),
        (2, good, "en", "web", len(good)),      # exact dup of 1
        (3, near, "en", "web", len(near)),      # near dup of 1
        (4, other, "en", "books", len(other)),  # unique
        (5, "x y z", "en", "web", 5),           # low quality (short)
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    kept = sorted(r.doc_id for r in curate_corpus(df).collect())
    assert kept == [1, 4], kept


def test_ann_ivf_full_probe_equals_bruteforce(spark):
    """IVF with n_probe == n_cells searches every cell — the result
    must equal exact brute force, rank for rank."""
    import os as _os

    from html_parser_spark.spark.ops import ann_bruteforce, ann_ivf, ivf_fit

    emb = spark.read.parquet(
        _os.path.join("/root/testdata/sf0.001", "embeddings.parquet")
    )
    anchors = ivf_fit(emb, n_cells=8, seed=7)
    assert len(anchors) == 8
    ivf = {
        (r.query_id, r.rank): r.corpus_id
        for r in ann_ivf(emb, [0, 1, 2], anchors, k=4, n_probe=8).collect()
    }
    bf = {
        (r.query_id, r.rank): r.corpus_id
        for r in ann_bruteforce(emb, [0, 1, 2], k=4).collect()
    }
    assert ivf == bf
    # partial probe returns at most k per query, ranks contiguous from 1
    part = ann_ivf(emb, [0, 1, 2], anchors, k=4, n_probe=2).collect()
    by_q = {}
    for r in part:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ops_invariant_under_repartitioning(spark):
    """Operator outputs must not depend on physical partitioning —
    the determinism property that makes snapshot oracles (and reruns
    on a 1000-executor cluster) meaningful. Aggregation-order-sensitive
    logic would fail this."""
    from html_parser_spark.spark.ops import (
        exact_dedup, fingerprint, minhash_lsh_candidates, simhash,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def run(df):
        return (
            sorted((r.doc_id, r.simhash) for r in simhash(df).collect()),
            sorted((r.doc_id, r.fingerprint)
                   for r in fingerprint(df).collect()),
            sorted((r.doc_a, r.doc_b)
                   for r in minhash_lsh_candidates(df).collect()),
            sorted((r.text_hash, r.canonical_doc_id, r.n_copies)
                   for r in exact_dedup(df).collect()),
        )

    assert run(docs.repartition(1)) == run(docs.repartition(13))


def test_bucketed_join_has_no_exchange(spark):
    """Both sides written bucketed+sorted on the join key: the
    sort-merge join must plan with ZERO Exchange nodes — the shuffle
    was paid once at write time (the co-location story for repeated
    100 TB joins)."""
    from html_parser_spark.spark.storage import read_table, write_bucketed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    write_bucketed(docs.select("doc_id", "lang"), "b_left", "doc_id", 4)
    write_bucketed(docs.select("doc_id", "n_chars"), "b_right", "doc_id", 4)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = read_table(spark, "b_left").join(
                read_table(spark, "b_right"), "doc_id"
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            assert j.count() == docs.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_lang_id_detects_unsegmented_chinese(spark):
    """zh has no spaces, so stopword-token matching can never fire on
    real Chinese text (round-2/3 finding) — the CJK codepoint-count
    signal must catch it, while space-segmented languages keep their
    stopword argmax and mixed/empty text stays sane."""
    from html_parser_spark.spark.ops import lang_id

    df = spark.createDataFrame(
        [
            (1, "今天天气很好我们去公园散步", "zh"),       # unsegmented
            (2, "的 是 不 了 在", "zh"),                    # segmented
            (3, "the cat sat of the mat and to go", "en"),
            (4, "el la de que y", "es"),
            (5, "12345 !!!", "xx"),                         # no signal
            (6, "the 书", "en"),  # 1 'the' hit vs 1 CJK char: tie
            # mostly-English with MORE CJK chars (4) than stopword
            # hits (3): the per-character zh signal would win without
            # the 25%-density gate (round-4 advisor finding)
            (7, "the quick brown fox jumps over a lazy dog near "
                "the riverbank while children play games 非常好玩",
             "en"),
        ],
        "doc_id long, text string, lang string",
    )
    pred = {r.doc_id: r.predicted_lang for r in lang_id(df).collect()}
    assert pred[1] == "zh"
    assert pred[2] == "zh"
    assert pred[3] == "en"
    assert pred[4] == "es"
    assert pred[5] == "und"
    assert pred[6] == "en"  # tie at 1-1 -> first-wins fixed order
    assert pred[7] == "en"  # density gate zeroes the zh signal


def _star_cluster_docs(spark):
    """Star dup cluster where PAIRWISE drop leaves residue: doc3 is a
    near-dup of doc1 AND doc2 (j = 10/11 ~ 0.909 each) but doc1/doc2
    are below threshold vs each other (j = 10/12 ~ 0.833 < 0.85).
    Pairwise 'drop doc_b of each pair' keeps {1, 2}; connected
    components keep only the cluster minimum {1}. doc4 is unrelated."""
    mid = ("alpha beta gamma delta epsilon zeta eta theta iota "
           "kappa lambda mu")           # 12 words -> 10 shingles
    t3 = mid
    t1 = mid + " omega"                 # +1 trailing shingle
    t2 = "sigma " + mid                 # +1 leading shingle
    t4 = ("an entirely different document about columnar storage "
          "formats and vectorized execution engines with nothing "
          "shared at all")
    rows = [(i, t, "en", "web", len(t))
            for i, t in [(1, t1), (2, t2), (3, t3), (4, t4)]]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


def test_curate_corpus_collapses_dup_clusters(spark):
    """Transitive closure: the star cluster {1,2,3} must collapse to
    its minimum member even though 1 and 2 are not pairwise dups."""
    from html_parser_spark.spark.ops import curate_corpus

    df = _star_cluster_docs(spark)
    kept = sorted(r.doc_id for r in curate_corpus(
        df, quality_min=0.0, jaccard_threshold=0.85).collect())
    assert kept == [1, 4], kept


def test_curate_corpus_modes_identical(spark):
    """materialize=True (persisted single-scan-per-stage) and
    materialize=False (pure plan) must be output-identical."""
    from html_parser_spark.spark.ops import curate_corpus

    df = _star_cluster_docs(spark)
    a = sorted(tuple(r) for r in curate_corpus(
        df, quality_min=0.0, jaccard_threshold=0.85,
        materialize=True).collect())
    b = sorted(tuple(r) for r in curate_corpus(
        df, quality_min=0.0, jaccard_threshold=0.85,
        materialize=False).collect())
    assert a == b and len(a) == 2


def test_components_min_label_chain_and_star(spark):
    """Min-label propagation: a 4-node chain and a star both collapse
    to their minimum; an isolated pair keeps its own min."""
    from html_parser_spark.spark.ops import _components_min_label

    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13),   # chain 10-11-12-13
         (1, 3), (2, 3),                 # star centred on 3
         (20, 21)],                      # isolated pair
        "doc_a long, doc_b long")
    roots = {r.node: r.root
             for r in _components_min_label(edges).collect()}
    assert roots == {10: 10, 11: 10, 12: 10, 13: 10,
                     1: 1, 2: 1, 3: 1, 20: 20, 21: 20}


def test_ivf_arrow_path_at_realistic_dims(spark):
    """IVF at 384 dims x 16 cells (dim*cells > the literal-expression
    envelope): the auto-selected Arrow assignment path must fit and
    search without inlining ~6k literals into the plan, with
    n_probe=1 recall >= 0.9 on planted clusters and full-probe
    equality with bruteforce."""
    from html_parser_spark.spark.ops import (
        _ivf_method, ann_bruteforce, ann_ivf, ivf_fit,
    )

    emb = _clustered_embeddings(spark, n_clusters=16, per_cluster=10,
                                dim=384, seed=3)
    centroids = ivf_fit(emb, n_cells=16, seed=7, n_iters=3)
    assert _ivf_method("auto", centroids) == "arrow"
    qids = [0, 10, 40, 80, 120]
    bf = {}
    for r in ann_bruteforce(emb, qids, k=5).collect():
        bf.setdefault(r.query_id, set()).add(r.corpus_id)
    ivf = {}
    for r in ann_ivf(emb, qids, centroids, k=5, n_probe=1).collect():
        ivf.setdefault(r.query_id, set()).add(r.corpus_id)
    hits = sum(len(bf[q] & ivf.get(q, set())) for q in qids)
    total = sum(len(bf[q]) for q in qids)
    assert hits / total >= 0.9, f"arrow IVF n_probe=1: {hits}/{total}"
    # full probe == bruteforce, exactly (final scoring shares the
    # same JVM cosine expression in both assignment paths)
    full = sorted(
        (r.query_id, r.corpus_id, r.cosine, r.rank)
        for r in ann_ivf(emb, qids, centroids, k=5,
                         n_probe=16).collect())
    want = sorted(
        (r.query_id, r.corpus_id, r.cosine, r.rank)
        for r in ann_bruteforce(emb, qids, k=5).collect())
    assert full == want


def test_ivf_expr_and_arrow_assignments_agree(spark):
    """On the low-dim planted clusters both assignment methods (and
    their probe orderings) must produce identical search results —
    tie semantics are mirrored by construction."""
    from html_parser_spark.spark.ops import ann_ivf, ivf_fit

    emb = _clustered_embeddings(spark)
    centroids = ivf_fit(emb, n_cells=4, seed=7, n_iters=3)
    qids = [0, 25, 50, 75]
    a = sorted(tuple(r) for r in ann_ivf(
        emb, qids, centroids, k=5, n_probe=2, method="expr").collect())
    b = sorted(tuple(r) for r in ann_ivf(
        emb, qids, centroids, k=5, n_probe=2, method="arrow").collect())
    assert a == b and len(a) == 20


def test_dup_components_star_cluster(spark):
    """dup_components returns (doc_id, cluster_root) for exactly the
    docs in dup clusters, with root = smallest member — including the
    star case where pairwise membership alone would miss doc2."""
    from html_parser_spark.spark.ops import dup_components

    df = _star_cluster_docs(spark)
    rows = {r.doc_id: r.cluster_root
            for r in dup_components(df, jaccard_threshold=0.85).collect()}
    assert rows == {1: 1, 2: 1, 3: 1}  # doc4 unrelated -> absent


def test_simhash_odd_bit_count(spark):
    """Regression: odd `bits` must count the top bit (the packed-pair
    form covers 2*(bits//2) bits; the remainder gets its own sum) —
    a 63-bit fingerprint equals the 64-bit one masked to 63 bits."""
    from html_parser_spark.spark.ops import simhash

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "")], "doc_id long, text string")
    r63 = {r.doc_id: r.simhash for r in simhash(df, bits=63).collect()}
    r64 = {r.doc_id: r.simhash for r in simhash(df, bits=64).collect()}
    assert r63[1] == r64[1] & ((1 << 63) - 1)
    assert r63[2] == 0


def test_asof_join_semantics(spark):
    """As-of join: latest right row at-or-before each left row per
    key; same-instant right matches (inclusive); no prior right ->
    nulls; later right rows never leak backwards."""
    import datetime as dt

    from html_parser_spark.spark.ops import asof_join

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 10, T(5)), (2, 10, T(10)), (3, 10, T(2)),
         (4, 20, T(7)), (5, 30, T(9))],
        "click_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, T(3), 100), (10, T(10), 101),   # before + same-instant
         (20, T(8), 102),                     # only AFTER left's t=7
         (40, T(1), 103)],                    # different key
        "user_id long, ts timestamp, view_id long")
    out = {r.click_id: (r.asof_view_id, r.asof_ts)
           for r in asof_join(left, right, right_cols=["view_id"])
           .collect()}
    assert out[1] == (100, T(3))    # latest prior
    assert out[2] == (101, T(10))   # same-instant inclusive
    assert out[3] == (None, None)   # nothing at-or-before t=2
    assert out[4] == (None, None)   # right row is later only
    assert out[5] == (None, None)   # no right rows for key
    assert len(out) == 5            # LEFT semantics: all rows kept


def test_compact_parquet_small_files(spark, tmp_path):
    """Compaction rewrites a many-tiny-files dataset into the computed
    file count with exact row parity."""
    from html_parser_spark.spark.storage import compact_parquet

    src = str(tmp_path / "tiny")
    dst = str(tmp_path / "compacted")
    df = spark.range(10_000).selectExpr(
        "id", "repeat('x', 100) AS pad")
    df.repartition(64).write.parquet(src)  # 64 tiny files
    import glob
    assert len(glob.glob(src + "/part-*.parquet")) == 64
    n = compact_parquet(spark, src, dst, target_file_mb=128)
    assert n == 1  # well under one 128MB target
    assert len(glob.glob(dst + "/part-*.parquet")) == 1
    got = spark.read.parquet(dst)
    assert got.count() == 10_000
    assert got.agg({"id": "sum"}).collect()[0][0] == 10_000 * 9_999 // 2


def test_asof_join_filtered_equals_two_frame(spark):
    """The fused single-scan as-of (both sides as predicates over one
    source) must produce exactly the two-frame asof_join's result on
    disjoint sides."""
    import datetime as dt

    from html_parser_spark.spark.ops import asof_join, asof_join_filtered

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [(i, 10 + i % 3, T(i), "click" if i % 2 else "view",
             100 + i) for i in range(40)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, view_id long")
    fused = asof_join_filtered(
        df, F.col("event_type") == "click",
        F.col("event_type") == "view", right_cols=["view_id"])
    two = asof_join(
        df.where("event_type = 'click'"),
        df.where("event_type = 'view'").select("user_id", "ts",
                                               "view_id"),
        right_cols=["view_id"])
    key = ["event_id", "asof_ts", "asof_view_id"]
    a = sorted(tuple(r) for r in fused.select(*key).collect())
    b = sorted(tuple(r) for r in two.select(*key).collect())
    assert a == b and len(a) == 20


def test_redact_pii_behaviour(spark):
    """Emails and URLs become typed placeholders (email rule first, so
    an address inside a URL query counts once), C0 control chars are
    stripped while tab/newline survive, and counts are per-document."""
    from html_parser_spark.spark.ops import redact_pii

    df = spark.createDataFrame(
        [
            (1, "write to bob@example.com or see https://x.io/a?e=1"),
            (2, "no pii here\tjust\ntext \x07with\x01 bells"),
            (3, "two mails a@b.co c@d.org and http://plain.example"),
        ],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert rows[1].clean_text == "write to <EMAIL> or see <URL>"
    assert (rows[1].n_emails, rows[1].n_urls) == (1, 1)
    assert rows[2].clean_text == "no pii here\tjust\ntext with bells"
    assert (rows[2].n_emails, rows[2].n_urls) == (0, 0)
    assert rows[3].clean_text == "two mails <EMAIL> <EMAIL> and <URL>"
    assert (rows[3].n_emails, rows[3].n_urls) == (2, 1)


def test_redact_pii_url_stops_at_vertical_tab(spark):
    """Pin the engine-parity boundary: Java's \\s includes \\x0b while
    RE2's does not, so URL_RE spells whitespace explicitly — a URL
    must stop at a vertical tab on BOTH engines (reverting to [^\\s]+
    would silently diverge from the DuckDB oracle exactly here)."""
    from html_parser_spark.spark.ops import redact_pii

    df = spark.createDataFrame(
        [(1, "see http://a.example\x0btail")], "doc_id long, text string")
    r = redact_pii(df).collect()[0]
    # \x0b is a C0 control char, stripped after redaction
    assert r.clean_text == "see <URL>tail"
    assert r.n_urls == 1


def test_components_paths_identical(spark):
    """The collected union-find fast path and the distributed
    min-label loop must return identical (node, root) sets."""
    import random

    from html_parser_spark.spark import ops
    from html_parser_spark.spark.ops import _components_min_label

    rng = random.Random(5)
    edges = [(rng.randrange(200), rng.randrange(200))
             for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = sorted(tuple(r) for r in _components_min_label(df).collect())
    old = ops._CC_COLLECT_MAX_EDGES
    ops._CC_COLLECT_MAX_EDGES = 0  # force the distributed loop
    try:
        dist = sorted(
            tuple(r) for r in _components_min_label(df).collect())
    finally:
        ops._CC_COLLECT_MAX_EDGES = old
    assert fast == dist and len(fast) > 0


def test_pack_sequences_invariants(spark):
    """Training-data packing: per-bucket running offsets are exact,
    every offset-in-sequence is inside the budget, sequence ids are
    dense per bucket, and the plan contains ONE hash-partitioned
    window (no global sort)."""
    from html_parser_spark.spark.ops import pack_sequences

    docs = spark.createDataFrame(
        [(i, "tok " * (i % 37 + 1)) for i in range(200)],
        "doc_id long, text string")
    out = pack_sequences(docs, budget_tokens=64, buckets=4)
    rows = sorted(out.collect(), key=lambda r: (r.bucket, r.doc_id))

    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3}
    for b, rs in by_bucket.items():
        offset = 0
        for r in rs:
            assert r.bucket == r.doc_id % 4
            assert r.seq_id == offset // 64
            assert r.seq_offset == offset % 64
            assert 0 <= r.seq_offset < 64
            offset += r.n_tokens
        # dense sequence ids: the bucket's docs fill 0..max contiguously
        assert {r.seq_id for r in rs} == set(
            range(max(r.seq_id for r in rs) + 1))

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(bucket" in plan
    assert "rangepartitioning" not in plan  # no global sort


def test_lang_balanced_sample_deterministic(spark):
    from html_parser_spark.spark.ops import lang_balanced_sample

    docs = spark.createDataFrame(
        [(i, f"t{i}", ["en", "de", "fr"][i % 3], "web")
         for i in range(90)],
        "doc_id long, text string, lang string, source string")
    got = lang_balanced_sample(docs, per_lang=5)
    rows = got.collect()
    per = {}
    for r in rows:
        per.setdefault(r.lang, []).append(r.doc_id)
    assert set(per) == {"en", "de", "fr"}
    # exactly the 5 smallest ids per lang, ranks 1..5
    for lang, ids in per.items():
        all_ids = sorted(i for i in range(90)
                         if ["en", "de", "fr"][i % 3] == lang)
        assert sorted(ids) == all_ids[:5]
    assert {r.rank_in_lang for r in rows} == {1, 2, 3, 4, 5}
    # deterministic across repartitionings
    again = lang_balanced_sample(docs.repartition(7), per_lang=5)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, rows))


def test_components_distributed_at_bench_scale(spark):
    """The distributed min-label loop on a graph it has actually never
    seen in production shape: ~100k edges of multi-hop chains (length
    ~20), forced onto the distributed path via collect_max_edges.
    Asserts convergence, the iteration count tracks the graph diameter
    (>= chain length, <= max_iter), and exact equality with driver
    union-find."""
    from html_parser_spark.spark.ops import (
        _components_min_label, _components_union_find,
    )

    chain_len = 20      # edges per chain -> 21 nodes, diameter 20
    n_chains = 5000     # 100k edges total
    edges = [(c * 100 + j, c * 100 + j + 1)
             for c in range(n_chains) for j in range(chain_len)]
    assert len(edges) == 100_000
    df = spark.createDataFrame(edges, "doc_a long, doc_b long") \
        .repartition(32)

    stats: dict = {}
    labels = _components_min_label(
        df, max_iter=50, collect_max_edges=0, stats=stats)
    got = {r.node: r.root for r in labels.collect()}

    assert stats["path"] == "distributed"
    assert stats["edges"] == 100_000
    # one hop per round: a 20-edge chain needs >= 20 rounds (+1 to
    # observe the fixed point), and convergence must beat max_iter
    assert chain_len <= stats["iterations"] <= 50

    expected = dict(_components_union_find(edges))
    assert got == expected
    # every chain collapses to its minimum node id
    assert all(got[c * 100 + j] == c * 100
               for c in range(0, n_chains, 500)
               for j in range(chain_len + 1))


def test_upsert_parquet_merge_semantics(spark, tmp_path):
    """MERGE semantics on plain parquet: updated keys replaced,
    new keys inserted, untouched rows preserved; initial upsert into
    a missing target just writes."""
    from html_parser_spark.spark.storage import upsert_parquet

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id long, name string, v long")
    assert upsert_parquet(spark, path, base, "id") == 3
    updates = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "id long, name string, v long")
    assert upsert_parquet(spark, path, updates, "id") == 4
    got = {r.id: (r.name, r.v)
           for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("B", 200), 3: ("c", 30),
                   4: ("d", 40)}

    # schema drift surfaces as a clear error, not a silent column
    # drop (extra) or a deep select failure (missing)
    import pytest as _pytest

    drifted = spark.createDataFrame(
        [(5, "e", 50, "extra")],
        "id long, name string, v long, extra_col string")
    with _pytest.raises(ValueError, match="drifts"):
        upsert_parquet(spark, path, drifted, "id")
    narrow = spark.createDataFrame([(5, "e")], "id long, name string")
    with _pytest.raises(ValueError, match="drifts"):
        upsert_parquet(spark, path, narrow, "id")
    # same names but a retyped column is drift too (unionByName would
    # otherwise fail deep inside analysis or silently coerce)
    retyped = spark.createDataFrame(
        [(5, "e", "50")], "id long, name string, v string")
    with _pytest.raises(ValueError, match="retyped"):
        upsert_parquet(spark, path, retyped, "id")
    # and the target is untouched after the refused merges
    assert spark.read.parquet(path).count() == 4


def test_upsert_tolerates_nullability_only_differences(spark, tmp_path):
    """An in-memory updates frame routinely differs from the
    parquet-read schema ONLY in nullability flags (containsNull /
    struct-field nullable); that must upsert cleanly, not be refused
    as 'retyped' (ADVICE r5)."""
    from pyspark.sql import types as T

    from html_parser_spark.spark.storage import upsert_parquet

    path = str(tmp_path / "tbl_null")
    base_schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("tags", T.ArrayType(T.StringType(), False), False),
        T.StructField("meta", T.StructType([
            T.StructField("a", T.IntegerType(), False)]), False),
    ])
    base = spark.createDataFrame(
        [(1, ["x"], (10,)), (2, ["y"], (20,))], base_schema)
    assert upsert_parquet(spark, path, base, "id") == 2

    # same value types, every nullability flag flipped to True
    up_schema = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("tags", T.ArrayType(T.StringType(), True), True),
        T.StructField("meta", T.StructType([
            T.StructField("a", T.IntegerType(), True)]), True),
    ])
    ups = spark.createDataFrame([(2, ["Y"], (200,))], up_schema)
    assert upsert_parquet(spark, path, ups, "id") == 2
    got = {r.id: (r.tags, r.meta.a)
           for r in spark.read.parquet(path).collect()}
    assert got == {1: (["x"], 10), 2: (["Y"], 200)}

    # a genuine nested retype is still refused
    import pytest as _pytest

    bad_schema = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("tags", T.ArrayType(T.LongType(), True), True),
        T.StructField("meta", T.StructType([
            T.StructField("a", T.IntegerType(), True)]), True),
    ])
    bad = spark.createDataFrame([(3, [1], (30,))], bad_schema)
    with _pytest.raises(ValueError, match="retyped"):
        upsert_parquet(spark, path, bad, "id")


def test_table_format_seam_parquet_impl(spark, tmp_path):
    """The TableFormat seam drives append / overwrite / compact /
    merge through one interface with the parquet emulation behind it
    (an Iceberg catalog would swap in atomically-committing impls —
    see the class docstring and COVERAGE.md)."""
    from html_parser_spark.spark.storage import ParquetDirFormat

    fmt = ParquetDirFormat()
    path = str(tmp_path / "fmt_tbl")
    a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    fmt.overwrite(a, path)
    fmt.append(spark.createDataFrame([(3, "c")], "id long, v string"),
               path)
    assert spark.read.parquet(path).count() == 3

    # merge through the seam: replace + insert
    n = fmt.merge(spark,
                  path,
                  spark.createDataFrame([(3, "C"), (4, "d")],
                                        "id long, v string"),
                  "id")
    assert n == 4
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "b", 3: "C", 4: "d"}

    # compact through the seam: in-place swap, content preserved
    many = spark.createDataFrame(
        [(i, "x" * 100) for i in range(2000)], "id long, v string")
    fmt.overwrite(many.repartition(64), path)
    n_files = fmt.compact(spark, path, target_file_mb=128)
    assert n_files == 1
    assert spark.read.parquet(path).count() == 2000
    import glob as _glob
    assert len(_glob.glob(path + "/part-*.parquet")) == 1


def test_asof_join_matches_reference_on_random_inputs(spark):
    """Property: asof_join equals an O(n^2) per-row Python reference
    (latest right at-or-before, ties impossible by construction) on a
    randomized event set."""
    import datetime as dt
    import random

    from html_parser_spark.spark.ops import asof_join

    rng = random.Random(17)
    base = dt.datetime(2024, 3, 1)
    lefts, rights = [], []
    for i in range(120):
        key = rng.randrange(6)
        ts = base + dt.timedelta(seconds=rng.randrange(10_000))
        if i % 2:
            lefts.append((i, key, ts))
        else:
            rights.append((key, ts, 1000 + i))
    # unique (key, ts) per side (the documented tie-free regime)
    seen = set()
    rights = [r for r in rights
              if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]
    ldf = spark.createDataFrame(
        lefts, "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(
        rights, "user_id long, ts timestamp, view_id long")
    got = {r.event_id: (r.asof_view_id, r.asof_ts)
           for r in asof_join(ldf, rdf, right_cols=["view_id"])
           .collect()}
    for eid, key, ts in lefts:
        cands = [(rts, vid) for k, rts, vid in rights
                 if k == key and rts <= ts]
        want = (None, None) if not cands else (
            max(cands)[1], max(cands)[0])
        assert got[eid] == want, (eid, got[eid], want)


def test_components_match_bfs_reference(spark):
    """Property: component roots equal an independent BFS closure
    (pure Python, no shared code with union-find or the Spark loop)
    on a random graph."""
    import random
    from collections import deque

    from html_parser_spark.spark.ops import _components_min_label

    rng = random.Random(23)
    edges = list({(rng.randrange(60), rng.randrange(60))
                  for _ in range(70)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.node: r.root for r in _components_min_label(df).collect()}

    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    want = {}
    for start in adj:
        if start in want:
            continue
        comp, q = [], deque([start])
        seen = {start}
        while q:
            x = q.popleft()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    q.append(y)
        root = min(comp)
        for x in comp:
            want[x] = root
    assert got == want


def test_ann_bruteforce_arrow_matches_expr(spark):
    """The Arrow matmul scale path returns the same neighbor SETS and
    ranks as the expression path on separated clusters at 384 dims
    (cosines compared by rank, not hash: summation order differs in
    the last ulp)."""
    from html_parser_spark.spark.ops import ann_bruteforce

    emb = _clustered_embeddings(spark, n_clusters=6, per_cluster=10,
                                dim=384, seed=9)
    qids = [0, 10, 30]
    a = {(r.query_id, r.rank): r.corpus_id
         for r in ann_bruteforce(emb, qids, k=5, method="expr")
         .collect()}
    b = {(r.query_id, r.rank): r.corpus_id
         for r in ann_bruteforce(emb, qids, k=5, method="arrow")
         .collect()}
    assert a == b and len(a) == 15


def test_mega_conversation_skew(spark):
    """SURVEY §4.3's named skew shape: ONE conversation with 1e5 turns
    among normal ones. Evidence the salted two-stage aggregation
    handles it: (a) results exact, (b) the mega key's stage-1 partials
    spread near-uniformly over all 16 salt buckets (bounded reducer
    load — no single task owns the key), (c) the salt is in the
    executed plan's first aggregate, (d) the per-conv ordering window
    — which CANNOT be salted without changing semantics — still
    completes correctly (Spark's window buffers spill)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from html_parser_spark.spark.pipeline import conversation_stats

    n = 100_000
    mega = spark.range(n).select(
        F.lit("mega").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.concat(F.lit("turn "), F.col("id").cast("string"))
        .alias("extracted_text"),
        (F.col("id") % 3 == 0).cast("int").alias("parse_errors"),
    )
    small = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 100).cast("string"))
        .alias("conv_id"),
        (F.col("id") / 100).cast("int").alias("turn_idx"),
        F.lit("x").alias("extracted_text"),
        F.lit(0).alias("parse_errors"),
    )
    df = mega.unionByName(small)

    stats = {r.conv_id: r for r in conversation_stats(df).collect()}
    assert stats["mega"].n_turns == n
    assert stats["mega"].max_turn_idx == n - 1
    assert stats["mega"].n_parse_errors == (n + 2) // 3
    assert len(stats) == 101

    # (b) the mega conversation's partials spread over every salt
    # bucket, near-uniformly (max/min <= 2): the reducer-side load for
    # the hot key is 1/16th per task, not one 1e5-row task
    spread = (
        mega.withColumn(
            "salt", F.crc32(F.col("turn_idx").cast("string")) % 16)
        .groupBy("salt").count().collect()
    )
    counts = [r["count"] for r in spread]
    assert len(counts) == 16 and max(counts) <= 2 * min(counts)

    # (c) structural: the salt is a grouping key of the first-stage
    # aggregate in the executed plan
    plan = conversation_stats(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "salt" in plan

    # (b2) straggler bound via simulated reducer occupancy: Spark's
    # HashPartitioning assigns a group to reducer pmod(hash(keys), N)
    # (same murmur3 as F.hash). Unsalted, ONE reducer owns all 1e5
    # mega rows; salted, the busiest reducer's share of the mega conv
    # is bounded by the largest salt bucket — the hot key cannot
    # dominate a single task's runtime
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    salted_occ = (
        mega.withColumn(
            "salt", F.crc32(F.col("turn_idx").cast("string")) % 16)
        .groupBy("conv_id", "salt").count()
        .withColumn("reducer",
                    F.pmod(F.hash("conv_id", "salt"), F.lit(shuffle_n)))
        .groupBy("reducer").agg(F.sum("count").alias("rows"))
        .collect()
    )
    unsalted_max = n  # hash(conv_id) sends every mega row to one task
    salted_max = max(r.rows for r in salted_occ)
    assert salted_max <= 2 * max(counts)  # <= ~2 salt buckets per task
    assert salted_max * 4 < unsalted_max  # >=4x straggler reduction

    # (d) ordering window on the mega conv: correct and complete
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ranked = df.withColumn("turn_rank", F.row_number().over(w))
    agg = (ranked.where(F.col("conv_id") == "mega")
           .agg(F.count("*").alias("c"),
                F.sum("turn_rank").alias("s")).first())
    assert agg.c == n and agg.s == n * (n + 1) // 2


def test_approx_percentiles_rank_error_bound(spark):
    """The registered approx_percentiles query's scale regime: when a
    group EXCEEDS the sketch accuracy, Greenwald-Khanna compresses and
    the returned element's RANK must stay within accuracy^-1 * n of
    the target rank (the documented contract, tested with 3x slack).
    Also pins the oracle-SF determinism claim: at accuracy >= group
    size the query output is identical across repartitionings."""
    from pyspark.sql import functions as F

    n, acc = 20000, 100
    vals = [(i % 7, float((i * 2654435761) % 1000003)) for i in range(n)]
    df = spark.createDataFrame(vals, "grp int, value double")
    rows = (
        df.groupBy("grp")
        .agg(F.expr(f"approx_percentile(value, array(0.5, 0.95), {acc})")
             .alias("ap"))
        .collect()
    )
    by_grp = {}
    for g, v in vals:
        by_grp.setdefault(g, []).append(v)
    for r in rows:
        sv = sorted(by_grp[r.grp])
        m = len(sv)
        for p, got in zip((0.5, 0.95), r.ap):
            rank = sv.index(got)
            assert abs(rank - p * m) <= 3 * m / acc, (
                f"grp {r.grp} p{p}: rank {rank} vs target {p * m}")

    # determinism at the oracle SF: accuracy >= every group's size
    # means no compression, so the pinned snapshot cannot drift with
    # partitioning
    import __spark_entry__ as se

    q = se.queries()["approx_percentiles"]
    a = sorted(map(tuple, q(spark, "/root/testdata/sf0.001").collect()))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = sorted(map(tuple,
                       q(spark, "/root/testdata/sf0.001").collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b

    # precondition the pinned approx_percentiles snapshot depends on:
    # at the ORACLE SF every event_type group must fit the
    # accuracy-10000 GK sketch uncompressed (compression would make
    # the output partition-order-dependent and flake the hash gate).
    # A future SF/testdata bump that breaks this must fail HERE, not
    # in the driver's correctness run.
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    max_group = (ev.groupBy("event_type").count()
                 .agg(F.max("count")).first()[0])
    assert max_group < 10000, (
        f"largest sf0.01 event_type group ({max_group}) reached the "
        "accuracy-10000 sketch capacity: re-pin the approx_percentiles "
        "snapshot or raise the accuracy")


def test_ann_bruteforce_auto_method_selection(spark):
    """method='auto' resolves by dimensionality: interpreted-HOF expr
    at test dims, Arrow matmul past the switch (dim >= 256, or
    dim * n_queries > 4096 — here 384-dim). Verified structurally —
    the high-dim auto plan contains the Python/Arrow eval stage and no
    interpreted `aggregate` HOF; the low-dim auto plan is the reverse."""
    from html_parser_spark.spark.ops import ann_bruteforce

    hi = _clustered_embeddings(spark, n_clusters=4, per_cluster=5,
                               dim=384, seed=3)
    plan_hi = ann_bruteforce(hi, [0, 5], k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" in plan_hi or "EvalPython" in plan_hi
    assert "aggregate(" not in plan_hi

    lo = _clustered_embeddings(spark, n_clusters=4, per_cluster=5,
                               dim=16, seed=3)
    plan_lo = ann_bruteforce(lo, [0, 5], k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan_lo
    # and the two resolved paths agree on ranks at the auto boundary
    a = {(r.query_id, r.rank): r.corpus_id
         for r in ann_bruteforce(hi, [0, 5], k=3).collect()}
    b = {(r.query_id, r.rank): r.corpus_id
         for r in ann_bruteforce(hi, [0, 5], k=3, method="expr")
         .collect()}
    assert a == b and len(a) == 6


def test_ann_bruteforce_query_guards(spark):
    """The arrow path raises a clear error on an empty query match
    instead of a numpy shape crash (the lazy expr path documents an
    empty RESULT for the same input); an all-zero query vector scores
    0 everywhere on BOTH paths (epsilon norm guards) instead of
    NaN-sorting above every real cosine."""
    import pytest as _pytest

    from html_parser_spark.spark.ops import ann_bruteforce

    emb = _clustered_embeddings(spark, n_clusters=2, per_cluster=5,
                                dim=8, seed=4)
    with _pytest.raises(ValueError, match="matched no rows"):
        ann_bruteforce(emb, [99999], k=3, method="arrow")
    # lazy expr contract: empty result, no driver job, no crash
    assert ann_bruteforce(emb, [99999], k=3, method="expr") \
        .collect() == []

    zero = emb.union(
        emb.sparkSession.createDataFrame(
            [(100, [0.0] * 8)], "vec_id long, embedding array<double>")
    )
    rows = ann_bruteforce(zero, [100], k=3, method="arrow").collect()
    assert rows and all(r.cosine == 0.0 for r in rows)
    # same zero-norm semantics on the expr path (clamped denominator)
    rows_e = ann_bruteforce(zero, [100], k=3, method="expr").collect()
    assert rows_e and all(r.cosine == 0.0 for r in rows_e)


def test_versioned_format_snapshot_commits(spark, tmp_path):
    """VersionedParquetFormat: all four seam verbs become atomic
    snapshot commits; readers pin versions; time travel reads any
    historical snapshot unchanged (judge r6 item 4)."""
    from html_parser_spark.spark.storage import VersionedParquetFormat

    fmt = VersionedParquetFormat()
    path = str(tmp_path / "vtbl")
    a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    fmt.overwrite(a, path)                             # v1
    fmt.append(spark.createDataFrame([(3, "c")], "id long, v string"),
               path)                                   # v2
    assert fmt.list_versions(spark, path) == [1, 2]
    assert fmt.read(spark, path).count() == 3

    # merge = snapshot v3 (replace id=3, insert id=4)
    n = fmt.merge(spark, path,
                  spark.createDataFrame([(3, "C"), (4, "d")],
                                        "id long, v string"), "id")
    assert n == 4
    got = {r.id: r.v for r in fmt.read(spark, path).collect()}
    assert got == {1: "a", 2: "b", 3: "C", 4: "d"}

    # time travel: v1 and v2 still read EXACTLY as committed
    assert {r.id for r in fmt.read(spark, path, version=1).collect()} \
        == {1, 2}
    assert {r.id for r in fmt.read(spark, path, version=2).collect()} \
        == {1, 2, 3}

    # compact = snapshot v4; row content preserved, files reduced
    fmt.overwrite(a.unionByName(a).repartition(16), path)      # v4
    before = len(fmt._manifest(spark, path,
                               fmt.current_version(spark, path))["files"])
    fmt.compact(spark, path, target_file_mb=128)               # v5
    after = len(fmt._manifest(spark, path,
                              fmt.current_version(spark, path))["files"])
    assert after == 1 and before > after
    assert fmt.read(spark, path).count() == 4


def test_versioned_format_concurrent_reader_isolation(spark, tmp_path):
    """A reader holding snapshot N is undisturbed by later commits:
    the pinned DataFrame (planned over N's file list) collects the SAME
    rows after an overwrite publishes N+1, because commits never
    delete data files — only vacuum does."""
    from html_parser_spark.spark.storage import VersionedParquetFormat

    fmt = VersionedParquetFormat()
    path = str(tmp_path / "vtbl_iso")
    fmt.overwrite(spark.createDataFrame(
        [(i, "old") for i in range(100)], "id long, v string"), path)
    pinned = fmt.read(spark, path)          # plans over v1's files
    assert pinned.count() == 100

    fmt.overwrite(spark.createDataFrame(
        [(0, "new")], "id long, v string"), path)      # v2 commits
    # pinned reader: still v1's content, byte-for-byte
    vals = {r.v for r in pinned.collect()}
    assert vals == {"old"} and pinned.count() == 100
    # a NEW reader sees v2
    assert fmt.read(spark, path).count() == 1


def test_versioned_format_commit_race_rebase(spark, tmp_path):
    """Optimistic concurrency: if another committer takes version N+1
    first (simulated by pre-publishing a manifest at that version), the
    losing append re-reads the winner's snapshot, REBASES its file list
    on top, and lands at N+2 — no lost update."""
    import json

    from html_parser_spark.spark.storage import VersionedParquetFormat

    fmt = VersionedParquetFormat()
    path = str(tmp_path / "vtbl_race")
    fmt.overwrite(spark.createDataFrame(
        [(1, "a")], "id long, v string"), path)        # v1

    # interpose: the first _try_commit attempt is beaten to its version
    orig = fmt._try_commit
    beaten = {"done": False}

    def racing(spark_, tpath, version, manifest):
        if not beaten["done"]:
            beaten["done"] = True
            rival = spark.createDataFrame([(99, "rival")],
                                          "id long, v string")
            rival_files = fmt._write_data(spark, tpath, rival,
                                          f"c{fmt._nonce()}")
            assert orig(spark_, tpath, version, {
                "version": version, "base": version - 1,
                "verb": "append", "files":
                    fmt._manifest(spark, tpath, version - 1)["files"]
                    + rival_files,
                "schema": rival.schema.json(),
            })
        return orig(spark_, tpath, version, manifest)

    fmt._try_commit = racing
    try:
        fmt.append(spark.createDataFrame(
            [(2, "b")], "id long, v string"), path)
    finally:
        fmt._try_commit = orig
    # winner (v2) AND the rebased append (v3) both present
    assert fmt.list_versions(spark, path) == [1, 2, 3]
    got = {r.id: r.v for r in fmt.read(spark, path).collect()}
    assert got == {1: "a", 99: "rival", 2: "b"}


def test_versioned_format_vacuum_and_empty(spark, tmp_path):
    """vacuum drops only unreferenced files/manifests; an empty
    snapshot round-trips through the stored schema."""
    from html_parser_spark.spark.storage import VersionedParquetFormat

    fmt = VersionedParquetFormat()
    path = str(tmp_path / "vtbl_vac")
    sch = "id long, v string"
    fmt.overwrite(spark.createDataFrame([(1, "a")], sch), path)   # v1
    fmt.overwrite(spark.createDataFrame([(2, "b")], sch), path)   # v2
    fmt.overwrite(spark.createDataFrame([], sch), path)           # v3
    assert fmt.read(spark, path).count() == 0          # empty snapshot
    assert [f.name for f in fmt.read(spark, path).schema.fields] \
        == ["id", "v"]

    deleted = fmt.vacuum(spark, path, retain_last=2)
    assert deleted >= 1                                # v1's file gone
    assert fmt.list_versions(spark, path) == [2, 3]
    assert fmt.read(spark, path, version=2).count() == 1
    with pytest.raises(Exception):
        fmt.read(spark, path, version=1)


def test_partition_pruned_scan(spark):
    """Runtime proof of partition pruning over the days(ts) layout
    (judge r6 item 5): a date-bounded filter scans ONLY the matching
    event_date=... directories — verified from input_file_name() on
    the executed rows, not just the plan text — and returns exactly
    the rows the flat table yields for the same window."""
    from html_parser_spark.spark.storage import partitioned_events_path

    sf_dir = "/root/testdata/sf0.01"
    path = partitioned_events_path(spark, sf_dir)
    ev = spark.read.parquet(path)
    lo, hi = "2024-01-10", "2024-01-12"
    filt = ev.filter(F.col("event_date").between(lo, hi))

    scanned = {os.path.dirname(r[0]) for r in
               filt.select(F.input_file_name()).distinct().collect()}
    all_dirs = {os.path.dirname(r[0]) for r in
                ev.select(F.input_file_name()).distinct().collect()}
    assert scanned, "window scanned nothing"
    assert len(all_dirs) >= 25          # ~30 day directories exist
    assert len(scanned) == 3            # exactly the 3 bounded days
    assert all(any(f"event_date=2024-01-1{d}" in p for d in "012")
               for p in scanned), scanned

    # PartitionFilters visible at plan level too
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        filt.explain(True)
    assert "PartitionFilters: [" in buf.getvalue()

    # row parity with the flat table over the same window
    flat = spark.read.parquet(f"{sf_dir}/events.parquet")
    flat_n = flat.filter(
        F.to_date(F.date_trunc("day", F.col("ts"))).between(lo, hi)
    ).count()
    assert filt.count() == flat_n > 0


def test_progressive_jpeg_policy_through_spark_pipeline(spark):
    """Strict/lenient policy for recognized-but-undecodable JPEG
    variants exercised through decode_media's FULL Spark path (judge
    r6 item 6), not just the unit decoder: lenient yields
    decode_ok=false with a deterministic digest feature vector; strict
    raises the documented integration-point message. The progressive
    payload is the baseline writer's output with its SOF0 marker
    relabeled SOF2 — the decoder dispatches on that marker byte, which
    is exactly how any real progressive file hits the policy."""
    from html_parser_spark.spark.multimodal import (
        MEDIA_SCHEMA, decode_media, jpeg_encode,
    )

    base = jpeg_encode(16, 12, 3,
                       bytes((i * 37) % 256 for i in range(16 * 12 * 3)))
    assert b"\xff\xc0" in base
    progressive = base.replace(b"\xff\xc0", b"\xff\xc2", 1)

    rows = [
        (0, "image", bytearray(base),
         {"format": "jpeg", "width": 16, "height": 12,
          "duration_ms": None, "sample_rate": None}),
        (1, "image", bytearray(progressive),
         {"format": "jpeg", "width": 16, "height": 12,
          "duration_ms": None, "sample_rate": None}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    got = {r.media_id: r for r in decode_media(df).collect()}
    assert got[0].decode_ok is True           # baseline decodes
    assert got[1].decode_ok is False          # progressive degrades
    assert len(got[1].features) == len(got[0].features) > 0
    # deterministic: same digest features on a second run
    again = {r.media_id: r for r in decode_media(df).collect()}
    assert again[1].features == got[1].features

    with pytest.raises(Exception) as ei:
        decode_media(df, strict=True).collect()
    assert "only baseline sequential (SOF0) JPEG" in str(ei.value)


def test_lsh_chain_cap_at_1000x_width(spark):
    """Adversarial band-bucket width (judge r6 item 7): a post-exact-
    dedup template cluster 1,000x wider than the cap. The chain cap
    must keep the candidate count at O(width * bands) — NOT width^2/2,
    which here would be ~8M pairs per band — while the cluster still
    collapses to ONE component through the full dup_components
    operator (chained stride-1/2 links all verify as near-dups, so
    nothing escapes dedup)."""
    from html_parser_spark.spark.ops import (
        dup_components, minhash_lsh_candidates,
    )

    template = ("this exact boilerplate footer appears on every page "
                "of the template site including terms privacy cookie "
                "policy contact details and copyright notice for the "
                "operator of the website in question all rights "
                "reserved worldwide ")
    width, cap, bands = 4000, 4, 8
    docs = spark.createDataFrame(
        [(i, template + f"variant {i}") for i in range(width)],
        "doc_id long, text string").repartition(16)

    cand = minhash_lsh_candidates(docs, num_hashes=16, bands=bands,
                                  max_bucket=cap)
    n_cand = cand.count()
    # bounded: at most (2*width-3) chain links per (band, bucket);
    # quadratic behavior would exceed this by three orders of magnitude
    assert 0 < n_cand <= bands * (2 * width)

    comp = dup_components(docs, jaccard_threshold=0.8, num_hashes=16,
                          bands=bands, max_bucket=cap)
    rows = comp.collect()
    assert len(rows) == width                 # every doc clustered
    assert {r.cluster_root for r in rows} == {0}


def test_versioned_format_append_refuses_schema_drift(spark, tmp_path):
    """append must refuse drift instead of silently reinterpreting all
    prior snapshot files under the appender's schema (review finding):
    a retyped or dropped column raises; a nullability-only difference
    does not."""
    from html_parser_spark.spark.storage import VersionedParquetFormat

    fmt = VersionedParquetFormat()
    path = str(tmp_path / "vtbl_drift")
    fmt.overwrite(spark.createDataFrame(
        [(1, "a")], "id long, v string"), path)
    with pytest.raises(ValueError, match="drift"):
        fmt.append(spark.createDataFrame([(2,)], "id long"), path)
    with pytest.raises(ValueError, match="drift"):
        fmt.append(spark.createDataFrame(
            [(2, 3)], "id long, v long"), path)
    # same value types, different nullability flags: fine
    fmt.append(spark.createDataFrame([(2, "b")], "id long, v string")
               .selectExpr("id", "coalesce(v, 'x') as v"), path)
    assert fmt.read(spark, path).count() == 2


def test_repetition_scores_planted(spark):
    """Gopher-style repetition metrics on hand-computable documents:
    repeated-bigram mass, duplicate-line fractions (the sf corpus has
    no newlines, so the line metrics are exercised HERE), the
    deterministic count-then-lexicographic tie-break, and
    repartition-invariance."""
    from html_parser_spark.spark.ops import repetition_scores

    docs = spark.createDataFrame(
        [(1, "a b a b a b"),       # bigrams: "a b" x3, "b a" x2
         (2, "x\ny\nx\nz"),        # one 4-line doc, line "x" repeated
         (3, "p q r")],            # all-unique tokens
        "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_scores(docs).collect()}
    assert len(out) == 3

    r1 = out[1]
    assert r1.dup_word_frac == round((6 - 2) / 6, 6)
    assert r1.dup_trigram_frac == 0.5        # 4 trigrams, 2 distinct
    assert r1.dup_line_frac == 0.0
    assert r1.top_bigram == "a b"
    assert r1.top_bigram_count == 3
    assert r1.top_bigram_char_frac == round(3 * 3 / 11, 6)

    r2 = out[2]
    # whitespace-split sees ONE token, so word/bigram metrics are zero
    assert r2.dup_word_frac == 0.0
    assert r2.dup_trigram_frac == 0.0
    assert r2.top_bigram is None and r2.top_bigram_count == 0
    assert r2.top_bigram_char_frac == 0.0
    assert r2.dup_line_frac == 0.25          # 4 lines, 3 distinct
    assert r2.dup_line_char_frac == 0.25     # 4 line chars, 1 repeated

    r3 = out[3]
    assert r3.dup_word_frac == 0.0
    # tie between "p q" and "q r" (count 1): lexicographically LAST
    assert r3.top_bigram == "q r"
    assert r3.top_bigram_count == 1
    assert r3.top_bigram_char_frac == round(3 / 5, 6)

    again = repetition_scores(docs.repartition(5)).collect()
    assert sorted(map(tuple, again)) == sorted(
        tuple(out[k]) for k in sorted(out))


def test_decontaminate_planted(spark):
    """n-gram-collision decontamination: a corpus doc sharing a
    5-gram with a benchmark doc is flagged, disjoint docs are not,
    the sub-n-token whole-text fallback matches across sides, and
    benchmark docs never appear in the output."""
    from html_parser_spark.spark.ops import decontaminate

    docs = spark.createDataFrame(
        [(7, "w1 w2 w3 w4 w5 w6"),     # benchmark (7 % 10 == 7)
         (27, "short text"),           # benchmark, sub-5-token
         (1, "w1 w2 w3 w4 w5"),        # == bench gram -> contaminated
         (2, "z1 z2 z3 z4 z5 z6 z7"),  # disjoint
         (3, "short text")],           # fallback-gram hit
        "doc_id long, text string")
    out = {r.doc_id: r for r in decontaminate(docs).collect()}
    assert set(out) == {1, 2, 3}       # corpus side only

    assert out[1].n_grams == 1 and out[1].n_hits == 1
    assert out[1].contamination_frac == 1.0
    assert out[1].is_contaminated

    assert out[2].n_grams == 3 and out[2].n_hits == 0
    assert out[2].contamination_frac == 0.0
    assert not out[2].is_contaminated

    assert out[3].n_grams == 1 and out[3].n_hits == 1
    assert out[3].is_contaminated

    # the benchmark gram set rides a broadcast, not a shuffle join
    plan = decontaminate(docs)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_top_terms_planted(spark):
    """Rational TF-rarity ranking on a hand-computable corpus,
    including the tie broken by term string (no libm log anywhere,
    so ranks are engine-exact by construction)."""
    from html_parser_spark.spark.ops import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "apple apple banana common"),
         (2, "banana cherry common"),
         (3, "common common dog")],
        "doc_id long, text string")
    rows = tfidf_top_terms(docs, k=3).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r.term_rank)

    # N=3; score = tf * 4 / (df + 1)
    d1 = [(r.term, r.tfidf) for r in by_doc[1]]
    assert d1 == [("apple", 4.0), ("banana", round(4 / 3, 6)),
                  ("common", 1.0)]
    d2 = [(r.term, r.tfidf) for r in by_doc[2]]
    assert d2 == [("cherry", 2.0), ("banana", round(4 / 3, 6)),
                  ("common", 1.0)]
    # doc 3: common (tf=2, df=3) and dog (tf=1, df=1) BOTH score 2.0
    # -> term-ascending tie-break
    d3 = [(r.term, r.tfidf) for r in by_doc[3]]
    assert d3 == [("common", 2.0), ("dog", 2.0)]

    again = tfidf_top_terms(docs.repartition(5), k=3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_dup_passages_planted(spark):
    """Exact duplicated-passage annotation on hand-computable docs:
    cross-document n-grams count as duplicated at every position they
    occupy, within-document repeats do NOT make a gram duplicated by
    themselves, sub-n-token docs come back as explicit zero rows, and
    the result is repartition-invariant."""
    from html_parser_spark.spark.ops import dup_passages

    docs = spark.createDataFrame(
        [(1, "a b c d e"),          # grams: abc bcd cde
         (2, "a b c x y"),          # grams: abc bcx cxy
         (3, "a b c a b c a"),      # abc, bca, cab, abc, bca
         (4, "x")],                 # sub-n -> zero row
        "doc_id long, text string")
    out = {r.doc_id: r for r in dup_passages(docs, n=3).collect()}
    assert set(out) == {1, 2, 3, 4}

    # "a b c" appears in docs 1, 2, 3 -> the only cross-doc gram
    assert out[1].n_positions == 3 and out[1].n_dup_positions == 1
    assert out[1].n_dup_grams == 1
    assert out[1].dup_frac == round(1 / 3, 6)

    assert out[2].n_positions == 3 and out[2].n_dup_positions == 1

    # doc 3 holds "a b c" at TWO positions (both count) while its
    # repeated "b c a" stays local (doc_freq 1 -> not duplicated)
    assert out[3].n_positions == 5 and out[3].n_dup_positions == 2
    assert out[3].n_dup_grams == 1
    assert out[3].dup_frac == round(2 / 5, 6)

    assert out[4].n_positions == 0 and out[4].n_dup_positions == 0
    assert out[4].dup_frac == 0.0

    again = dup_passages(docs.repartition(5), n=3).collect()
    assert sorted(map(tuple, again)) == sorted(
        tuple(out[k]) for k in sorted(out))


def test_pmi_collocations_planted(spark):
    """Collocation ranking on a hand-computable corpus: the rational
    association score c(xy)^2/(c(x)c(y)) orders a perfectly-bound pair
    above a frequent-but-diluted one, min_count prunes hapax bigrams,
    and the vocabulary joins ride broadcasts."""
    from html_parser_spark.spark.ops import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "new york new york new york"),
         (2, "new york city"),
         (3, "in new york"),
         (4, "a a a a a a a")],
        "doc_id long, text string")
    rows = pmi_collocations(docs, k=3, min_count=2).collect()
    # counts: new=5 york=5 a=7; "new york"=5 "york new"=2 "a a"=6
    assert [r.bigram for r in rows] == ["new york", "a a", "york new"]
    r0, r1, r2 = rows
    assert (r0.pair_count, r0.w1_count, r0.w2_count) == (5, 5, 5)
    assert r0.assoc == 1.0
    assert r1.assoc == round(36 / 49, 6)
    assert r2.assoc == round(4 / 25, 6)

    plan = pmi_collocations(docs, k=3, min_count=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "CartesianProduct" not in plan


def test_split_assign_deterministic(spark):
    """md5-bucket split: thresholds honored, assignment reproducible
    across repartitionings and exactly equal to a driver-side
    recomputation; changing the salt re-rolls it."""
    import hashlib

    from html_parser_spark.spark.ops import split_assign

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "web") for i in range(1000)],
        "doc_id long, text string, lang string, source string")
    rows = split_assign(docs).collect()
    assert len(rows) == 1000

    def expect_bucket(doc_id, salt="split42"):
        h = hashlib.md5(f"{doc_id}|{salt}".encode()).hexdigest()
        return int(h[:8], 16) % 100

    for r in rows:
        b = expect_bucket(r.doc_id)
        assert r.bucket == b
        assert r.split == (
            "train" if b < 90 else "val" if b < 95 else "test")

    counts = {s: 0 for s in ("train", "val", "test")}
    for r in rows:
        counts[r.split] += 1
    # md5 buckets are uniform; 1000 draws stay well inside these bands
    assert 850 <= counts["train"] <= 950
    assert 20 <= counts["val"] <= 90
    assert 20 <= counts["test"] <= 90

    again = split_assign(docs.repartition(7)).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))

    rerolled = split_assign(docs, salt="other").collect()
    assert {(r.doc_id, r.bucket) for r in rerolled} != {
        (r.doc_id, r.bucket) for r in rows}

    # pure per-row expression: the plan holds NO exchange at all
    plan = split_assign(docs)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan


def test_chunk_documents_planted(spark):
    """Sliding-window chunking: windows tile the word sequence with
    the configured overlap, the tail may be short, reconstruction by
    dropping each window's overlap prefix reproduces the document,
    and the plan is a single narrow stage (zero exchanges)."""
    from html_parser_spark.spark.ops import chunk_documents

    words = [f"w{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(1, " ".join(words), "en", "web"),
         (2, "solo", "en", "web"),
         (3, "", "en", "web")],
        "doc_id long, text string, lang string, source string")
    out = chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r.chunk_idx)

    # doc 1: stride 2 over 10 words -> starts 1,3,5,7,9
    c1 = by_doc[1]
    assert [r.chunk_text for r in c1] == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7",
        "w6 w7 w8 w9", "w8 w9"]
    assert [r.n_tokens for r in c1] == [4, 4, 4, 4, 2]
    # reconstruction: first window whole, then drop the overlap
    rebuilt = c1[0].chunk_text.split(" ")
    for r in c1[1:]:
        rebuilt += r.chunk_text.split(" ")[2:]
    assert rebuilt == words

    # short and empty docs produce exactly one window
    assert [r.chunk_text for r in by_doc[2]] == ["solo"]
    assert [(r.chunk_text, r.n_tokens) for r in by_doc[3]] == [("", 1)]

    # narrow stage: no shuffle, no Python
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_temperature_sample_planted(spark):
    """alpha=0.5 temperature sampling: the largest language keeps
    ~pct%, rare languages hit the rate cap and keep everything, the
    per-row decision equals a driver-side integer recomputation, and
    the count frame joins back by BROADCAST (no corpus-side SMJ)."""
    import hashlib
    import math

    from html_parser_spark.spark.ops import temperature_sample

    rows = ([(i, "t", "en", "web") for i in range(900)]
            + [(1000 + i, "t", "fr", "web") for i in range(100)]
            + [(2000 + i, "t", "zh", "web") for i in range(25)])
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    out = temperature_sample(docs, pct=50).collect()
    assert len(out) == 1025

    n = {"en": 900, "fr": 100, "zh": 25}

    def expect_kept(doc_id, lang):
        h = hashlib.md5(f"{doc_id}|temp7".encode()).hexdigest()
        bucket = int(h[:8], 16) % 10000
        return bucket * bucket * n[lang] < 2500 * 900 * 10000

    kept_counts = {"en": 0, "fr": 0, "zh": 0}
    for r in out:
        assert r.n_lang == n[r.lang]
        assert r.kept == expect_kept(r.doc_id, r.lang), r
        exp_rate = min(1.0, 0.5 * math.sqrt(900 / n[r.lang]))
        assert abs(r.keep_rate - round(exp_rate, 6)) < 1e-9
        kept_counts[r.lang] += bool(r.kept)
    # en: rate 0.5 -> binomial(900, .5) stays well inside this band
    assert 380 <= kept_counts["en"] <= 520
    # fr rate = 1.5 capped at 1, zh rate = 3 capped at 1: keep all
    assert kept_counts["fr"] == 100
    assert kept_counts["zh"] == 25

    again = temperature_sample(docs.repartition(7), pct=50).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))

    plan = temperature_sample(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sft_pairs_hand_built(spark):
    """SFT pair construction on a hand-built conversation: context is
    the previous up-to-k turns as "role: text" joined by newlines, in
    turn order; only assistant turns produce pairs; the plan is one
    conv_id hash-partitioned window (no global sort)."""
    from html_parser_spark.spark.pipeline import sft_pairs

    turns = spark.createDataFrame(
        [("a", 0, "user", "q1"), ("a", 1, "assistant", "a1"),
         ("a", 2, "user", "q2"), ("a", 3, "assistant", "a2"),
         ("a", 4, "tool", "t1"), ("a", 5, "assistant", "a3"),
         ("b", 0, "assistant", "solo")],
        "conv_id string, turn_idx int, role string, "
        "extracted_text string")
    out = sft_pairs(turns, context_turns=3)
    got = {(r.conv_id, r.turn_idx): (r.n_context_turns, r.context,
                                     r.response)
           for r in out.collect()}
    assert got == {
        ("a", 1): (1, "user: q1", "a1"),
        ("a", 3): (3, "user: q1\nassistant: a1\nuser: q2", "a2"),
        ("a", 5): (3, "user: q2\nassistant: a2\ntool: t1", "a3"),
        ("b", 0): (0, "", "solo"),
    }
    # repartition invariance (the window pins intra-frame order)
    got2 = {(r.conv_id, r.turn_idx): (r.n_context_turns, r.context,
                                      r.response)
            for r in sft_pairs(turns.repartition(7), 3).collect()}
    assert got2 == got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(conv_id" in plan
    assert "rangepartitioning" not in plan.lower()


def test_loss_mask_spans_hand_built(spark):
    """Loss-mask layout: cumulative token offsets with 1 separator
    token per turn; [tok_start, tok_end) are contiguous per
    conversation; assistant spans are trainable."""
    from html_parser_spark.spark.pipeline import loss_mask_spans

    turns = spark.createDataFrame(
        [("a", 0, "user", "one two three"),   # 3 tokens
         ("a", 1, "assistant", "four"),       # 1 token
         ("a", 2, "user", ""),                # split('',' ') == [''] -> 1
         ("a", 3, "assistant", "x y")],       # 2 tokens
        "conv_id string, turn_idx int, role string, "
        "extracted_text string")
    out = loss_mask_spans(turns, sep_tokens=1)
    got = {r.turn_idx: (r.n_tokens, r.tok_start, r.tok_end, r.trainable)
           for r in out.collect()}
    assert got == {
        0: (3, 0, 3, False),
        1: (1, 4, 5, True),
        2: (1, 6, 7, False),
        3: (2, 8, 10, True),
    }
    # spans are disjoint and ordered; separator gap is exactly 1
    spans = sorted((r.tok_start, r.tok_end) for r in out.collect())
    for (s0, e0), (s1, _) in zip(spans, spans[1:]):
        assert s1 == e0 + 1


def test_role_alternation_hand_built(spark):
    from html_parser_spark.spark.pipeline import role_alternation

    turns = spark.createDataFrame(
        [("ok", 0, "user", "x"), ("ok", 1, "assistant", "y"),
         ("bad", 0, "user", "x"), ("bad", 1, "user", "y"),
         ("bad", 2, "assistant", "z"), ("bad", 3, "assistant", "w"),
         ("single", 7, "assistant", "s")],
        "conv_id string, turn_idx int, role string, "
        "extracted_text string")
    got = {r.conv_id: (r.n_turns, r.n_violations, r.first_violation_idx)
           for r in role_alternation(turns).collect()}
    assert got == {
        "ok": (2, 0, -1),
        "bad": (4, 2, 1),
        "single": (1, 0, -1),
    }
    got2 = {r.conv_id: (r.n_turns, r.n_violations, r.first_violation_idx)
            for r in role_alternation(turns.repartition(5)).collect()}
    assert got2 == got


def test_tool_transitions_hand_built(spark):
    from html_parser_spark.spark.pipeline import tool_transitions

    turns = spark.createDataFrame(
        [("a", 0, None), ("a", 1, "search"), ("a", 2, None),
         ("a", 3, "python"), ("a", 4, "python"),
         ("b", 0, "python"), ("b", 1, "search"),
         ("c", 5, None)],
        "conv_id string, turn_idx int, tool string")
    got = {(r.from_tool, r.to_tool): r.n
           for r in tool_transitions(turns).collect()}
    assert got == {
        ("START", "search"): 1,   # a's first tool
        ("search", "python"): 1,  # a: 1->3 (null at 2 skipped)
        ("python", "python"): 1,  # a: 3->4
        ("START", "python"): 1,   # b's first tool
        ("python", "search"): 1,  # b: 0->1
    }
    got2 = {(r.from_tool, r.to_tool): r.n
            for r in tool_transitions(turns.repartition(5)).collect()}
    assert got2 == got


def test_cluster_assign_planted(spark):
    """Three planted directions + the seeds themselves: every member
    lands with its seed, sizes and majority labels are exact; the
    assignment is the argmax of round(cos, 6) with ties to the
    smallest seed id."""
    from html_parser_spark.spark.ops import cluster_assign

    def noisy(base, eps):
        return [b + e for b, e in zip(base, eps)]

    dirs = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0], 2: [0.0, 0.0, 1.0]}
    rows = [(i, dirs[i], f"lab{i}") for i in range(3)]
    vid = 3
    for d in range(3):
        for j in range(4):
            rows.append((vid, noisy(dirs[d], [0.01 * j, 0.02, 0.005 * d]),
                         f"lab{d}" if j < 3 else "labX"))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")
    out = {r.cluster_id: (r.n_members, r.majority_label, r.majority_n)
           for r in cluster_assign(emb, n_clusters=3).collect()}
    # each cluster: its seed + 4 planted members = 5; majority label
    # is the planted one (4 of 5 rows carry it: seed + 3 planted)
    assert out == {
        0: (5, "lab0", 4),
        1: (5, "lab1", 4),
        2: (5, "lab2", 4),
    }


def test_extract_links_hand_built(spark):
    """Kernel DOM-walk link extraction: document-order link_idx,
    anchor text spans child elements, href-less anchors skipped,
    foreign-content <a> breaks out to HTML (collected); one Arrow
    stage, variable fan-out, no explode/join."""
    from html_parser_spark.spark.pipeline import extract_links

    turns = spark.createDataFrame(
        [("c", 0, '<p><a href="http://e/1">one <b>bo</b>ld</a>'
                  ' <a name="x">skip</a> <a href="/r">two</a></p>'),
         ("c", 1, "no links here"),
         ("c", 2, '<svg><a href="s">breakout</a></svg>'),
         ("d", 0, '<a href="">empty</a>')],
        "conv_id string, turn_idx int, text string")
    got = sorted((r.conv_id, r.turn_idx, r.link_idx, r.href,
                  r.anchor_text) for r in extract_links(turns).collect())
    assert got == [
        ("c", 0, 0, "http://e/1", "one bold"),
        ("c", 0, 1, "/r", "two"),
        ("c", 2, 0, "s", "breakout"),
        ("d", 0, 0, "", "empty"),
    ]
    plan = extract_links(turns)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1
    assert "Generate" not in plan    # no explode — fan-out is in-batch


def test_link_stats_hand_built(spark):
    from html_parser_spark.spark.pipeline import link_stats

    links = spark.createDataFrame(
        [("a", 0, 0, "http://e/1", "x"), ("a", 1, 0, "http://e/1", "y"),
         ("a", 1, 1, "/r", "z"), ("b", 0, 0, "http://e/1", "w"),
         ("b", 0, 1, "mailto:q@e", "m")],
        "conv_id string, turn_idx int, link_idx int, href string, "
        "anchor_text string")
    got = {r.href: (r.scheme, r.n_links, r.n_source_turns)
           for r in link_stats(links).collect()}
    assert got == {
        "http://e/1": ("http", 3, 3),
        "/r": ("", 1, 1),
        "mailto:q@e": ("mailto", 1, 1),
    }


def test_pagerank_integer_exact(spark):
    """Integer PageRank equals an independent driver-side
    reimplementation of the same recurrence on a hand graph, is
    repartition-invariant, and ranks a popular sink above a leaf."""
    from html_parser_spark.spark.ops import pagerank

    E = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 1)]
    edges = spark.createDataFrame(E, "src long, dst long")
    out = {r.node: r.rank for r in pagerank(edges, n_iter=7).collect()}

    # independent recurrence (plain dicts, no Spark)
    nodes = sorted({u for e in E for u in e})
    scale = 10 ** 12
    n = len(nodes)
    r0 = scale // n
    base = (15 * r0) // 100
    ranks = {v: r0 for v in nodes}
    outdeg = {}
    for u, _ in E:
        outdeg[u] = outdeg.get(u, 0) + 1
    for _ in range(7):
        contrib = {v: 0 for v in nodes}
        for u, v in E:
            contrib[v] += ranks[u] // outdeg[u]
        ranks = {v: base + (85 * contrib[v]) // 100 for v in nodes}
    assert out == ranks
    # node 3 has 3 inbound links; node 4 has none
    assert out[3] > out[4]
    out2 = {r.node: r.rank
            for r in pagerank(edges.repartition(7), n_iter=7).collect()}
    assert out2 == out


def test_interval_join_hand_built(spark):
    """Bin-bucketed range join is lossless vs a driver-side check:
    boundary-inclusive, multi-bin windows match across bin edges, no
    nested-loop/cartesian node in the plan."""
    import datetime as dt

    from html_parser_spark.spark.ops import interval_join

    T = dt.datetime
    events = spark.createDataFrame(
        [(1, T(2024, 1, 1, 7, 59)), (2, T(2024, 1, 1, 8, 0)),
         (3, T(2024, 1, 1, 23, 59)), (4, T(2024, 1, 2, 0, 1)),
         (5, T(2024, 1, 2, 16, 0)), (6, T(2024, 1, 2, 16, 1)),
         (7, T(2024, 1, 5, 12, 0))],
        "event_id long, ts timestamp")
    windows = spark.createDataFrame(
        [("w1", T(2024, 1, 1, 8, 0), T(2024, 1, 2, 16, 0)),  # spans 2 bins
         ("w2", T(2024, 1, 5, 0, 0), T(2024, 1, 5, 23, 0))],
        "window_id string, w_start timestamp, w_end timestamp")
    out = interval_join(events, windows)
    got = sorted((r.window_id, r.event_id) for r in out.collect())
    assert got == [("w1", 2), ("w1", 3), ("w1", 4), ("w1", 5),
                   ("w2", 7)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_strip_dup_passages_hand_built(spark):
    """ExactSubstr deletion on a planted corpus: the shared 8-gram's
    covered word positions vanish from BOTH carriers, unique text
    survives, short docs pass through, and the op is total (every
    doc_id present)."""
    from html_parser_spark.spark.ops import strip_dup_passages

    shared = "a b c d e f g h"            # the duplicated 8-gram
    docs = spark.createDataFrame(
        [(0, f"intro {shared} outro"),
         (1, f"other {shared} tail words"),
         (2, "completely unique text here"),
         (3, "short")],
        "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_words, r.n_removed)
           for r in strip_dup_passages(docs, n=8).collect()}
    assert got[0] == ("intro outro", 10, 8)
    assert got[1] == ("other tail words", 11, 8)
    assert got[2] == ("completely unique text here", 4, 0)
    assert got[3] == ("short", 1, 0)
    # overlapping duplicated grams: every covered position removed once
    d2 = spark.createDataFrame(
        [(0, f"{shared} i"), (1, f"{shared} i")],  # 2 dup grams, 9 words
        "doc_id long, text string")
    got2 = {r.doc_id: (r.clean_text, r.n_removed)
            for r in strip_dup_passages(d2, n=8).collect()}
    assert got2[0] == ("", 9) and got2[1] == ("", 9)


def test_edit_distance_pairs_hand_built(spark):
    """Levenshtein verify on the near-dup pair set: exact distance on
    an ASCII pair, NULL + ascii_only=false on a CJK pair (where Spark
    codepoint edits and DuckDB byte edits legitimately diverge), and
    no rows for docs without a near-dup partner."""
    from html_parser_spark.spark.ops import edit_distance_pairs

    docs = spark.createDataFrame(
        [(0, "a b c d e f g h i j"),
         (1, "a b c d e f g h i k"),      # 1 char edit, jaccard 7/9
         (2, "中 文 一 二 三 四"),
         (3, "中 文 一 二 三 五"),          # jaccard 3/5, non-ASCII
         (4, "totally unrelated words here")],
        "doc_id long, text string")
    rows = {(r.doc_a, r.doc_b): r
            for r in edit_distance_pairs(docs, threshold=0.5).collect()}
    assert set(rows) == {(0, 1), (2, 3)}
    ascii_pair = rows[(0, 1)]
    assert ascii_pair.ascii_only is True
    assert ascii_pair.edit_distance == 1
    assert ascii_pair.edit_similarity == round(1 - 1 / 19, 6)
    cjk_pair = rows[(2, 3)]
    assert cjk_pair.ascii_only is False
    assert cjk_pair.edit_distance is None
    assert cjk_pair.edit_similarity is None


def test_bm25_search_hand_computed(spark):
    """BM25 score on a planted 3-doc corpus equals the same formula
    evaluated with Python floats (identical IEEE ops, same fold
    order), and ranking puts the term-dense short doc first."""
    from html_parser_spark.spark.ops import bm25_search

    texts = {
        0: "spark spark window",           # dense in 2 query terms
        1: "merge line table window row",  # 2 terms, longer
        2: "line table row key agg",       # no query terms
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")
    got = {r.doc_id: (r.score, r.rank)
           for r in bm25_search(
               docs, terms=("spark", "window", "merge"), k=3).collect()}

    n_docs = 3.0
    sum_dl = float(sum(len(t.split()) for t in texts.values()))
    dfs = [sum(1.0 for t in texts.values() if term in t.split())
           for term in ("spark", "window", "merge")]

    def score(text):
        ws = text.split()
        dl = float(len(ws))
        s = None
        for term, df in zip(("spark", "window", "merge"), dfs):
            tf = float(sum(1 for w in ws if w == term))
            idf = (n_docs - df + 0.5) / (df + 0.5)
            denom = tf + 1.2 * (0.25 + (0.75 * dl) / (sum_dl / n_docs))
            si = idf * ((tf * 2.2) / denom)
            s = si if s is None else s + si
        return round(s, 6)

    assert got[0] == (score(texts[0]), 1)
    assert got[1] == (score(texts[1]), 2)
    assert got[2] == (score(texts[2]), 3)
    assert got[2][0] == 0.0


def test_ccnet_split_hand_computed(spark):
    """Integer surprisal bands on a planted corpus: band(word) =
    bit_length(N_lang) - bit_length(c(word)), per-doc means, and the
    per-language tercile assignment."""
    from html_parser_spark.spark.ops import ccnet_split

    docs = spark.createDataFrame(
        [(0, "the the the the", "en"),
         (1, "the rare", "en"),
         (2, "the odd word", "en"),
         (3, "un un", "fr")],
        "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in ccnet_split(docs).collect()}
    # en: N=9 (bits 4), c(the)=6 (bits 3) -> band 1; singletons band 3
    assert (got[0].surprisal_sum, got[0].n_words,
            got[0].surprisal_mean) == (4, 4, 1.0)
    assert (got[1].surprisal_sum, got[1].surprisal_mean) == (4, 2.0)
    assert (got[2].surprisal_sum, got[2].surprisal_mean) == (7, 2.333333)
    assert [got[i].bucket for i in (0, 1, 2)] == [
        "head", "middle", "tail"]
    # fr: every token is the only word -> band 0, sole doc lands head
    assert (got[3].surprisal_sum, got[3].surprisal_mean,
            got[3].bucket) == (0, 0.0, "head")


def test_ngram_diversity_hand_computed(spark):
    """Distinct-2 diversity on a planted corpus: totals, distincts,
    singleton mass, per language; sub-n docs contribute nothing."""
    from html_parser_spark.spark.ops import ngram_diversity

    docs = spark.createDataFrame(
        [(0, "a b a b", "en"),       # grams: ab, ba, ab
         (1, "a b c", "en"),         # grams: ab, bc
         (2, "x", "fr")],            # no 2-grams
        "doc_id long, text string, lang string")
    got = {r.lang: r for r in ngram_diversity(docs, n=2).collect()}
    en = got["en"]
    # en grams: "a b" x3, "b a" x1, "b c" x1 -> total 5, distinct 3
    assert (en.n_grams_total, en.n_grams_distinct,
            en.n_singletons) == (5, 3, 2)
    assert en.distinct_ratio == 0.6 and en.singleton_ratio == 0.4
    assert "fr" not in got


def test_context_window_trim_hand_built(spark):
    """Reverse token budget: the maximal suffix fitting the budget is
    kept, the first turn that overflows (and everything before it) is
    dropped, and the op is total."""
    from html_parser_spark.spark.pipeline import context_window_trim

    turns = spark.createDataFrame(
        [("c1", 0, "user", "w " * 9 + "w"),        # 10 tokens
         ("c1", 1, "assistant", "a b c d e"),       # 5
         ("c1", 2, "user", "x y z"),                # 3
         ("c2", 0, "user", "only")],                # 1
        "conv_id string, turn_idx int, role string, extracted_text string")
    got = {(r.conv_id, r.turn_idx): r
           for r in context_window_trim(turns, budget_tokens=8).collect()}
    # c1 suffix sums (from the end): idx2=3, idx1=8, idx0=18
    assert (got[("c1", 2)].tail_cum_tokens, got[("c1", 2)].kept) == (3, True)
    assert (got[("c1", 1)].tail_cum_tokens, got[("c1", 1)].kept) == (8, True)
    assert (got[("c1", 0)].tail_cum_tokens, got[("c1", 0)].kept) == (18, False)
    assert (got[("c2", 0)].tail_cum_tokens, got[("c2", 0)].kept) == (1, True)


def test_preference_pairs_hand_built(spark):
    """Prompt groups with >=2 distinct responses yield (longest,
    shortest) with deterministic lexicographic tie-breaks; duplicate
    responses collapse; non-adjacent / non-assistant follow-ups are
    ignored."""
    from html_parser_spark.spark.pipeline import preference_pairs

    rows = [
        # prompt "P" answered 3 ways across convs (one duplicated)
        ("a", 0, "user", "P"), ("a", 1, "assistant", "long answer here"),
        ("b", 0, "user", "P"), ("b", 1, "assistant", "short"),
        ("c", 0, "user", "P"), ("c", 1, "assistant", "short"),
        # prompt "Q": single response -> no pair
        ("d", 0, "user", "Q"), ("d", 1, "assistant", "only one"),
        # user turn followed by a tool turn -> not a candidate
        ("e", 0, "user", "P"), ("e", 1, "tool", "ignored"),
        # tie on length for prompt "R": lexicographic order decides
        ("f", 0, "user", "R"), ("f", 1, "assistant", "bb"),
        ("g", 0, "user", "R"), ("g", 1, "assistant", "aa"),
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, extracted_text string")
    got = {r.prompt: r for r in preference_pairs(turns).collect()}
    assert set(got) == {"P", "R"}
    assert (got["P"].n_candidates, got["P"].chosen,
            got["P"].rejected) == (2, "long answer here", "short")
    assert (got["R"].n_candidates, got["R"].chosen,
            got["R"].rejected) == (2, "bb", "aa")


def test_render_chatml_hand_built(spark):
    """Documents assemble in turn order regardless of input order,
    wrap every turn, and count turns/chars exactly."""
    from html_parser_spark.spark.pipeline import render_chatml

    rows = [  # deliberately shuffled turn order
        ("a", 1, "assistant", "hi there"),
        ("a", 0, "user", "hello"),
        ("a", 2, "user", None),          # null text -> ''
        ("b", 0, "user", "solo"),
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, extracted_text string")
    got = {r.conv_id: r for r in render_chatml(turns).collect()}
    a = ("<|im_start|>user\nhello<|im_end|>\n"
         "<|im_start|>assistant\nhi there<|im_end|>\n"
         "<|im_start|>user\n<|im_end|>")
    assert got["a"].chatml == a
    assert got["a"].n_turns == 3 and got["a"].n_chars == len(a)
    assert got["b"].chatml == "<|im_start|>user\nsolo<|im_end|>"
    # repartition invariance (group assembly, not input order)
    re = {r.conv_id: r.chatml
          for r in render_chatml(turns.repartition(7)).collect()}
    assert re == {k: v.chatml for k, v in got.items()}


def test_conv_branches_hand_built(spark):
    """Identical 2-turn prefixes group; differing turn text splits the
    group; prefix uses only turn_idx < prefix_turns."""
    from html_parser_spark.spark.pipeline import conv_branches

    rows = [
        ("a", 0, "user", "same opening"), ("a", 1, "assistant", "X"),
        ("b", 0, "user", "same opening"), ("b", 1, "assistant", "X"),
        ("c", 0, "user", "same opening"), ("c", 1, "assistant", "DIFF"),
        ("d", 0, "user", "unique"), ("d", 1, "assistant", "X"),
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, extracted_text string")
    two = {r.conv_ids: r for r in
           conv_branches(turns, prefix_turns=2).collect()}
    assert two["a,b"].branched and two["a,b"].n_convs == 2
    assert not two["c"].branched and not two["d"].branched
    # k=1: c joins the a,b group (same first turn)
    one = {r.conv_ids: r for r in
           conv_branches(turns, prefix_turns=1).collect()}
    assert one["a,b,c"].n_convs == 3 and one["a,b,c"].branched


def _py_hll(keys, m=256):
    """Independent HLL recompute: same md5 bucket/register formula."""
    import hashlib
    import math

    regs = [0] * m
    for k in keys:
        h = hashlib.md5(k.encode()).hexdigest()
        bucket = int(h[:8], 16) % m
        w = int(h[8:20], 16)
        rho = 49 if w == 0 else 49 - w.bit_length()
        regs[bucket] = max(regs[bucket], rho)
    ssum = sum(1 << (49 - r) for r in regs)
    raw = (0.7213 / (1.0 + 1.079 / m)) * m * m * (2.0 ** 49) / ssum
    v = regs.count(0)
    if raw <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return raw


def test_hll_distinct_matches_independent_recompute(spark):
    """Spark HLL estimate == a from-scratch Python HLL on the same
    keys, both branches (small-range linear counting + raw), and the
    exact_distinct column is truly exact."""
    import datetime

    from html_parser_spark.spark.ops import hll_distinct

    base = datetime.datetime(2021, 1, 1)
    rows = []
    # 'low': 40 users -> linear-counting branch
    for i in range(400):
        rows.append((i, base + datetime.timedelta(days=i % 5),
                     i % 40, "low", 0.0, "{}"))
    # 'high': 3000 users -> raw branch at m=256
    for i in range(3000):
        rows.append((10_000 + i, base + datetime.timedelta(days=i % 3),
                     1000 + i, "high", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {(r.event_type, r.sketch_key): r
           for r in hll_distinct(ev).collect()}

    low = got[("low", "user")]
    assert low.exact_distinct == 40
    exp = _py_hll([f"{u}|hll7" for u in range(40)])
    assert abs(low.hll_estimate - round(exp, 4)) < 1e-9
    assert low.n_empty > 0 and exp <= 2.5 * 256  # linear branch taken

    high = got[("high", "user")]
    assert high.exact_distinct == 3000
    exp_h = _py_hll([f"{1000 + i}|hll7" for i in range(3000)])
    assert abs(high.hll_estimate - round(exp_h, 4)) < 1e-9
    assert exp_h > 2.5 * 256  # raw branch taken
    # sketch error within HLL's expected envelope (~1.04/sqrt(m) ~ 6.5%;
    # allow 4 sigma)
    assert abs(high.rel_err) < 0.26
    # user_day sketch counts distinct (user, day) pairs exactly: day
    # index (i % 5 / i % 3) is fully determined by the user index
    # (i % 40 / i), so each user contributes exactly one day
    assert got[("high", "user_day")].exact_distinct == 3000
    assert got[("low", "user_day")].exact_distinct == 40


def test_semantic_dedup_planted_cluster(spark):
    """Near-identical vectors in one cluster collapse to the lowest id;
    orthogonal vectors all survive; dup_of points at the keeper."""
    from html_parser_spark.spark.ops import semantic_dedup

    def axis(i, dim=8, jitter_axis=None, eps=0.0):
        v = [0.0] * dim
        v[i] = 1.0
        if jitter_axis is not None:
            v[jitter_axis] = eps
        return v

    rows = [
        # seeds: the 4 lowest ids, pure axes 0..3 (orthogonal to all
        # planted vectors, so seeds never near-dup anything)
        (0, axis(0), 0), (1, axis(1), 0), (2, axis(2), 0), (3, axis(3), 0),
        # 10/11/12: same direction (axis 4, tiny jitter) -> one keeper;
        # orthogonal to every seed, so they tie at cos 0 and fall to
        # the smallest seed's cluster
        (10, axis(4, jitter_axis=5, eps=0.01), 0),
        (11, axis(4, jitter_axis=5, eps=0.02), 0),
        (12, axis(4, jitter_axis=5, eps=0.03), 0),
        # 20: axis 6, alone in its direction -> kept
        (20, axis(6, jitter_axis=7, eps=0.05), 0),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r.vec_id: r for r in
           semantic_dedup(emb, n_clusters=4, threshold=0.95).collect()}
    assert len(got) == 8  # total op: every vector present
    assert got[10].kept and got[10].dup_of is None  # lowest id survives
    assert not got[11].kept and got[11].dup_of == 10
    assert not got[12].kept and got[12].dup_of == 10
    assert got[20].kept
    # seeds are their own cluster centers and survive
    for s in range(4):
        assert got[s].kept and got[s].cluster_id == s
    # seed-orthogonal vectors tie (round(cos,6) == 0 to every seed)
    # and deterministically fall to the smallest seed id
    assert got[10].cluster_id == 0 and got[12].cluster_id == 0
    assert got[20].cluster_id == 0


def test_ann_ivfpq_cluster_recall_and_adc_math(spark):
    """IVF-PQ on planted clusters: (a) single-probe retrieval stays
    entirely inside the query's cluster (the IVF cell + PQ code
    resolution is exactly cluster-level on this data); (b) the ADC
    score of every returned row equals an independent numpy recompute
    from the trained codebooks and encoded code words. Exact top-k
    identity vs bruteforce is NOT asserted: within a cluster the
    members are deliberate near-ties and the 4x16 code word cannot
    (and should not) order them — that resolution/recall trade IS
    product quantization."""
    import numpy as np

    from html_parser_spark.spark.ops import (
        ann_ivfpq, ivf_fit, pq_encode, pq_fit,
    )

    emb = _clustered_embeddings(spark)
    anchors = ivf_fit(emb, n_cells=4, seed=7, n_iters=5)
    cbs = pq_fit(emb, n_subspaces=4, n_codes=16, seed=7, n_iters=5)
    qids = [0, 25, 50, 75]
    res = ann_ivfpq(emb, qids, anchors, cbs, k=5, n_probe=1).collect()
    assert len(res) == 20
    same = sum(1 for r in res
               if r.query_id // 25 == r.corpus_id // 25)
    assert same / len(res) >= 0.95

    codes = {r.vec_id: list(r.codes)
             for r in pq_encode(emb, cbs).collect()}
    vecs = {r.vec_id: np.array(r.embedding)
            for r in emb.collect()}
    dim, n_sub = 16, 4
    sub = dim // n_sub
    for qid in qids:
        q = vecs[qid] / np.linalg.norm(vecs[qid])
        table = [
            [float(((q[m * sub:(m + 1) * sub]
                     - np.array(cbs[m][c])) ** 2).sum())
             for c in range(16)]
            for m in range(n_sub)
        ]
        for r in res:
            if r.query_id != qid:
                continue
            exp = round(sum(table[m][codes[r.corpus_id][m]]
                            for m in range(n_sub)), 6)
            assert abs(exp - r.adc_dist) < 1e-9, (qid, r.corpus_id)


def test_pq_fit_deterministic_under_repartition(spark):
    """Trained PQ codebooks must be bit-identical regardless of input
    partitioning (decimal-averaged means — the ann_ivfpq snapshot
    oracle depends on this)."""
    from html_parser_spark.spark.ops import pq_fit

    emb = _clustered_embeddings(spark)
    c1 = pq_fit(emb.repartition(2), n_subspaces=4, n_codes=16, seed=7)
    c2 = pq_fit(emb.repartition(13, "vec_id"), n_subspaces=4,
                n_codes=16, seed=7)
    assert c1 == c2


def test_conv_near_dup_planted(spark):
    """Whole-conversation near-dup detection: a conversation re-run
    with one edited turn must pair with its original above threshold;
    unrelated conversations must not pair. Exercises the full op —
    conv-doc assembly (order-independent), LSH candidates, exact
    verify, id mapping back to conv_id."""
    from html_parser_spark.spark.pipeline import conv_near_dup

    base = ("the quick brown fox jumps over the lazy dog while spark "
            "executors shuffle partitions of tokenized text for "
            "training pipelines at warehouse scale").split()
    orig = " ".join(base)
    edited = " ".join(base[:-2] + ["different", "ending"])
    other = " ".join(reversed(base))  # same words, different shingles
    rows = [
        ("dup_a", 1, "assistant", orig[len(orig) // 2:]),
        ("dup_a", 0, "user", orig[:len(orig) // 2]),
        ("dup_b", 0, "user", edited[:len(edited) // 2]),
        ("dup_b", 1, "assistant", edited[len(edited) // 2:]),
        ("other", 0, "user", other),
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, extracted_text string")
    got = conv_near_dup(turns, threshold=0.5).collect()
    pairs = {(r.conv_a, r.conv_b): r.jaccard for r in got}
    assert ("dup_a", "dup_b") in pairs
    assert pairs[("dup_a", "dup_b")] >= 0.5
    assert all({a, b} == {"dup_a", "dup_b"} for a, b in pairs)


def test_zorder_layout_skips_files_for_box_queries(spark, tmp_path):
    """The z-ordered layout must bound BOTH dimensions per file so
    footer min/max stats (the data-skipping machinery of Iceberg /
    Delta / parquet row-group pruning) exclude most files for any
    box/slice predicate — where a single-column sort only helps
    queries on that column. Measured directly from the parquet
    footers the layouts wrote, plus a correctness read-back."""
    import glob

    import pyarrow.parquet as pq

    from html_parser_spark.spark.storage import write_zordered

    # 64x64 grid, one row per cell
    df = spark.range(64 * 64).selectExpr(
        "id", "cast(id % 64 as int) as x", "cast(id div 64 as int) as y")
    zpath = str(tmp_path / "z")
    xpath = str(tmp_path / "xsort")
    write_zordered(df, zpath, "x", "y", n_files=16, bits=6)
    (
        df.repartitionByRange(16, "x").sortWithinPartitions("x")
        .write.mode("overwrite").parquet(xpath)
    )

    def file_bounds(path):
        out = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            mnx = mny = 1 << 30
            mxx = mxy = -1
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                cols = {row.column(c).path_in_schema: row.column(c)
                        for c in range(row.num_columns)}
                mnx = min(mnx, cols["x"].statistics.min)
                mxx = max(mxx, cols["x"].statistics.max)
                mny = min(mny, cols["y"].statistics.min)
                mxy = max(mxy, cols["y"].statistics.max)
            out.append((mnx, mxx, mny, mxy))
        return out

    def candidates(bounds, xlo, xhi, ylo, yhi):
        return sum(1 for (a, b, c, d) in bounds
                   if not (b < xlo or a > xhi or d < ylo or c > yhi))

    zb, xb = file_bounds(zpath), file_bounds(xpath)
    assert len(zb) == 16 and len(xb) == 16
    boxes = [
        (20, 27, 0, 63),   # x-slice: the x-sort's best case
        (0, 63, 20, 27),   # y-slice: the x-sort reads EVERYTHING
        (20, 27, 20, 27),  # 2-D box
    ]
    z_total = sum(candidates(zb, *b) for b in boxes)
    x_total = sum(candidates(xb, *b) for b in boxes)
    # x-sort cannot skip anything for the y-slice (16 files), z-order
    # bounds both dims (<= 8 of 16 per query on an aligned grid)
    assert candidates(xb, 0, 63, 20, 27) == 16
    assert candidates(zb, 0, 63, 20, 27) <= 8
    assert max(candidates(zb, *b) for b in boxes) <= 8
    assert z_total < x_total
    # correctness: both layouts return identical rows for the 2-D box
    for p in (zpath, xpath):
        got = (
            spark.read.parquet(p)
            .where("x between 20 and 27 and y between 20 and 27")
            .selectExpr("count(*) c", "sum(id) s").collect()[0]
        )
        assert (got.c, got.s) == (64, sum(
            y * 64 + x for x in range(20, 28) for y in range(20, 28)))


def test_gopher_filter_rules_hand_built(spark):
    """Each Gopher rule fires on its planted document and names
    itself in `reasons`; a clean document keeps with empty reasons;
    the stopword rule applies only to lang='en'."""
    from html_parser_spark.spark.ops import gopher_filter

    ok = "the quick brown fox " * 10 + "ends here now then"  # 44 words
    rows = [
        (1, ok.strip(), "en", "s", 0),
        (2, "too short of a doc", "en", "s", 0),          # word_count
        (3, " ".join(["supercalifragilistic"] * 30), "en", "s", 0),
        (4, ("# " * 22 + "the word " * 11).strip(), "en", "s", 0),
        (5, ("... " * 22 + "the word " * 11).strip(), "en", "s", 0),
        (6, "words without stop tokens " * 6, "en", "s", 0),
        (7, "words without stop tokens " * 6, "fr", "s", 0),
    ]
    rows = [(i, t.strip(), lg, s, n) for i, t, lg, s, n in rows]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    got = {r.doc_id: r for r in gopher_filter(docs).collect()}
    assert got[1].keep and got[1].reasons == ""
    assert "word_count" in got[2].reasons and not got[2].keep
    # doc 3: 30 words of len 20 -> mean_word_length fails
    assert "mean_word_length" in got[3].reasons
    assert "hash_ratio" in got[4].reasons
    assert "ellipsis_ratio" in got[5].reasons
    assert "no_stopwords" in got[6].reasons and not got[6].keep
    assert got[7].keep  # same text, non-English: stop rule exempt


def test_source_overlap_hand_built(spark):
    """Shared distinct 8-grams count once per source pair regardless
    of repetition; disjoint sources never pair; the overlap
    coefficient normalizes by the smaller side."""
    from html_parser_spark.spark.ops import source_overlap

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"          # exactly one 8-gram
    a_extra = "a1 a2 a3 a4 a5 a6 a7 a8 a9"       # two more 8-grams
    rows = [
        (1, shared, "en", "srcA", 0),
        (2, shared + " tail", "en", "srcB", 0),  # 2 grams, 1 shared
        (3, a_extra, "en", "srcA", 0),
        (4, "z1 z2 z3 z4 z5 z6 z7 z8", "en", "srcC", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    got = {(r.source_a, r.source_b): r
           for r in source_overlap(docs).collect()}
    assert set(got) == {("srcA", "srcB")}
    r = got[("srcA", "srcB")]
    # srcA grams: shared + 2 from a_extra = 3; srcB: shared + 1 = 2
    assert (r.n_shared_grams, r.grams_a, r.grams_b) == (1, 3, 2)
    assert abs(r.overlap_coef - 0.5) < 1e-9


def test_sft_corpus_dag_hand_built(spark):
    """The three stages compose correctly: single-turn / assistant-
    free / error-heavy conversations are gated out; survivors keep
    only the maximal turn SUFFIX within budget; the render contains
    exactly the kept turns in order."""
    from html_parser_spark.spark.pipeline import sft_corpus

    rows = [
        # 'good': 3 turns, trim budget keeps the last two
        ("good", 0, "user", "w " * 100, 0),
        ("good", 1, "user", "ask", 0),
        ("good", 2, "assistant", "answer here", 0),
        # 'solo': one turn -> gated
        ("solo", 0, "user", "hi", 0),
        # 'noasst': no assistant turn -> gated
        ("noasst", 0, "user", "a", 0), ("noasst", 1, "tool", "b", 0),
        # 'errs': parse-error budget blown -> gated
        ("errs", 0, "user", "x", 9), ("errs", 1, "assistant", "y", 0),
    ]
    rows = [(c, i, r, t.strip(), e) for c, i, r, t, e in rows]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, "
              "extracted_text string, parse_errors int")
    got = {r.conv_id: r
           for r in sft_corpus(turns, budget_tokens=10).collect()}
    assert set(got) == {"good"}
    g = got["good"]
    assert g.n_turns_kept == 2 and g.n_tokens == 3  # 'ask' + 2 words
    assert g.chatml == ("<|im_start|>user\nask<|im_end|>\n"
                        "<|im_start|>assistant\nanswer here<|im_end|>")


def test_sft_prep_job_body_end_to_end(spark, tmp_path):
    """jobs/sft_prep_job.py run shape (body replicated — the job owns
    its SparkSession): transcripts parquet in -> extraction ->
    sft_corpus -> conv-hash-sharded parquet out; re-running lands
    every conversation in the SAME shard (deterministic hash
    partitioning — what makes the nightly job's output stable for
    downstream loaders)."""
    from html_parser_spark.spark.pipeline import extract_turns, sft_corpus
    from html_parser_spark.spark.transcripts import (
        write_transcripts_parquet,
    )

    inp = str(tmp_path / "in")
    write_transcripts_parquet(spark, inp, 500, seed=42, partitions=4)

    def run(out):
        corpus = sft_corpus(
            extract_turns(spark.read.parquet(inp), ordered=False))
        corpus.repartition(4, "conv_id").write.mode(
            "overwrite").parquet(out)
        rows = spark.read.parquet(out)
        import pyspark.sql.functions as F
        return {
            r.conv_id: (r.f, r.n_turns_kept, r.n_tokens, r.chatml)
            for r in rows.withColumn(
                "f", F.element_at(F.split(F.input_file_name(), "/"), -1)
            ).collect()
        }

    a = run(str(tmp_path / "o1"))
    b = run(str(tmp_path / "o2"))
    assert len(a) > 0
    assert {k: v[1:] for k, v in a.items()} == {
        k: v[1:] for k, v in b.items()}
    # shard assignment is conv-stable across runs (same part index)
    part = lambda f: f.split("-")[1]
    assert {k: part(v[0]) for k, v in a.items()} == {
        k: part(v[0]) for k, v in b.items()}


def test_pq_arrow_path_matches_expr_path(spark):
    """The numpy Arrow kernels (the realistic-dimensionality path,
    e.g. 768-dim x 256 codes) must produce the same codebooks, code
    words, and search results as the literal-expression path on
    non-degenerate data — the ann_ivf dual-strategy contract applied
    to PQ."""
    from html_parser_spark.spark.ops import (
        ann_ivfpq, ivf_fit, pq_encode, pq_fit,
    )

    emb = _clustered_embeddings(spark)
    cb_e = pq_fit(emb, n_subspaces=4, n_codes=8, seed=7, n_iters=3,
                  method="expr")
    cb_a = pq_fit(emb, n_subspaces=4, n_codes=8, seed=7, n_iters=3,
                  method="arrow")
    assert cb_e == cb_a

    codes_e = {r.vec_id: list(r.codes)
               for r in pq_encode(emb, cb_e, method="expr").collect()}
    codes_a = {r.vec_id: list(r.codes)
               for r in pq_encode(emb, cb_e, method="arrow").collect()}
    assert codes_e == codes_a

    anchors = ivf_fit(emb, n_cells=4, seed=7, n_iters=2)
    qids = [0, 25, 50, 75]
    res_e = sorted(
        (r.query_id, r.corpus_id, r.rank, r.adc_dist)
        for r in ann_ivfpq(emb, qids, anchors, cb_e, k=5, n_probe=2,
                           method="expr").collect())
    res_a = sorted(
        (r.query_id, r.corpus_id, r.rank, r.adc_dist)
        for r in ann_ivfpq(emb, qids, anchors, cb_e, k=5, n_probe=2,
                           method="arrow").collect())
    assert res_e == res_a


def test_hll_registers_merge_associatively(spark):
    """The property that makes the sketch 100 TB-viable: merging two
    shards' register tables by per-bucket MAX yields the IDENTICAL
    estimate row the whole corpus produces — so partial aggregation /
    per-partition sketching loses nothing. Proven by splitting the
    events in half by event_id parity and comparing against the
    unsplit sketch."""
    import datetime

    from html_parser_spark.spark.ops import hll_distinct

    base = datetime.datetime(2021, 6, 1)
    rows = [(i, base + datetime.timedelta(hours=i % 48), i % 500,
             "t", 0.0, "{}") for i in range(4000)]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    ev = spark.createDataFrame(rows, schema)
    whole = {(r.event_type, r.sketch_key): (r.sum_scaled, r.hll_estimate)
             for r in hll_distinct(ev).collect()}
    # shard-and-merge: registers from each half merged by max == the
    # registers of the union, because max is associative/commutative
    # and bucket assignment is per-key. hll_distinct over the UNION
    # equals hll_distinct over the whole frame trivially; the real
    # merge property is that the union of two DISJOINT-EVENT halves
    # (overlapping USERS) matches — duplicate keys across shards must
    # collapse, which only holds because registers are max-merged,
    # not summed.
    half_a = ev.where("event_id % 3 = 0")
    half_b = ev.where("event_id % 3 <> 0")
    merged = {(r.event_type, r.sketch_key): (r.sum_scaled, r.hll_estimate)
              for r in hll_distinct(half_a.union(half_b)).collect()}
    assert merged == whole
    # and each half alone has overlapping users with the other, so a
    # SUM-style merge would double-count: sanity that halves aren't
    # trivially disjoint in sketch keys
    a_users = {r.user_id for r in half_a.select("user_id").collect()}
    b_users = {r.user_id for r in half_b.select("user_id").collect()}
    assert a_users & b_users


def test_weighted_sample_properties(spark):
    """A-ES invariants: exact-k output, deterministic across
    repartition, salt re-rolls the sample, and weights genuinely bias
    selection (heavy docs oversampled vs a uniform draw)."""
    from html_parser_spark.spark.ops import weighted_sample

    rows = [(i, "t", "en", "s", 10000 if i < 100 else 10)
            for i in range(1000)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    got = weighted_sample(docs, k=100).collect()
    assert len(got) == 100
    again = weighted_sample(docs.repartition(7), k=100).collect()
    assert [(r.doc_id, r.es_score) for r in got] == [
        (r.doc_id, r.es_score) for r in again]
    rerolled = weighted_sample(docs, k=100, salt="other").collect()
    assert {r.doc_id for r in rerolled} != {r.doc_id for r in got}
    # 100 heavy docs (w=10000) vs 900 light (w=10): heavy mass is
    # ~52% of total weight, so far more than the uniform 10% of the
    # sample must be heavy (binomial tail puts >=30 at ~certainty)
    heavy = sum(1 for r in got if r.doc_id < 100)
    assert heavy >= 30


def test_cms_top_terms_properties(spark):
    """Count-Min invariants: the estimate NEVER underestimates
    (one-sided error), exact counts are truly exact, and every
    estimate equals an independent Python sketch recompute built from
    the same md5 bucket arithmetic."""
    import hashlib
    from collections import Counter

    from html_parser_spark.spark.ops import cms_top_terms

    texts = [
        "alpha beta gamma alpha", "alpha beta", "gamma delta epsilon",
        "alpha zeta", "beta beta gamma", "eta theta iota kappa",
    ] * 3
    rows = [(i, t, "en", "s", 0) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    got = {r.token: r for r in
           cms_top_terms(docs, width=16, depth=4, k=10).collect()}
    exact = Counter(w for t in texts for w in t.split(" ") if w)

    # independent sketch recompute
    counters = [[0] * 16 for _ in range(4)]
    for tok, c in exact.items():
        for r in range(4):
            h = hashlib.md5(f"{tok}|cms7{r}".encode()).hexdigest()
            counters[r][int(h[:8], 16) % 16] += c
    for tok, row in got.items():
        assert row.exact_count == exact[tok]
        est = min(
            counters[r][int(hashlib.md5(
                f"{tok}|cms7{r}".encode()).hexdigest()[:8], 16) % 16]
            for r in range(4))
        assert row.cms_estimate == est
        assert row.overestimate >= 0  # one-sided error, always
    # width=16 with 10 distinct tokens forces real collisions
    # somewhere across rows; the top token is still counted exactly
    assert got["alpha"].exact_count == 12  # 4 per cycle x 3


def test_bloom_decontaminate_one_sided_and_exact(spark):
    """Bloom pre-screen invariants: NO false negatives (every exact
    hit is also a bloom hit — per document, bloom >= exact), the
    false-positive gap is small at the default sizing, and both hit
    counts match an independent Python recompute of the same md5
    position arithmetic."""
    import hashlib

    from html_parser_spark.spark.ops import bloom_decontaminate

    # doc 7/17/27 are the benchmark carve (doc_id % 10 == 7)
    rows = [
        (7, "b1 b2 b3 b4 b5 b6", "en", "s", 0),         # bench: 2 grams
        (17, "c1 c2 c3 c4 c5", "en", "s", 0),           # bench: 1 gram
        (1, "b1 b2 b3 b4 b5 x y z q", "en", "s", 0),    # hits 1 bench gram
        (2, "u1 u2 u3 u4 u5 u6 u7", "en", "s", 0),      # clean
        (3, "c1 c2 c3 c4 c5", "en", "s", 0),            # exact bench text
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    got = {r.doc_id: r for r in bloom_decontaminate(docs).collect()}
    assert set(got) == {1, 2, 3}
    for r in got.values():
        assert r.n_bloom_hits >= r.n_exact_hits  # one-sided, always
        assert r.n_false_positives == r.n_bloom_hits - r.n_exact_hits

    def grams(text, n=5):
        ws = text.split(" ")
        if len(ws) < n:
            return {text}
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    bench = grams(rows[0][1]) | grams(rows[1][1])
    bits = {int(hashlib.md5(f"{g}|bloom7{r}".encode())
                .hexdigest()[:8], 16) % 65536
            for g in bench for r in range(3)}
    for doc_id, text, *_ in rows[2:]:
        exp_exact = len(grams(text) & bench)
        exp_bloom = sum(
            1 for g in grams(text)
            if all(int(hashlib.md5(f"{g}|bloom7{r}".encode())
                       .hexdigest()[:8], 16) % 65536 in bits
                   for r in range(3)))
        assert got[doc_id].n_exact_hits == exp_exact
        assert got[doc_id].n_bloom_hits == exp_bloom
    assert got[3].n_exact_hits == 1  # whole-text fallback gram matches
    assert got[2].n_exact_hits == 0


def test_versioned_cluster_zorder_snapshot(spark, tmp_path):
    """OPTIMIZE ZORDER through the snapshot protocol: the rewrite is
    bit-identical data in a new snapshot (pinned readers of the old
    snapshot undisturbed), the layout key never leaks into the
    schema, and the new snapshot's parquet footers show z-tile bounds
    (a y-slice no longer touches every file)."""
    import glob

    import pyarrow.parquet as pq

    from html_parser_spark.spark.storage import VersionedParquetFormat

    fmt = VersionedParquetFormat()
    path = str(tmp_path / "t")
    df = spark.range(64 * 64).selectExpr(
        "id", "cast(id % 64 as int) as x", "cast(id div 64 as int) as y")
    # v1: x-sorted layout (worst case for y-slices)
    fmt.overwrite(
        df.repartitionByRange(16, "x").sortWithinPartitions("x"), path)
    v1 = fmt.current_version(spark, path)
    n_files = fmt.cluster(spark, path, "x", "y", n_files=16, bits=6)
    assert n_files == 16
    v2 = fmt.current_version(spark, path)
    assert v2 == v1 + 1

    new = fmt.read(spark, path)
    assert new.columns == ["id", "x", "y"]  # zkey dropped
    assert new.count() == 64 * 64
    assert (new.selectExpr("sum(id) s").collect()[0].s
            == sum(range(64 * 64)))
    # pinned reader of v1 still sees the old snapshot
    assert fmt.read(spark, path, v1).count() == 64 * 64

    man = fmt._manifest(spark, path, v2)
    def bounds(files):
        out = []
        for f in files:
            md = pq.ParquetFile(f"{path}/{f}").metadata
            lo = hi = None
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                cols = {row.column(c).path_in_schema: row.column(c)
                        for c in range(row.num_columns)}
                s = cols["y"].statistics
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            out.append((lo, hi))
        return out
    yb = bounds(man["files"])
    # y-slice [20,27]: the z-layout bounds y per file, so at most half
    # the files can intersect (the x-sorted v1 would intersect ALL)
    hits = sum(1 for lo, hi in yb if not (hi < 20 or lo > 27))
    assert hits <= 8


def test_rag_retrieval_hand_built(spark):
    """Inverted-index BM25 join: the prompt's rare term pulls the
    document containing it to rank 1 ahead of a common-term match;
    only first user turns retrieve; docs sharing no token never
    appear; k bounds the output."""
    from html_parser_spark.spark.ops import rag_retrieval

    turns = spark.createDataFrame(
        [
            ("c1", 0, "user", "find zebra stuff"),
            ("c1", 1, "assistant", "zebra zebra zebra"),  # not a prompt
            ("c2", 1, "user", "common only"),             # not turn 0
        ],
        "conv_id string, turn_idx int, role string, "
        "extracted_text string")
    docs = spark.createDataFrame(
        [
            (1, "zebra common common common", "en", "s", 0),
            (2, "common common common common", "en", "s", 0),
            (3, "stuff common common common", "en", "s", 0),
            (4, "nothing shared here at all", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    got = rag_retrieval(turns, docs, k=2).collect()
    assert {(r.conv_id, r.turn_idx) for r in got} == {("c1", 0)}
    ranked = sorted(got, key=lambda r: r.rank)
    assert len(ranked) == 2  # k bound (docs 1 and 3 match)
    # 'zebra' and 'stuff' have equal df (1 each) and both docs have
    # equal length -> symmetric scores; rank 1 breaks to doc_id 1
    assert [r.doc_id for r in ranked] == [1, 3]
    assert all(r.doc_id != 4 for r in ranked)
    assert ranked[0].score > 0


def test_leakage_check_planted_cross_split_pair(spark):
    """A planted near-dup pair whose members land in different splits
    must surface as a leaky row; a same-split near-dup pair counts
    but is not leaky. Split membership probed from split_assign so
    the test plants ids deterministically rather than guessing md5s."""
    from html_parser_spark.spark.ops import leakage_check, split_assign

    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau")
    # find ids in train and in test under the default salt
    ids = spark.createDataFrame(
        [(i, "x", "en", "s", 0) for i in range(400)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    splits = {r.doc_id: r.split
              for r in split_assign(ids).collect()}
    train_ids = [i for i, s in splits.items() if s == "train"]
    test_ids = [i for i, s in splits.items() if s == "test"]
    a, b = train_ids[0], test_ids[0]      # cross-split near-dups
    c, d = train_ids[1], train_ids[2]     # same-split near-dups
    rows = [
        (a, base, "en", "s", 0),
        (b, base + " tail", "en", "s", 0),
        (c, "one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen", "en", "s", 0),
        (d, "one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen end", "en", "s", 0),
        (train_ids[3], "totally different text here now", "en", "s", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    got = {(r.split_a, r.split_b): r
           for r in leakage_check(docs).collect()}
    assert got[("test", "train")].leaky
    assert got[("test", "train")].n_pairs == 1
    assert not got[("train", "train")].leaky
    assert got[("train", "train")].n_pairs == 1


def test_conv_pii_audit_planted(spark):
    """Planted PII: email/URL counts roll up per conversation, the
    carrying roles list sorted+deduped, the worst turn is the one
    with the most matches (ties to the later turn), and clean
    conversations report zeros with a NULL worst turn."""
    from html_parser_spark.spark.ops import conv_pii_audit

    rows = [
        ("a", 0, "user", "mail me at bob@example.com please"),
        ("a", 1, "assistant", "see https://x.test/1 and "
                              "https://y.test/2"),
        ("a", 2, "user", "nothing here"),
        ("b", 0, "user", "clean"), ("b", 1, "assistant", "also clean"),
        # c: equal counts on two turns -> worst is the LATER turn
        ("c", 0, "user", "a@b.co"), ("c", 1, "user", "c@d.co"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, "
              "extracted_text string")
    got = {r.conv_id: r for r in conv_pii_audit(turns).collect()}
    a = got["a"]
    assert (a.n_emails, a.n_urls, a.has_pii) == (1, 2, True)
    assert a.pii_roles == "assistant,user"
    assert a.worst_turn_idx == 1  # the 2-URL turn beats the 1-email
    b = got["b"]
    assert (b.n_emails, b.n_urls, b.has_pii) == (0, 0, False)
    assert b.worst_turn_idx is None and b.pii_roles == ""
    assert got["c"].worst_turn_idx == 1  # tie -> later turn


def test_mixture_weights_hand_built(spark):
    """Exact rational reweighting: weight = N_total / (k * N_lang),
    natural shares sum to 1, and the weighted expected counts
    equalize."""
    from html_parser_spark.spark.ops import mixture_weights

    rows = ([(i, "t", "en", "s", 0) for i in range(60)]
            + [(100 + i, "t", "fr", "s", 0) for i in range(30)]
            + [(200 + i, "t", "de", "s", 0) for i in range(10)])
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    got = {r.lang: r for r in mixture_weights(docs).collect()}
    assert got["en"].n_docs == 60 and got["en"].natural_frac == 0.6
    assert (got["en"].weight_num, got["en"].weight_den) == (100, 180)
    assert abs(got["en"].weight - round(100 / 180, 6)) < 1e-12
    assert abs(got["de"].weight - round(100 / 30, 6)) < 1e-12
    # weighted expected counts equalize: n_docs * weight == N/k
    for r in got.values():
        assert abs(r.n_docs * (r.weight_num / r.weight_den)
                   - 100 / 3) < 1e-9


def test_dedup_representatives_quality_argmax(spark):
    """The representative is the best-QUALITY member, not the lowest
    id: a planted cluster whose highest-quality member has the
    highest doc_id must keep that member; quality ties fall back to
    the smallest id."""
    from html_parser_spark.spark.ops import (
        dedup_representatives, quality_score,
    )

    # near-identical trio; doc 12 is padded into the 100-2000 char
    # quality band (length_score 1.0 vs 0.5) so it wins despite the
    # highest id
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away to find a quiet place to rest")
    long_tail = " ".join(["and so the story continues onward"] * 3)
    rows = [
        (10, base, "en", "s", 0),
        (11, base + " end", "en", "s", 0),
        (12, base + " " + long_tail, "en", "s", 0),
        (20, "completely unrelated text lives here", "en", "s", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    q = {r.doc_id: r.quality for r in quality_score(docs).collect()}
    assert q[12] > max(q[10], q[11])  # the plant is real
    got = dedup_representatives(docs, jaccard_threshold=0.5).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.cluster_root, r.n_members, r.rep_doc_id, r.n_dropped) \
        == (10, 3, 12, 2)
    assert abs(r.rep_quality - q[12]) < 1e-12


def test_jsonl_source_quarantine_and_roundtrip(spark, tmp_path):
    """JSONL boundary: clean lines come back schema-identical to the
    parquet source (same extraction results), malformed JSON and
    keyless records land in the quarantine frame verbatim-ish, and
    the ChatML JSONL sink round-trips through Spark's JSON reader."""
    import json

    from html_parser_spark.spark.jsonl import (
        read_transcripts_jsonl, write_chatml_jsonl,
    )
    from html_parser_spark.spark.pipeline import (
        extract_turns, render_chatml,
    )

    p = tmp_path / "in.jsonl"
    lines = [
        json.dumps({"conv_id": "a", "turn_idx": 0, "role": "user",
                    "text": "<p>hi</p>", "tool": None,
                    "ts": "2020-01-01T00:00:00"}),
        json.dumps({"conv_id": "a", "turn_idx": 1, "role": "assistant",
                    "text": "plain", "tool": None,
                    "ts": "2020-01-01T00:01:00"}),
        '{"this is not json',                       # malformed
        json.dumps({"role": "user", "text": "no keys"}),  # keyless
    ]
    p.write_text("\n".join(lines) + "\n")
    good, quarantined = read_transcripts_jsonl(spark, str(p))
    assert good.count() == 2
    assert good.columns == ["conv_id", "turn_idx", "role", "text",
                            "tool", "ts"]
    q = [r.raw_line for r in quarantined.collect()]
    assert len(q) == 2
    assert any("this is not json" in x for x in q)
    # the JSONL-sourced frame drives the SAME pipeline
    ext = extract_turns(good, ordered=False)
    got = {(r.conv_id, r.turn_idx): r.extracted_text
           for r in ext.collect()}
    assert got[("a", 0)] == "hi" and got[("a", 1)] == "plain"

    out = tmp_path / "out"
    write_chatml_jsonl(render_chatml(ext), str(out), shards=2)
    back = spark.read.json(str(out))
    rows = {r.conv_id: r for r in back.collect()}
    assert rows["a"].n_turns == 2
    assert rows["a"].chatml.startswith("<|im_start|>user\nhi<|im_end|>")


def test_random_corpus_cross_engine_parity(spark):
    """Randomized cross-engine equivalence (the fixed-oracle gate,
    generalized): hypothesis generates corpora and four document
    operators must match their own DuckDB oracle SQL on every one —
    through the SAME pandas canonicalization the grading driver uses.
    Catches edge semantics the curated test tables never produce
    (single-word docs, all-duplicate corpora, stopword-only text)."""
    import sys as _sys

    import duckdb
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                     "..", "tools"))
    from check_oracles import rows_to_set

    import __spark_entry__ as se
    from html_parser_spark.spark.ops import (
        exact_dedup, fingerprint, gopher_filter, token_stats,
    )

    oracles = se.oracle_sql()
    ops = {
        "token_stats": token_stats,
        "exact_dedup": exact_dedup,
        "gopher_filter": gopher_filter,
        "fingerprint": fingerprint,
    }
    vocab = ["the", "a", "of", "zebra", "supercalifragilistic", "x",
             "B", "42", "#", "...", "état"]

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(
        st.tuples(
            st.lists(st.sampled_from(vocab), min_size=1, max_size=40),
            st.sampled_from(["en", "fr", "zh"]),
        ),
        min_size=1, max_size=12,
    ))
    def check(corpus):
        rows = [(i, " ".join(ws), lg, "s", len(" ".join(ws)))
                for i, (ws, lg) in enumerate(corpus)]
        sdf = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, "
                  "source string, n_chars long")
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source",
                           "n_chars"])
        con = duckdb.connect()
        con.register("documents", pdf)
        for name, op in ops.items():
            got = op(sdf).toPandas()
            exp = con.execute(oracles[name]).df()
            assert sorted(got.columns) == sorted(exp.columns), name
            g = rows_to_set(list(got.columns),
                            list(got.itertuples(index=False, name=None)))
            e = rows_to_set(list(exp.columns),
                            list(exp.itertuples(index=False, name=None)))
            assert g == e, (name, g[:2], e[:2])

    check()


def test_dataset_card_and_source_quality_hand_built(spark):
    """The datasheet numbers recompute by hand on a tiny corpus:
    sizes, breadth, exact-dup rate (one duplicated text), decimal-
    exact mean quality, and Gopher keep counts — grouped per source
    in the dashboard view."""
    from html_parser_spark.spark.ops import (
        dataset_card, quality_score, source_quality,
    )

    ok = ("the quick brown fox jumps over a lazy dog and then runs "
          "far away to find a very quiet place to rest soon " * 1).strip()
    rows = [
        (1, ok, "en", "srcA", 0),
        (2, ok, "en", "srcA", 0),            # exact duplicate of 1
        (3, "too short", "en", "srcB", 0),   # gopher word_count fail
        (4, ok + " more words here", "fr", "srcB", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    card = dataset_card(docs).collect()[0]
    assert (card.n_docs, card.n_langs, card.n_sources) == (4, 2, 2)
    assert card.n_unique_texts == 3
    assert abs(card.exact_dup_rate - 0.25) < 1e-12
    assert card.n_tokens == sum(len(t.split(" ")) for _, t, *_ in rows)
    q = {r.doc_id: r.quality for r in quality_score(docs).collect()}
    from decimal import Decimal
    exp_mean = float(sum(Decimal(str(q[i])) for i in (1, 2, 3, 4)) / 4)
    assert abs(card.mean_quality - round(exp_mean, 6)) < 1e-9
    assert card.n_gopher_keep == 3  # doc 3 fails word_count
    sq = {r.source: r for r in source_quality(docs).collect()}
    assert sq["srcA"].n_docs == 2 and sq["srcA"].keep_rate == 1.0
    assert sq["srcB"].n_keep == 1 and abs(sq["srcB"].keep_rate - 0.5) < 1e-12


def test_r8_minhash_plan_has_no_join_or_docid_shuffle(spark):
    """r8 invariants of the LSH rewrite: candidate pairs come from ONE
    band-bucket aggregation (collect_list members) — no join node
    anywhere in the plan — and signatures are a pure per-row
    projection, so no doc_id-keyed exchange exists either (the r7
    form had a banded self-join, a width window, and an explode +
    32-min doc_id aggregate)."""
    from html_parser_spark.spark.ops import minhash_lsh_candidates

    docs = spark.createDataFrame(
        [(i, f"w{i} a b c d e f g h") for i in range(20)],
        "doc_id long, text string")
    plan = minhash_lsh_candidates(docs)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "Join" not in plan
    assert "collect_list" in plan
    phys = minhash_lsh_candidates(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "hashpartitioning(doc_id" not in phys


def test_r8_spread_by_noop_on_wide_scans(spark):
    """_spread_by hash-repartitions on the key ONLY when the scan has
    fewer partitions than cores — on an already-wide frame it must be
    an identity (the production-split no-op contract)."""
    from html_parser_spark.spark.ops import _spread_by

    wide = spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "event_id long, user_id long"
    ).repartition(spark.sparkContext.defaultParallelism + 4)
    out = _spread_by(wide, "user_id")
    # identity: _spread_by returns the input frame unchanged
    assert out is wide

    narrow = spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "event_id long, user_id long"
    ).coalesce(1)
    out2 = _spread_by(narrow, "user_id")
    # the keyed repartition is IN THE PLAN (AQE may coalesce the tiny
    # test shuffle back down at runtime — partition COUNT is not the
    # invariant, the hash distribution on the key is)
    plan = out2._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" in plan, plan
    # values unchanged
    assert sorted(tuple(r) for r in out2.collect()) == \
        sorted(tuple(r) for r in narrow.collect())


def test_r8_norm_lit_matches_expression_norm_bitwise(spark):
    """_norm_lit (the host-side literal-centroid norm fold) must equal
    the r7 per-row _norm(array(lits)) expression BIT-FOR-BIT — the
    IVF/PQ rewrite substitutes one for the other inside pinned-
    snapshot queries."""
    import random
    import struct

    from html_parser_spark.spark.ops import _norm, _norm_lit

    rng = random.Random(7)
    vecs = [[rng.uniform(-3, 3) for _ in range(13)] for _ in range(20)]
    for v in vecs:
        expr_val = spark.range(1).select(
            _norm(F.array(*[F.lit(x) for x in v])).alias("n")
        ).collect()[0].n
        host_val = _norm_lit(v)
        assert struct.pack("<d", expr_val) == struct.pack("<d", host_val)


def test_r8_components_fused_probe_counts_iterations(spark):
    """The fused convergence probe must report the same iteration
    count as the label-propagation depth (diameter + 1) and the same
    exact labels as driver-side union-find on a path graph."""
    from html_parser_spark.spark.ops import _components_min_label

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "doc_a long, doc_b long")
    stats = {}
    got = {(r.node, r.root) for r in _components_min_label(
        edges, collect_max_edges=0, stats=stats).collect()}
    assert stats["path"] == "distributed"
    assert stats["iterations"] == 7  # diameter 6 -> 7 rounds
    ref = {(r.node, r.root)
           for r in _components_min_label(edges).collect()}
    assert got == ref == {(i, 0) for i in range(7)}
