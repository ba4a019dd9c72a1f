"""LLM-pipeline operator semantics that the DuckDB oracle can't
check: approximate methods vs their exact ground truth, and the
pandas-UDF multimodal kernel."""

import pytest

from aws_datalake_framework_api_spark.queries_all import QUERIES


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_minhash_recall_vs_exact(spark, sf_dir):
    """LSH-banded MinHash must (a) emit NO false positives (it reranks
    with exact Jaccard) and (b) recall ≥90% of the exact pairs at the
    16x2 band setting (theory: ≈99% at s=0.5)."""
    exact = _pairs(QUERIES["b_llm_dedup_ngram"](spark, sf_dir))
    approx = _pairs(QUERIES["b_llm_dedup_minhash"](spark, sf_dir))
    assert approx <= exact, f"false positives: {approx - exact}"
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.9, f"recall {recall:.2f} < 0.9"


def test_fuzzy_md5_recall_vs_exact(spark, sf_dir):
    """The oracle-verifiable md5 variant (b_llm_dedup_fuzzy) keeps the
    same no-false-positive + recall guarantees as the xxhash64 one —
    only the hash family differs, not the banding math."""
    exact = _pairs(QUERIES["b_llm_dedup_ngram"](spark, sf_dir))
    approx = _pairs(QUERIES["b_llm_dedup_fuzzy"](spark, sf_dir))
    assert approx <= exact, f"false positives: {approx - exact}"
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.9, f"recall {recall:.2f} < 0.9"


def test_neardup_lsh_vs_exact(spark, sf_dir):
    """LSH-bucketed near-dup reranks candidates with the exact cosine
    kernel, so emitted pairs ⊆ exact all-pairs output (precision 1.0
    by construction); bucketing only costs recall."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["b_llm_neardup_cosine"](spark, sf_dir).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["b_llm_neardup_lsh"](spark, sf_dir).collect()
    }
    assert approx <= exact, f"false positives: {approx - exact}"
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.5, f"near-dup recall {recall:.2f} unusably low"


def test_knn_lsh_recall_vs_brute(spark, sf_dir):
    """LSH ANN: every reported neighbor must be a real corpus vector
    with correctly-computed cosine (spot-checked via the exact top-5),
    and union-of-4-tables recall vs brute force must be usable."""
    exact = QUERIES["b_llm_knn"](spark, sf_dir)
    approx = QUERIES["b_llm_knn_lsh"](spark, sf_dir)
    e = {(r["q_id"], r["n_id"]): r["cos_sim"] for r in exact.collect()}
    a = {(r["q_id"], r["n_id"]): r["cos_sim"] for r in approx.collect()}
    # cosines agree exactly where the pair appears in both
    for k in set(e) & set(a):
        assert e[k] == a[k], f"cosine mismatch for {k}: {e[k]} vs {a[k]}"
    recall = len(set(e) & set(a)) / len(e)
    # multi-probe (home bucket + six 1-bit flips) lifts the 4x6-bit
    # setting from 0.18 to 0.54 (sf0.001) / 0.72 (sf0.01); floor
    # with margin so a probe-generation regression can't hide.
    assert recall >= 0.4, f"ANN recall {recall:.2f} below the multi-probe floor"


def test_knn_ivf_recall_vs_brute(spark, sf_dir):
    """IVF ANN: cosines must agree exactly with brute force where a
    pair appears in both, and recall must beat the data-agnostic LSH
    floor — the quantizer adapts to the fixture's label clusters."""
    exact = QUERIES["b_llm_knn"](spark, sf_dir)
    approx = QUERIES["b_llm_knn_ivf"](spark, sf_dir)
    e = {(r["q_id"], r["n_id"]): r["cos_sim"] for r in exact.collect()}
    a = {(r["q_id"], r["n_id"]): r["cos_sim"] for r in approx.collect()}
    for k in set(e) & set(a):
        assert e[k] == a[k], f"cosine mismatch for {k}: {e[k]} vs {a[k]}"
    recall = len(set(e) & set(a)) / len(e)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below the 16x4 floor"


def test_simhash64_banding_lossless_for_hamming_3(spark, sf_dir):
    """The 4×16-bit banded probe must emit EXACTLY the pairs within
    Hamming ≤ 3 of each other — pigeonhole makes candidate generation
    lossless at that threshold, and the rerank makes it exact.  Proven
    by brute-forcing the full pair space over collected signatures."""
    from itertools import combinations

    from aws_datalake_framework_api_spark.llm.dedup import (
        HAMMING_MAX,
        simhash64_signatures,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    sigs = {r["doc_id"]: r["sig"] for r in simhash64_signatures(docs).collect()}
    expect = {
        (a, b): bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")
        for a, b in combinations(sorted(sigs), 2)
        if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= HAMMING_MAX
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in QUERIES["b_llm_dedup_simhash64"](spark, sf_dir).collect()
    }
    assert got == expect


def test_simhash64_vs_exact_ngram(spark, sf_dir):
    """SimHash approximates cosine on bags-of-words, a different
    metric than 3-gram Jaccard, so against the n-gram ground truth it
    gets usable-but-not-perfect agreement; this pins the measured
    floor (sf0.001: recall 0.75 / precision 0.78; sf0.01: 0.60/0.88)
    so a construction regression can't hide."""
    exact = _pairs(QUERIES["b_llm_dedup_ngram"](spark, sf_dir))
    sh = _pairs(QUERIES["b_llm_dedup_simhash64"](spark, sf_dir))
    assert exact and sh
    inter = len(exact & sh)
    assert inter / len(exact) >= 0.5, f"recall {inter / len(exact):.2f}"
    assert inter / len(sh) >= 0.6, f"precision {inter / len(sh):.2f}"


def test_simhash64_exact_dups_at_hamming_zero(spark, sf_dir):
    """Exact duplicate texts have identical signatures, so every
    exact-dup pair must be emitted with hamming = 0."""
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    dup_sets = (
        docs.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .collect()
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in QUERIES["b_llm_dedup_simhash64"](spark, sf_dir).collect()
    }
    # (vacuous when the fixture SF carries no byte-identical texts —
    # the lossless-banding test above still pins hamming-0 behavior)
    for row in dup_sets:
        ids = sorted(row["ids"])
        for a, b in zip(ids, ids[1:]):
            assert got.get((a, b)) == 0, f"exact dups {a},{b} not at hamming 0"


def test_decontamination_flags_planted_overlap(spark):
    """A corpus doc embedding 10 consecutive tokens of an eval doc
    must be flagged with exactly 3 shared 8-grams (10-8+1 windows);
    an unrelated doc must not appear."""
    import pandas as pd

    from aws_datalake_framework_api_spark.llm.dedup import contamination_pairs

    run = "a b c d e f g h i j"  # 10 tokens -> 3 distinct 8-grams
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [f"xx yy {run} zz ww", "p q r s t u v w x y z"],
            }
        )
    )
    eval_docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [f"mm {run} nn"]})
    )
    got = {
        (r["doc_id"], r["eval_id"]): r["n_shared"]
        for r in contamination_pairs(corpus, eval_docs).collect()
    }
    assert got == {(1, 100): 3}


def test_simhash_buckets_contain_exact_dups(spark, sf_dir):
    """Exact duplicate texts must land in the same simhash bucket."""
    from aws_datalake_framework_api_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    dup_sets = (
        docs.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .collect()
    )
    sh = {r["doc_id"]: r["simhash"] for r in QUERIES["b_llm_dedup_simhash"](spark, sf_dir).collect()}
    for row in dup_sets:
        hashes = {sh[i] for i in row["ids"]}
        assert len(hashes) == 1, f"exact dups split across buckets: {row['ids']}"


def test_mm_features_deterministic_and_typed(spark, sf_dir):
    """The mapInPandas kernel streams Arrow batches and returns the
    declared schema with deterministic values across runs."""
    df1 = QUERIES["b_mm_features"](spark, sf_dir)
    assert [f.name for f in df1.schema.fields] == [
        "doc_id", "mime", "payload_len", "first_byte", "byte_sum_mod", "n_frames",
        "width", "height", "px_mode", "decoded",
    ]
    r1 = sorted((r["doc_id"], r["byte_sum_mod"], r["n_frames"]) for r in df1.collect())
    r2 = sorted(
        (r["doc_id"], r["byte_sum_mod"], r["n_frames"])
        for r in QUERIES["b_mm_features"](spark, sf_dir).collect()
    )
    assert r1 == r2 and len(r1) > 0


def test_mm_feature_kernel_both_codec_branches():
    """Both kernel branches (codec present / absent) must produce the
    SAME byte-derived features and a stable schema, and the codec
    branch must degrade per-row (decoded=0, NULL dims) on undecodable
    payloads instead of raising — the VERDICT r3 codec landmine."""
    import sys
    import types

    import pandas as pd

    from aws_datalake_framework_api_spark.llm.multimodal import make_feature_kernel

    batch = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "mime": ["application/x-fixture-a", "application/x-fixture-b"],
            "payload": [b"hello world " * 10, b""],
            "payload_len": [120, 0],
        }
    )

    def run(have_codec):
        out = list(make_feature_kernel(have_codec)([batch.copy()]))
        assert len(out) == 1
        return out[0]

    no_codec = run(False)
    assert list(no_codec["decoded"]) == [0, 0]
    assert list(no_codec["byte_sum_mod"]) == [sum(b"hello world " * 10) % 1000003, 0]
    assert no_codec["first_byte"][0] == ord("h")
    assert pd.isna(no_codec["first_byte"][1])

    # codec branch, payloads undecodable (utf-8 text): a REAL PIL (if
    # ever installed) and this fake both raise per-image — either way
    # the kernel must emit the same NULL-decoded rows, never raise.
    fake_pil = types.ModuleType("PIL")
    fake_image = types.ModuleType("PIL.Image")

    def _open_fail(fp):
        raise OSError("cannot identify image file")

    fake_image.open = _open_fail
    fake_pil.Image = fake_image
    saved = {k: sys.modules.get(k) for k in ("PIL", "PIL.Image")}
    sys.modules["PIL"] = fake_pil
    sys.modules["PIL.Image"] = fake_image
    try:
        with_codec_fail = run(True)
        # and a fake that DOES decode: dims/mode must flow through
        class _Im:
            size = (640, 480)
            mode = "RGB"

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        fake_image.open = lambda fp: _Im()
        with_codec_ok = run(True)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    for col in ("byte_sum_mod", "n_frames", "decoded"):
        assert list(with_codec_fail[col]) == list(no_codec[col]), col
    assert all(pd.isna(v) for v in with_codec_fail["width"])

    assert list(with_codec_ok["decoded"]) == [1, 1]
    assert list(with_codec_ok["width"]) == [640, 640]
    assert list(with_codec_ok["height"]) == [480, 480]
    assert list(with_codec_ok["px_mode"]) == ["RGB", "RGB"]
    # byte features identical regardless of decode outcome
    assert list(with_codec_ok["byte_sum_mod"]) == list(no_codec["byte_sum_mod"])


def test_tokenization_is_oracle_byte_identical(spark):
    """Spark tokenization must split on a single literal space exactly
    like the oracle's string_split — including empty tokens from runs
    of spaces (parity must not depend on single-spaced fixtures)."""
    import duckdb

    from aws_datalake_framework_api_spark.llm.text import _ws_tokens
    from pyspark.sql import functions as F

    texts = ["a  b", " lead", "trail ", "a\tb", "one two"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r[0] for r in df.select(_ws_tokens(F.col("text"))).collect()]
    want = [
        duckdb.sql("SELECT string_split(trim(?), ' ')", params=[t]).fetchone()[0]
        for t in texts
    ]
    assert got == want


def test_dedup_clusters_consistent_with_pairs(spark, sf_dir):
    """Every near-dup pair must land in one cluster; canonical = the
    min doc_id of its component; singletons are their own cluster."""
    labels = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in QUERIES["b_llm_dedup_clusters"](spark, sf_dir).collect()
    }
    pairs = QUERIES["b_llm_dedup_fuzzy"](spark, sf_dir).collect()
    for r in pairs:
        assert labels[r["doc_a"]][0] == labels[r["doc_b"]][0]
    for doc_id, (cluster_id, canon) in labels.items():
        assert cluster_id <= doc_id
        assert canon == (1 if cluster_id == doc_id else 0)


def test_curation_stage_consistency(spark, sf_dir):
    """The curation composition must agree with the standalone stage
    operators: one row per document; keep = AND of the four flags;
    reason names the first failing stage; cluster labels match
    b_llm_dedup_clusters; contaminated docs are exactly the distinct
    doc_ids of b_llm_decontaminate."""
    rows = {r["doc_id"]: r for r in QUERIES["b_llm_curation"](spark, sf_dir).collect()}
    n_docs = QUERIES["b_llm_dedup_clusters"](spark, sf_dir).count()
    assert len(rows) == n_docs

    cluster = {
        r["doc_id"]: r["cluster_id"]
        for r in QUERIES["b_llm_dedup_clusters"](spark, sf_dir).collect()
    }
    contaminated = {
        r["doc_id"] for r in QUERIES["b_llm_decontaminate"](spark, sf_dir).collect()
    }
    boiler_keep = {
        r["doc_id"]: r["keep"]
        for r in QUERIES["b_llm_boilerplate"](spark, sf_dir).collect()
    }
    order = [
        ("q_keep", "quality"),
        ("rep_keep", "repetition"),
        ("boiler_keep", "boilerplate"),
        ("decon_keep", "contaminated"),
        ("canonical", "duplicate"),
    ]
    for doc_id, r in rows.items():
        flags = [
            r["q_keep"],
            r["rep_keep"],
            r["boiler_keep"],
            r["decon_keep"],
            r["canonical"],
        ]
        assert r["boiler_keep"] == boiler_keep.get(doc_id, 1)
        assert all(f in (0, 1) for f in flags)
        assert r["keep"] == int(all(flags))
        expect = next((why for col, why in order if r[col] == 0), "keep")
        assert r["reason"] == expect
        assert r["cluster_id"] == cluster[doc_id]
        assert r["decon_keep"] == (0 if doc_id in contaminated else 1)
        assert r["canonical"] == (1 if doc_id == cluster[doc_id] else 0)

    kept = sum(r["keep"] for r in rows.values())
    assert 0 < kept < n_docs  # the pass both keeps and drops at this SF


def test_incr_dedup_consistent_with_fuzzy(spark, sf_dir):
    """Incremental arrival-vs-index dedup must agree with the full
    fuzzy pair set: an arrival has n_dup_matches = the number of fuzzy
    pairs linking it to an index doc (same banding, same rerank), and
    every arrival appears exactly once."""
    from aws_datalake_framework_api_spark.llm.dedup import INCR_ARRIVAL_MOD

    fuzzy = _pairs(QUERIES["b_llm_dedup_fuzzy"](spark, sf_dir))
    cross = {}
    for a, b in fuzzy:
        for arr, idx in ((a, b), (b, a)):
            if arr % INCR_ARRIVAL_MOD == 0 and idx % INCR_ARRIVAL_MOD != 0:
                cross[arr] = cross.get(arr, 0) + 1
    rows = {r["doc_id"]: r for r in QUERIES["b_llm_dedup_incr"](spark, sf_dir).collect()}
    assert all(d % INCR_ARRIVAL_MOD == 0 for d in rows)
    for doc_id, r in rows.items():
        assert r["n_dup_matches"] == cross.get(doc_id, 0)
        assert r["is_new"] == (0 if doc_id in cross else 1)


def test_mix_rebalances_to_smallest_stratum(spark, sf_dir):
    """Domain mixture: every stratum's kept token count lands near the
    smallest stratum's budget (hash-mod sampling is binomial around
    p = min/lang); the smallest stratum itself keeps everything."""
    rows = {r["lang"]: r for r in QUERIES["b_llm_mix"](spark, sf_dir).collect()}
    min_tok = min(r["n_tokens"] for r in rows.values())
    for lang, r in rows.items():
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert r["kept_tokens"] <= r["n_tokens"]
        if r["n_tokens"] == min_tok:
            assert r["n_kept"] == r["n_docs"]  # bucket*tok < 256*tok always
        # binomial slack: 3 sigma ≈ 3*sqrt(n*p) docs * avg doc len; be loose
        assert abs(r["kept_tokens"] - min_tok) < 0.5 * min_tok + 200


def test_shuffle_is_a_partitioned_permutation(spark, sf_dir):
    """Epoch shuffle: every doc appears once, pos is dense 0..n-1 per
    shard, and the permutation is deterministic across reruns."""
    out1 = {(r["doc_id"], r["shard"], r["pos"])
            for r in QUERIES["b_llm_shuffle"](spark, sf_dir).collect()}
    out2 = {(r["doc_id"], r["shard"], r["pos"])
            for r in QUERIES["b_llm_shuffle"](spark, sf_dir).collect()}
    assert out1 == out2
    docs = [t[0] for t in out1]
    assert len(docs) == len(set(docs))
    by_shard = {}
    for _, shard, pos in out1:
        by_shard.setdefault(shard, []).append(pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))


def test_blocklist_redaction_is_complete(spark, sf_dir):
    """Redacted text must contain no word-boundary blocklist hit, and
    n_blocked must equal the redaction count; the fixture must exercise
    both keep=1 and keep=0 paths (non-vacuous)."""
    import re

    from aws_datalake_framework_api_spark.llm.text import BLOCKLIST, REDACTION

    pat = re.compile(r"\b(" + "|".join(BLOCKLIST) + r")\b")
    rows = QUERIES["b_llm_blocklist"](spark, sf_dir).collect()
    assert {r["keep"] for r in rows} == {0, 1}
    for r in rows:
        assert not pat.search(r["red_text"]), r["doc_id"]
        assert r["n_blocked"] == r["red_text"].count(REDACTION)


def test_shingle_store_equals_recompute(spark, sf_dir, tmp_path, monkeypatch):
    """The opt-in parquet shingle store (SPARK_GRAFT_SHINGLE_STORE,
    the 100 TB one-corpus-pass path) must change nothing about the
    dedup output — same pairs, same jaccards — and must materialize
    exactly one store directory per corpus across consecutive dedup
    queries (the reuse that makes it one pass)."""
    import os

    from aws_datalake_framework_api_spark.llm import dedup

    base_ngram = _pairs(QUERIES["b_llm_dedup_ngram"](spark, sf_dir))
    base_fuzzy = _pairs(QUERIES["b_llm_dedup_fuzzy"](spark, sf_dir))

    monkeypatch.setenv("SPARK_GRAFT_SHINGLE_STORE", str(tmp_path))
    dedup._SHINGLE_STORES.clear()
    try:
        stored_ngram = _pairs(QUERIES["b_llm_dedup_ngram"](spark, sf_dir))
        stored_fuzzy = _pairs(QUERIES["b_llm_dedup_fuzzy"](spark, sf_dir))
        stores = [d for d in os.listdir(tmp_path) if d.startswith("shingles_")]
    finally:
        dedup._SHINGLE_STORES.clear()

    assert stored_ngram == base_ngram
    assert stored_fuzzy == base_fuzzy
    assert len(stores) == 1, stores
    # full 64-bit key in the dir name (32-bit truncation invited
    # cross-corpus collisions in a shared root, ADVICE r3)
    assert len(stores[0]) == len("shingles_") + 16, stores[0]


def test_shingle_store_rejects_partial_write(spark, sf_dir, tmp_path, monkeypatch):
    """A crash mid-write leaves a store dir without parquet's _SUCCESS
    commit marker — reuse must be gated on the marker, so the partial
    dir is REWRITTEN, never served (ADVICE r3: a partial store silently
    yields wrong dedup pairs forever)."""
    import os

    from aws_datalake_framework_api_spark.llm import dedup
    from aws_datalake_framework_api_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    key = docs.semanticHash() & 0xFFFFFFFFFFFFFFFF
    partial = tmp_path / f"shingles_{key:016x}"
    partial.mkdir()
    (partial / "part-00000.parquet").write_bytes(b"truncated garbage")

    monkeypatch.setenv("SPARK_GRAFT_SHINGLE_STORE", str(tmp_path))
    dedup._SHINGLE_STORES.clear()
    try:
        stored = dedup.shared_shingle_set(docs)
        n = stored.count()
    finally:
        dedup._SHINGLE_STORES.clear()
    assert n == dedup.shingle_set(docs).count() > 0
    assert os.path.isfile(partial / "_SUCCESS")


def test_leakage_split_never_straddles_pairs(spark, sf_dir):
    """The cluster-keyed split must put every fuzzy near-dup pair on
    ONE side of the train/val/test boundary; the doc-keyed split on
    the same data must straddle at least one pair (proving the
    cluster key is doing real work, not vacuously agreeing)."""
    pairs = _pairs(QUERIES["b_llm_dedup_fuzzy"](spark, sf_dir))
    assert pairs, "fixture has no near-dup pairs; exhibit is vacuous"

    safe = {
        r["doc_id"]: r["split"]
        for r in QUERIES["b_llm_split_leakage"](spark, sf_dir).collect()
    }
    naive = {
        r["doc_id"]: r["split"]
        for r in QUERIES["b_llm_sample"](spark, sf_dir).collect()
    }
    straddled_safe = [(a, b) for a, b in pairs if safe[a] != safe[b]]
    straddled_naive = [(a, b) for a, b in pairs if naive[a] != naive[b]]
    assert straddled_safe == [], straddled_safe
    assert straddled_naive, "doc-keyed split never straddles: test is vacuous"


def test_mix_epochs_bounds_and_target(spark, sf_dir):
    """Capped-epoch upsampling: every stratum repeats between 1 and
    EPOCH_CAP whole epochs; the largest stratum is emitted exactly
    once with no fractional top-up; uncapped strata land within one
    document of the target token budget."""
    from aws_datalake_framework_api_spark.llm.sampling import EPOCH_CAP

    rows = {r["lang"]: r for r in QUERIES["b_llm_mix_epochs"](spark, sf_dir).collect()}
    target = max(r["n_tokens"] for r in rows.values())
    for lang, r in rows.items():
        assert 1 <= r["epochs"] <= EPOCH_CAP, (lang, r)
        assert (
            r["emitted_tokens"] >= r["epochs"] * r["n_tokens"]
        ), (lang, r)
    top = max(rows.values(), key=lambda r: r["n_tokens"])
    assert top["epochs"] == 1 and top["n_extra_docs"] == 0
    assert top["emitted_tokens"] == top["n_tokens"]
    for lang, r in rows.items():
        if r["epochs"] < EPOCH_CAP:
            # the hash-mod top-up is a per-doc Bernoulli draw at the exact
            # remainder rate; allow binomial wobble around the target
            assert r["emitted_tokens"] <= 2 * target, (lang, r, target)


def test_hll_parts_union_close_to_exact(spark, sf_dir):
    """The per-day-sketch → union estimate must land within HLL error
    bounds of the exact per-type distinct user count (default
    lgConfigK=12 → ~1.6% rsd; assert 5%), and must actually exercise
    the merge path (more than one day per type)."""
    import pyspark.sql.functions as F

    from aws_datalake_framework_api_spark.sources.readers import load_table

    got = {
        r["event_type"]: r
        for r in QUERIES["b_agg_hll_parts"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, r in got.items():
        assert r["n_days"] > 1, "union path not exercised"
        assert r["n_exact_users"] == exact[et]
        assert r["hll_ok"] == 1, (et, exact[et])


def test_contrastive_triples_valid(spark, sf_dir):
    """Every mined triple: positive is a real fuzzy pair, the negative
    is a valid corpus doc distinct from both anchor and positive, and
    the draw is deterministic across runs."""
    from aws_datalake_framework_api_spark.sources.readers import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    pairs = _pairs(QUERIES["b_llm_dedup_fuzzy"](spark, sf_dir))
    rows = QUERIES["b_llm_contrastive"](spark, sf_dir).collect()
    assert rows, "no triples mined; exhibit vacuous"
    for r in rows:
        assert (r["anchor"], r["positive"]) in pairs
        assert 0 <= r["negative"] < n_docs
        assert r["negative"] not in (r["anchor"], r["positive"])
    again = {
        (r["anchor"], r["positive"], r["negative"])
        for r in QUERIES["b_llm_contrastive"](spark, sf_dir).collect()
    }
    assert again == {(r["anchor"], r["positive"], r["negative"]) for r in rows}


def test_surprisal_band_non_degenerate(spark, sf_dir):
    """The perplexity-band filter must both keep and drop at fixture
    scale, and mean_bits must equal sum_bits/n_tok exactly."""
    rows = QUERIES["b_llm_surprisal"](spark, sf_dir).collect()
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows), (kept, len(rows))
    for r in rows:
        assert r["mean_bits"] == r["sum_bits"] / r["n_tok"]


def test_sample_exact_hits_per_stratum_budget(spark, sf_dir):
    """Exact-count sampling must return exactly min(CAP, n_lang) docs
    per language with ranks 1..k, and be identical across runs."""
    from collections import Counter

    import pyspark.sql.functions as F

    from aws_datalake_framework_api_spark.llm.sampling import EXACT_CAP
    from aws_datalake_framework_api_spark.sources.readers import load_table

    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = QUERIES["b_llm_sample_exact"](spark, sf_dir).collect()
    got = Counter(r["lang"] for r in rows)
    assert got == {l: min(EXACT_CAP, n) for l, n in totals.items()}
    for lang in got:
        ranks = sorted(r["rank"] for r in rows if r["lang"] == lang)
        assert ranks == list(range(1, got[lang] + 1))
    again = {(r["doc_id"], r["rank"]) for r in QUERIES["b_llm_sample_exact"](spark, sf_dir).collect()}
    assert again == {(r["doc_id"], r["rank"]) for r in rows}


def test_emb_quant_matches_numpy_and_error_bound(spark, sf_dir):
    """SQ8 quantization must reproduce the numpy reference exactly
    (same codes) and honor the half-step reconstruction bound
    max_abs_err <= (hi-lo)/2/255 per vector (+1 ulp slack)."""
    import hashlib

    import numpy as np

    from aws_datalake_framework_api_spark.llm.similarity import (
        QUANT_LEVELS,
        emb_quant_codes,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").collect()
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    ids = [r["vec_id"] for r in emb]
    lo, hi = X.min(axis=0), X.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    want_codes = {
        ids[j]: [int(np.floor((X[j, i] - lo[i]) / span[i] * QUANT_LEVELS + 0.5))
                 for i in range(X.shape[1])]
        for j in range(len(ids))
    }
    rows = emb_quant_codes(spark, sf_dir).collect()
    assert len(rows) == len(ids)
    half_step = (span / QUANT_LEVELS / 2).max() * (1 + 1e-12)
    for r in rows:
        assert list(r["codes"]) == want_codes[r["vec_id"]], r["vec_id"]
        assert 0 <= r["max_abs_err"] <= half_step, (r["vec_id"], r["max_abs_err"])

    # The REGISTERED query is the canon-safe audit view: scalar columns
    # only (no arrays — the CORRECTNESS_r03 crash class), and its
    # codes_hash must equal md5 of the comma-joined operator codes.
    audit = QUERIES["b_llm_emb_quant"](spark, sf_dir)
    assert not any("array" in f.dataType.simpleString() for f in audit.schema.fields)
    arows = {r["vec_id"]: r for r in audit.collect()}
    assert len(arows) == len(ids)
    probe = ids[0]
    want_hash = hashlib.md5(
        ",".join(str(c) for c in want_codes[probe]).encode()
    ).hexdigest()
    assert arows[probe]["codes_hash"] == want_hash
    assert all(r["n_dims"] == X.shape[1] for r in arows.values())


def test_bloom_gate_no_false_negatives(spark, sf_dir):
    """Bloom structural guarantee: every arrival whose exact text IS
    in the index must hit the filter (bloom_hit >= exact_member row by
    row); is_fp is exactly the hit-but-not-member residue; and at the
    fixture's fill factor (~1e-6 fp rate) false positives are absent."""
    rows = QUERIES["b_llm_bloom_gate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["bloom_hit"] >= r["exact_member"], r
        assert r["is_fp"] == int(r["bloom_hit"] == 1 and r["exact_member"] == 0), r
    assert sum(r["is_fp"] for r in rows) == 0
    # membership must agree exactly with a recomputed ground truth —
    # and when the fixture's exact-dup sets straddle the arrival/index
    # split, the gate must actually fire (not vacuously all-miss)
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.llm.dedup import INCR_ARRIVAL_MOD
    from aws_datalake_framework_api_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    idx_texts = {
        r["text"]
        for r in docs.filter(F.col("doc_id") % INCR_ARRIVAL_MOD != 0).collect()
    }
    arr_text = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id") % INCR_ARRIVAL_MOD == 0).collect()
    }
    want_members = {d for d, t in arr_text.items() if t in idx_texts}
    assert {r["doc_id"] for r in rows if r["exact_member"] == 1} == want_members


def test_chunk_dedup_matches_python_reference(spark, sf_dir):
    """Span dedup vs an independent Python reference implementation:
    identical chunking, identical global-first-occurrence election
    (ordered by (doc_id, chunk_idx)), identical n_dropped and
    reassembled kept_text for EVERY document — plus planted exact-dup
    docs proving the fully-dropped case (empty kept_text)."""
    from aws_datalake_framework_api_spark.llm.chunks import CHUNK_WORDS
    from aws_datalake_framework_api_spark.sources.readers import load_table

    rows = {r["doc_id"]: r for r in QUERIES["b_llm_dedup_chunks"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    texts = {r["doc_id"]: r["text"].strip() for r in docs.collect()}
    assert set(rows) == set(texts)

    def chunks_of(text):
        t = text.split(" ")
        return [
            " ".join(t[i * CHUNK_WORDS:(i + 1) * CHUNK_WORDS])
            for i in range((max(len(t), 1) + CHUNK_WORDS - 1) // CHUNK_WORDS)
        ]

    seen: set[str] = set()
    fully_dropped = 0
    for d in sorted(texts):
        src = chunks_of(texts[d])
        kept, dropped = [], 0
        for c in src:
            if c in seen:
                dropped += 1
            else:
                seen.add(c)
                kept.append(c)
        r = rows[d]
        assert r["n_chunks"] == len(src), d
        assert r["n_dropped"] == dropped, d
        assert r["kept_text"] == " ".join(kept), d
        if dropped == len(src):
            fully_dropped += 1
            assert r["kept_text"] == ""
    # the fixture must actually exercise duplication (near-dup docs
    # share spans even when no doc is a byte-identical twin)
    assert sum(r["n_dropped"] for r in rows.values()) > 0


def test_chunk_dedup_planted_exact_dup_is_fully_dropped(spark):
    """A byte-identical later doc must lose every span and reassemble
    to the empty string; a half-overlapping doc loses exactly its
    duplicated spans."""
    import pandas as pd

    from aws_datalake_framework_api_spark.llm.chunks import CHUNK_WORDS, llm_dedup_chunks
    from unittest import mock

    a = " ".join(f"w{i}" for i in range(CHUNK_WORDS * 2))  # 2 chunks
    b = a  # exact dup of a
    half = " ".join(f"w{i}" for i in range(CHUNK_WORDS)) + " " + " ".join(
        f"z{i}" for i in range(CHUNK_WORDS)
    )  # chunk 1 dups a's first chunk, chunk 2 is novel
    frame = pd.DataFrame({"doc_id": [1, 2, 3], "text": [a, b, half]})

    with mock.patch(
        "aws_datalake_framework_api_spark.llm.chunks.load_table",
        lambda spark_, sf_, name: spark_.createDataFrame(frame),
    ):
        got = {r["doc_id"]: r for r in llm_dedup_chunks(spark, "ignored").collect()}
    assert got[1]["n_dropped"] == 0 and got[1]["kept_text"] == a
    assert got[2]["n_dropped"] == 2 and got[2]["kept_text"] == ""
    assert got[3]["n_dropped"] == 1
    assert got[3]["kept_text"] == " ".join(f"z{i}" for i in range(CHUNK_WORDS))


def test_pii_detects_and_redacts_completely(spark, sf_dir):
    """Every planted row carries exactly one email and one phone; the
    redacted text must contain NO remaining pattern match (checked
    with Python's re as a third engine)."""
    import re

    from aws_datalake_framework_api_spark.llm.chunks import PII_EMAIL, PII_PHONE

    rows = QUERIES["b_llm_pii"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_emails"] == 1 and r["n_phones"] == 1, r
        assert "<EMAIL>" in r["redacted"] and "<PHONE>" in r["redacted"]
        assert not re.search(PII_EMAIL, r["redacted"]), r["redacted"]
        assert not re.search(PII_PHONE, r["redacted"]), r["redacted"]


def test_bpe_pairs_match_python_reference(spark, sf_dir):
    """The BPE pair statistic vs a direct Python count: identical
    top-K pairs, counts, and deterministic tie-broken ranking."""
    from collections import Counter

    from aws_datalake_framework_api_spark.llm.text import BPE_TOP_K
    from aws_datalake_framework_api_spark.sources.readers import load_table

    counts = Counter()
    for r in load_table(spark, sf_dir, "documents").collect():
        for w in r["text"].strip().split(" "):
            for i in range(len(w) - 1):
                counts[w[i:i + 2]] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_K]
    got = [
        (r["pair"], r["n"])
        for r in QUERIES["b_llm_bpe_pairs"](spark, sf_dir)
        .orderBy("rnk")
        .collect()
    ]
    assert got == want


def test_bigram_surprisal_matches_python_reference(spark, sf_dir):
    """Integer-bits bigram surprisal vs a direct Python recompute of
    the corpus bigram LM (exact floor-log2 via int.bit_length)."""
    from collections import Counter

    from aws_datalake_framework_api_spark.sources.readers import load_table

    texts = {
        r["doc_id"]: r["text"].strip().split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    cbw, cp = Counter(), Counter()
    for toks in texts.values():
        for a, b in zip(toks, toks[1:]):
            cbw[(a, b)] += 1
            cp[a] += 1
    want = {}
    for doc_id, toks in texts.items():
        if len(toks) < 2:
            continue
        bits = [
            (cp[a] // cbw[(a, b)]).bit_length() - 1
            for a, b in zip(toks, toks[1:])
        ]
        want[doc_id] = (len(bits), sum(bits))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_bits"])
        for r in QUERIES["b_llm_surprisal2"](spark, sf_dir).collect()
    }
    assert got == want


def test_tfidf_stopwords_score_zero_and_ranks_dense(spark, sf_dir):
    """A term present in every document has idf_bits = 0 ⇒ score 0;
    per-source ranks are dense 1..k."""
    from pyspark.sql import functions as F

    out = QUERIES["b_llm_tfidf"](spark, sf_dir).cache()
    # ranks dense per source
    per_src = out.groupBy("source").agg(
        F.min("rnk").alias("lo"), F.max("rnk").alias("hi"), F.count("*").alias("k")
    )
    assert (
        per_src.filter(
            (F.col("lo") != 1) | (F.col("hi") != F.col("k"))
        ).count()
        == 0
    )
    # every reported score is tf * floor(log2(N/df)) recomputed exactly
    from aws_datalake_framework_api_spark.sources.readers import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    for r in out.collect():
        assert r["score"] == r["tf"] * ((n_docs // r["df"]).bit_length() - 1)
    out.unpersist()


def test_rag_chunks_tile_documents_with_overlap(spark, sf_dir):
    """Chunk geometry: starts advance by the stride, the final chunk
    reaches the end of the document, interior chunks are full-size,
    and consecutive chunks overlap by CHUNK−STRIDE chars."""
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.llm.chunks import (
        RAG_CHUNK_CHARS,
        RAG_STRIDE,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    lens = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    out = {}
    for r in QUERIES["b_llm_chunk_rag"](spark, sf_dir).collect():
        out.setdefault(r["doc_id"], []).append(r)
    assert set(out) == {d for d, n in lens.items() if n >= 1}
    for doc_id, rows in out.items():
        rows.sort(key=lambda r: r["chunk_id"])
        n = lens[doc_id]
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        assert len(rows) == (n - 1) // RAG_STRIDE + 1
        for r in rows[:-1]:
            start_next = (r["chunk_id"] + 1) * RAG_STRIDE + 1
            covered_to = r["start"] + r["chunk_chars"] - 1
            # next start never skips past covered span (overlap ≥ 0)
            assert start_next <= covered_to + 1
        last = rows[-1]
        assert last["start"] + last["chunk_chars"] - 1 == n


def test_semantic_dedup_recall_and_precision(spark, sf_dir):
    """SemDeDup drops ⊆ exact droppable set (every drop carries a
    cos ≥ τ witness ⇒ precision 1.0) and catches ≥90% of it (2-probe
    cell assignment covers single-boundary straddles)."""
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.llm.semantic import SEM_TAU

    exact = {
        r["vec_id"]
        for r in QUERIES["b_llm_neardup_cosine"](spark, sf_dir)
        .filter(F.col("cos_sim") >= SEM_TAU)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .collect()
    }
    sem = QUERIES["b_llm_dedup_semantic"](spark, sf_dir).cache()
    dropped = {r["vec_id"] for r in sem.filter(F.col("keep") == 0).collect()}
    assert dropped <= exact, f"false positives: {dropped - exact}"
    if exact:
        recall = len(dropped & exact) / len(exact)
        assert recall >= 0.9, f"recall {recall:.2f} < 0.9"
    # every vector verdicts exactly once, witnesses are lower ids
    n_emb = QUERIES["b_llm_dedup_semantic"](spark, sf_dir).count()
    assert sem.select("vec_id").distinct().count() == n_emb
    bad_witness = sem.filter(
        (F.col("keep") == 0) & (F.col("dup_with") >= F.col("vec_id"))
    ).count()
    assert bad_witness == 0
    sem.unpersist()


def test_semantic_dedup_drops_planted_duplicate_cluster(spark, sf_dir):
    """Planted check on a corpus THIS test builds: near-identical
    vectors (tiny deterministic jitter on one base direction) must
    collapse to one kept representative regardless of which k-means
    cell they land in."""
    import numpy as np
    import pandas as pd

    from aws_datalake_framework_api_spark.llm import semantic as sem_mod

    rng_free = []  # deterministic, no RNG: unit axes + jittered clones
    dim = 64
    for i in range(40):  # background: spread-out one-hot-ish vectors
        v = np.zeros(dim)
        v[i % dim] = 1.0
        v[(i * 7 + 3) % dim] = 0.5
        rng_free.append((i, v))
    base = np.ones(dim) / np.sqrt(dim)
    for j in range(5):  # planted near-dup cluster: ids 1000+j
        v = base.copy()
        v[j] += 0.001 * (j + 1)
        rng_free.append((1000 + j, v))
    pdf = pd.DataFrame(
        {
            "vec_id": [i for i, _ in rng_free],
            "embedding": [v.astype("float32") for _, v in rng_free],
            "label": [0] * len(rng_free),
        }
    )
    df = spark.createDataFrame(pdf)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/embeddings.parquet")
        out = sem_mod.llm_dedup_semantic(spark, td).collect()
    verdict = {r["vec_id"]: r for r in out}
    planted = [verdict[1000 + j] for j in range(5)]
    kept = [r for r in planted if r["keep"] == 1]
    assert len(kept) == 1 and kept[0]["vec_id"] == 1000
    for r in planted:
        if r["keep"] == 0:
            assert r["dup_with"] == 1000


def test_pca_fit_matches_direct_numpy(spark, sf_dir):
    """The merged-partials fit must equal numpy's direct covariance
    eigendecomposition on the collected matrix (projection subspace
    compared via per-column |cos| ≈ 1, robust to sign), and captured
    variance must dominate any random k-subset."""
    import numpy as np

    from aws_datalake_framework_api_spark.llm.projection import (
        PCA_K,
        _fit_pca,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    X = np.stack(
        [np.asarray(r[0], dtype=np.float64) for r in emb.select("embedding").collect()]
    )
    mu_d = X.mean(axis=0)
    cov_d = (X - mu_d).T @ (X - mu_d) / len(X)
    vals_d, vecs_d = np.linalg.eigh(cov_d)
    W_direct = vecs_d[:, ::-1][:, :PCA_K]

    mu, W, vals = _fit_pca(emb)
    assert np.allclose(mu, mu_d, atol=1e-9)
    assert np.allclose(np.sort(vals), np.sort(vals_d), atol=1e-9)
    cos = np.abs((W * W_direct).sum(axis=0))
    assert np.all(cos > 1 - 1e-7), f"subspace mismatch: {cos}"


def test_pca_projection_is_partitioning_invariant(spark, sf_dir):
    """proj_hash/norm2 must not depend on the number of input
    partitions (the content-sorted partial reduce)."""
    from aws_datalake_framework_api_spark.llm import projection as proj_mod
    from aws_datalake_framework_api_spark.sources.readers import load_table

    base = {
        (r["vec_id"], r["proj_hash"], r["norm2_x1e6"])
        for r in QUERIES["b_llm_pca"](spark, sf_dir).collect()
    }
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    with tempfile.TemporaryDirectory() as td:
        emb.repartition(13).write.parquet(f"{td}/embeddings.parquet")
        again = {
            (r["vec_id"], r["proj_hash"], r["norm2_x1e6"])
            for r in proj_mod.llm_pca(spark, td).collect()
        }
    assert base == again


def test_rp_preserves_norms_in_expectation(spark, sf_dir):
    """JL contract: E[||Px||^2] = ||x||^2 for the Rademacher/sqrt(k)
    matrix — the corpus-mean ratio must sit near 1 (loose band: k=16
    has ~1/sqrt(k) per-vector noise that averages out over the
    corpus)."""
    import numpy as np
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.llm.projection import RP_K
    from aws_datalake_framework_api_spark.sources.readers import load_table

    proj = QUERIES["b_llm_rp"](spark, sf_dir)
    p_cols = [f"p{j}" for j in range(RP_K)]
    p_norm2 = proj.select(
        "vec_id",
        sum(F.col(c) * F.col(c) for c in p_cols).alias("pn2"),
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.aggregate(
            F.transform("embedding", lambda v: v.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("xn2"),
    )
    r = (
        p_norm2.join(emb, "vec_id")
        .agg(F.sum("pn2").alias("sp"), F.sum("xn2").alias("sx"))
        .first()
    )
    ratio = r["sp"] / r["sx"]
    assert 0.8 < ratio < 1.25, f"norm ratio {ratio}"


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """The distributed trainer's merge table vs a pure-python BPE on
    the same corpus: exact equality of (rank, left, right, n)."""
    from collections import Counter

    from aws_datalake_framework_api_spark.llm.bpe import BPE_MERGES
    from aws_datalake_framework_api_spark.sources.readers import load_table

    wc = Counter()
    for r in load_table(spark, sf_dir, "documents").collect():
        for w in r["text"].strip().split(" "):
            if w:
                wc[w] += 1
    vocab = {w: list(w) for w in wc}
    want = []
    for rank in range(1, BPE_MERGES + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, a, b, n))
        merged = a + b
        for w, syms in vocab.items():
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            vocab[w] = res
    got = [
        (r["rank"], r["left"], r["right"], r["n"])
        for r in QUERIES["b_llm_bpe_train"](spark, sf_dir).orderBy("rank").collect()
    ]
    assert got == want


def test_bpe_encode_matches_python_reference(spark, sf_dir):
    """Per-doc token counts under the trained tokenizer vs a pure
    python train+encode on the same corpus: exact equality."""
    from collections import Counter

    from aws_datalake_framework_api_spark.llm.bpe import (
        BPE_MERGES,
        _apply_merges,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    wc = Counter()
    for text in texts.values():
        for w in text.strip().split(" "):
            if w:
                wc[w] += 1
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(BPE_MERGES):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), _n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        for w in vocab:
            vocab[w] = _apply_merges(vocab[w], [(a, b)])
    want = {}
    for doc_id, text in texts.items():
        toks = chars = 0
        for w in text.strip().split(" "):
            if w:
                toks += len(_apply_merges(list(w), merges))
                chars += len(w)
        want[doc_id] = (toks, chars, chars * 1000 // toks if toks else None)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_chars"], r["chars_per_tok_x1000"])
        for r in QUERIES["b_llm_bpe_encode"](spark, sf_dir).collect()
    }
    assert got == want


def test_mix_tokens_matches_python_recompute_from_encode(spark, sf_dir):
    """The tokenizer-denominated rebalance recomputed in python from
    the (already exactness-pinned) encode output: per-lang totals,
    keep counts, and kept-token sums must match exactly."""
    import hashlib

    from aws_datalake_framework_api_spark.llm.sampling import MIX_SALT
    from aws_datalake_framework_api_spark.sources.readers import load_table

    langs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    }
    toks = {
        r["doc_id"]: r["n_tokens"]
        for r in QUERIES["b_llm_bpe_encode"](spark, sf_dir).collect()
    }
    lang_tokens = {}
    for d, n in toks.items():
        lang_tokens[langs[d]] = lang_tokens.get(langs[d], 0) + n
    min_tokens = min(lang_tokens.values())
    want = {}
    for d, n in toks.items():
        lang = langs[d]
        idx = int(
            hashlib.md5(f"{MIX_SALT}:{d}".encode()).hexdigest()[:2], 16
        )
        keep = idx * lang_tokens[lang] < 256 * min_tokens
        w = want.setdefault(lang, [0, 0, 0, 0])
        w[0] += 1
        w[1] += n
        if keep:
            w[2] += 1
            w[3] += n
    got = {
        r["lang"]: [r["n_docs"], r["n_tokens"], r["n_kept"], r["kept_tokens"]]
        for r in QUERIES["b_llm_mix_tokens"](spark, sf_dir).collect()
    }
    assert got == want


def test_winnowing_guarantee_on_planted_shared_span(spark):
    """SIGMOD-2003 winnowing guarantee: documents sharing a character
    run well past k+w-1 MUST surface as a pair; unrelated docs with no
    >=k-char common substring must NOT."""
    import pandas as pd

    from aws_datalake_framework_api_spark.llm import winnow as wmod

    shared = "the quick brown fox jumps over the lazy dog repeatedly tonight"
    docs = [
        (0, "AAAA0" * 20 + shared + "BBBB1" * 20),
        (1, "CCCC2" * 20 + shared + "DDDD3" * 20),
        # unrelated filler: distinct char alphabets, no 8-char overlap
        (2, "eeee4ffff5" * 30),
        (3, "gggg6hhhh7" * 30),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [d for d, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(f"{td}/documents.parquet")
        pairs = {
            (r["doc_a"], r["doc_b"]): r["n_shared"]
            for r in wmod.llm_dedup_winnow(spark, td).collect()
        }
    assert (0, 1) in pairs, pairs
    # the repeated fillers self-match WITHIN a doc (irrelevant) but
    # docs 2 and 3 share no 8-char substring -> never paired
    assert (2, 3) not in pairs
    assert not any({2, 3} & set(k) and {0, 1} & set(k) for k in pairs)


def test_prefix_join_equals_exact_ngram(spark, sf_dir):
    """Prefix filtering is LOSSLESS: the PPJoin-style candidate
    generator must reproduce the naive exact join's pairs exactly —
    same pairs, same Jaccard values — at its own t=0.8 threshold
    (the naive join reports at 0.5, so its output is filtered to the
    prefix op's band before comparing)."""
    from aws_datalake_framework_api_spark.llm.dedup import PREFIX_THRESHOLD
    from aws_datalake_framework_api_spark.queries_all import QUERIES

    exact = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in QUERIES["b_llm_dedup_ngram"](spark, sf_dir).collect()
        if r.jaccard >= PREFIX_THRESHOLD
    }
    pref = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in QUERIES["b_llm_dedup_prefix"](spark, sf_dir).collect()
    }
    assert pref == exact
    assert len(exact) > 0


def test_prefix_join_lossless_on_adversarial_corpus(spark, tmp_path):
    """Losslessness on a corpus engineered to have pairs ON and AROUND
    the t=0.8 threshold (the driver fixture's near-dups all sit at
    J>=0.9, so it cannot catch a prefix bug that loses or leaks
    borderline pairs).  Docs are word sequences sharing controlled
    fractions of their shingles; both exact paths must agree pair-for-
    pair and value-for-value at the prefix op's threshold."""
    import random

    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.llm.dedup import (
        PREFIX_THRESHOLD,
        _jaccard_pairs,
        shared_shingle_set,
    )

    rng = random.Random(421)
    vocab = [f"w{i}" for i in range(400)]
    docs = []
    base_id = 0
    # families of documents sharing long runs: mutate k tail words of
    # a 40-word base, k swept so Jaccard lands across 0.5..1.0
    for fam in range(25):
        base = [rng.choice(vocab) for _ in range(40)]
        docs.append((base_id, " ".join(base)))
        base_id += 1
        for k in (1, 2, 4, 6, 9, 13):
            mut = list(base)
            for i in range(k):
                mut[-(i * 3 + 1)] = rng.choice(vocab)
            docs.append((base_id, " ".join(mut)))
            base_id += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sf = str(tmp_path / "adv")
    import os

    os.makedirs(sf, exist_ok=True)
    df.select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.length("text").alias("n_chars"),
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

    exact = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in _jaccard_pairs(
            shared_shingle_set(
                spark.read.parquet(os.path.join(sf, "documents.parquet"))
            ),
            threshold=PREFIX_THRESHOLD,
        ).collect()
    }
    pref = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in QUERIES["b_llm_dedup_prefix"](spark, sf).collect()
    }
    assert pref == exact
    # the corpus must actually exercise the borderline band
    assert any(PREFIX_THRESHOLD <= j < 0.9 for j in exact.values()), exact
    assert len(exact) > 50


def test_prefix_join_keeps_exact_boundary_pair(spark, tmp_path):
    """ADVICE-r4 regression: a pair at EXACTLY J = t with the
    positional bound EXACTLY at the overlap requirement must survive.
    Doc A = 37 distinct words (35 tri-gram shingles), doc B = A's
    30-word prefix (28 shingles, all shared): J = 28/35 = 0.8 and
    sz_a + sz_b = 63 is divisible by 9, so the float forms both
    over-prune — ceil(35 * 0.8) = 29 > 28 kills it in the length
    filter (IEEE 35*0.8 = 28.000000000000004) and
    ceil(63 * (0.8/1.8)) = 29 > best_ub = 28 kills it in the
    positional filter (0.8/1.8 = 0.4444444444444445 > 4/9).  Only
    the exact integer cross-multiplication keeps it."""
    import os

    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.queries_all import QUERIES

    words = [f"u{i:03d}" for i in range(37)]
    doc_a = " ".join(words)
    doc_b = " ".join(words[:30])
    df = spark.createDataFrame(
        [(0, doc_a), (1, doc_b)], "doc_id long, text string"
    )
    sf = str(tmp_path / "boundary")
    os.makedirs(sf, exist_ok=True)
    df.select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.length("text").alias("n_chars"),
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["b_llm_dedup_prefix"](spark, sf).collect()
    }
    assert (0, 1) in pairs, pairs
    assert abs(pairs[(0, 1)] - 0.8) < 1e-12


def test_sketch_scorecards_hold_invariants(spark, sf_dir):
    """CM never underestimates (one-sided error is the sketch's
    guarantee, not luck); the AMS F2 mean lands within the documented
    band of exact on the fixture."""
    cm = QUERIES["b_agg_cmsketch"](spark, sf_dir).collect()
    assert cm and all(r["never_underestimates"] == 1 for r in cm)
    f2 = QUERIES["b_agg_f2sketch"](spark, sf_dir).collect()[0]
    mean_est = f2["est_f2_sum"] / f2["n_rows"]
    assert abs(mean_est - f2["exact_f2"]) / f2["exact_f2"] < 0.6


def test_exact_substr_scores_planted_shared_span(spark):
    """ExactSubstr semantics (b_llm_dedup_substr): a K-token span
    planted verbatim in two documents makes BOTH docs' dup_win
    positive and exactly counts the shared windows; a doc sharing
    nothing scores 0 and never flags."""
    import pandas as pd
    import tempfile

    from aws_datalake_framework_api_spark.llm import substr as smod

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = [
        (0, "u0 v0 w0 x0 " + shared + " y0 z0"),
        (1, "u1 v1 w1 x1 " + shared + " y1 z1"),
        (2, "m0 m1 m2 m3 m4 m5 m6 m7 m8 m9 n0 n1"),  # no shared window
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [d for d, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(f"{td}/documents.parquet")
        rows = {
            r["doc_id"]: r for r in smod.llm_dedup_substr(spark, td).collect()
        }
    # docs 0/1: 14 tokens -> 7 windows each; ONLY the pure-shared
    # window (positions 5..12 == the planted 8 tokens) exists in both
    assert rows[0]["dup_win"] == 1 and rows[1]["dup_win"] == 1
    assert rows[0]["n_win"] == 7
    assert rows[2]["dup_win"] == 0 and rows[2]["dup_flag"] == 0


def test_char_entropy_orders_text_above_padding(spark):
    """Character entropy (b_llm_char_entropy): constant padding scores
    0 bits and is dropped; natural-ish text clears the 1.5-bit keep
    floor."""
    import pandas as pd
    import tempfile

    from aws_datalake_framework_api_spark.llm import corpus_stats as cmod

    docs = [
        (0, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),  # one symbol: 0 bits
        (1, "the quick brown fox jumps over the lazy dog"),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [d for d, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(f"{td}/documents.parquet")
        rows = {
            r["doc_id"]: r for r in cmod.llm_char_entropy(spark, td).collect()
        }
    assert rows[0]["sum_bits"] == 0 and rows[0]["keep"] == 0
    assert rows[1]["mean_bits"] > 1.5 and rows[1]["keep"] == 1
    assert rows[1]["n_distinct"] > rows[0]["n_distinct"] == 1


def test_pq_recall_vs_exact(spark, sf_dir):
    """PQ-ADC ANN recall against the brute-force baseline clears the
    scorecard floor (50%) with the margin the gate relies on."""
    exact = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["b_llm_knn"](spark, sf_dir).collect()
    }
    approx = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["b_llm_knn_pq"](spark, sf_dir).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f} < 0.5"


def test_exact_substr_hash_shuffle_is_output_equivalent(spark, sf_dir):
    """The xxhash64 shuffle-compression switch (SUBSTR_HASH_SHUFFLE,
    the 100 TB shuffle-bytes knob) must not change a single output row
    vs the oracle-checked string plan."""
    from aws_datalake_framework_api_spark.llm.substr import llm_dedup_substr

    base = {
        r["doc_id"]: (r["n_win"], r["dup_win"], r["dup_flag"])
        for r in llm_dedup_substr(spark, sf_dir, hash_shuffle=False).collect()
    }
    hashed = {
        r["doc_id"]: (r["n_win"], r["dup_win"], r["dup_flag"])
        for r in llm_dedup_substr(spark, sf_dir, hash_shuffle=True).collect()
    }
    assert base == hashed


def test_jaccard_rerank_array_branch_equals_join_branch(spark, sf_dir):
    """r11 optimization pin: _jaccard_pairs' candidate-restricted
    rerank (per-doc shingle arrays + array_intersect) must return
    exactly what the exact all-pairs join branch returns when EVERY
    ordered pair is a candidate.  A collect_list/array_intersect
    semantics drift (duplicate handling, null handling, a lost pair
    with zero intersection) fails here before it can skew any
    MinHash/fuzzy/PPJoin output."""
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.llm.dedup import (
        _jaccard_pairs,
        shared_shingle_set,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 300
    )
    s = shared_shingle_set(docs)
    ids = s.select("doc_id").distinct()
    cand = (
        ids.select(F.col("doc_id").alias("doc_a"))
        .crossJoin(ids.select(F.col("doc_id").alias("doc_b")))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    got = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in _jaccard_pairs(s, cand=cand).collect()
    }
    want = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in _jaccard_pairs(s).collect()
    }
    assert got == want
    assert want, "adversarial corpus produced no pairs — test is vacuous"
