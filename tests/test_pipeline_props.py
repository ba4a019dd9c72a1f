"""Invariant tests for the corpus-construction operators — properties
the DuckDB oracle equality can't express (completeness, stability
under subsetting, bijectivity)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from aws_datalake_framework_api_spark.queries_all import QUERIES
from aws_datalake_framework_api_spark.sources.readers import load_table


def test_pack_assigns_every_doc_exactly_once(spark, sf_dir):
    """Packing must partition the corpus: every document lands in
    exactly one (shard, sequence); token totals are conserved."""
    from aws_datalake_framework_api_spark.llm.sampling import PACK_SHARDS

    packed = QUERIES["b_llm_pack"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in packed) == n_docs
    total_tok = docs.select(
        F.sum(F.size(F.split(F.trim(F.col("text")), " ")))
    ).collect()[0][0]
    assert sum(r["seq_tokens"] for r in packed) == total_tok
    assert {r["shard"] for r in packed} <= set(range(PACK_SHARDS))
    # doc ranges within a shard never overlap across sequences
    by_shard = {}
    for r in sorted(packed, key=lambda r: (r["shard"], r["seq_in_shard"])):
        last = by_shard.get(r["shard"])
        if last is not None:
            assert r["first_doc"] > last
        by_shard[r["shard"]] = r["last_doc"]


def test_split_assignment_is_row_local(spark, sf_dir):
    """A doc's split depends ONLY on its own id (salted md5) — never
    on the rest of the corpus, partitioning, or run — the property
    rand()-based splits lack.  Recomputed per-doc in pure Python and
    compared exactly."""
    import hashlib

    from aws_datalake_framework_api_spark.llm.sampling import (
        SPLIT_SALT,
        TRAIN_HI,
        VAL_HI,
    )

    got = {
        r["doc_id"]: r["split"]
        for r in QUERIES["b_llm_sample"](spark, sf_dir).collect()
    }
    assert len(got) > 0
    for doc_id, split in got.items():
        b = hashlib.md5(f"{SPLIT_SALT}:{doc_id}".encode()).hexdigest()[:2]
        want = "train" if b <= TRAIN_HI else ("val" if b <= VAL_HI else "test")
        assert split == want, (doc_id, b, split, want)


@settings(max_examples=200, deadline=None)
@given(u=st.integers(0, 255), d=st.integers(0, 255))
def test_zorder_interleave_bijective(u, d):
    """The Morton interleave must be invertible: distinct (u, d) pairs
    map to distinct z-values and de-interleave back exactly."""
    z = 0
    for i in range(8):
        z += ((u >> i) & 1) << (2 * i)
        z += ((d >> i) & 1) << (2 * i + 1)
    uu = sum(((z >> (2 * i)) & 1) << i for i in range(8))
    dd = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
    assert (uu, dd) == (u, d)
    assert 0 <= z < 65536


@settings(max_examples=100, deadline=None)
@given(i=st.integers(0, 31))
def test_minhash_subhash_mapping_bijective(i):
    """Each of the 32 subhash slots maps to a unique (md5 group,
    substring window) — no two minhashes read the same hex span."""
    from aws_datalake_framework_api_spark.llm.dedup import _sub, _N_MD5

    g, start = _sub(i)
    assert 0 <= g < _N_MD5
    assert start in (1, 9, 17, 25)
    others = {(_sub(j)) for j in range(32) if j != i}
    assert (g, start) not in others
