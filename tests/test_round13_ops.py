"""Round-13 operators: Count-Min heavy hitters and BPE pair-merge
counting — hand fixtures pinning the sketch arithmetic, the
over-estimate invariant, and the vocabulary-scale counting shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.operators.round13_ops import (
    _FP_MOD,
    _KNUTH,
    CMS_DEPTH,
    CMS_SEED_STRIDE,
    CMS_WIDTH,
    bpe_pair_merge,
    cms_bucket,
    countmin_heavy_hitters,
    countmin_sketch,
    term_counts,
    term_fingerprint,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _py_fp(term: str) -> int:
    acc = 0
    for ch in term:
        acc = (acc * 31 + ord(ch)) % _FP_MOD
    return acc


def _py_bucket(fp: int, j: int) -> int:
    return ((fp + j * CMS_SEED_STRIDE) * _KNUTH) % 2**32 % CMS_WIDTH


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_term_fingerprint_matches_python_and_bounded(spark):
    terms = ["a", "join", "zebra", "x" * 40]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r["term"]: r["fp"]
        for r in df.select("term", term_fingerprint("term").alias("fp")).collect()
    }
    for t in terms:
        assert got[t] == _py_fp(t)
        assert 0 <= got[t] < 2**30  # the no-overflow precondition


def test_term_fingerprint_unicode_parity_spark_duckdb_python(spark):
    """Both engines split by '' per CHARACTER (not byte) and return
    the full codepoint from ascii() — so the char-poly fingerprint is
    engine-identical even on multibyte unicode terms, and a non-ASCII
    corpus cannot silently break the oracle's byte-exactness."""
    import duckdb

    from nyc_taxi_data_clickhouse_spark.operators.round13_ops import _FP_SQL

    terms = ["naïve", "东京", "🚀x", "café"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r["term"]: r["fp"]
        for r in df.select("term", term_fingerprint("term").alias("fp")).collect()
    }
    con = duckdb.connect()
    for t in terms:
        assert got[t] == _py_fp(t), t
        (sql_fp,) = con.execute(
            f"SELECT {_FP_SQL} FROM (SELECT ? AS term)", [t]
        ).fetchone()
        assert sql_fp == _py_fp(t), t


def test_cms_bucket_matches_python(spark):
    df = spark.createDataFrame(
        [(fp, j) for fp in (0, 1, 96354, _FP_MOD - 1) for j in range(CMS_DEPTH)],
        "fp long, j long",
    )
    rows = df.select(
        "fp", "j", cms_bucket(F.col("fp"), F.col("j")).alias("b")
    ).collect()
    for r in rows:
        assert r["b"] == _py_bucket(r["fp"], r["j"])
        assert 0 <= r["b"] < CMS_WIDTH


def test_cms_estimate_never_underestimates(spark, tmp_path):
    # 300 distinct terms >> 64 buckets forces collisions in every row
    texts = [" ".join(f"term{i:03d}" for i in range(300))] * 2
    _docs(spark, texts).write.parquet(str(tmp_path / "documents.parquet"))
    out = countmin_heavy_hitters(spark, str(tmp_path)).collect()
    assert len(out) == 20
    assert all(r["over_ok"] for r in out)
    assert all(r["cms_estimate"] >= r["exact_cnt"] for r in out)


def test_cms_sketch_is_bounded_and_exact_without_collisions(spark):
    # 3 terms in 64 buckets: no collisions (verified via the python
    # model), so min over rows recovers the exact count
    counts = spark.createDataFrame(
        [("alpha", 5), ("beta", 3), ("gamma", 2)], "term string, cnt long"
    )
    buckets = {
        (j, _py_bucket(_py_fp(t), j))
        for t in ("alpha", "beta", "gamma")
        for j in range(CMS_DEPTH)
    }
    assert len(buckets) == 3 * CMS_DEPTH, "fixture must be collision-free"
    rows, sketch = countmin_sketch(counts)
    got = sketch.collect()
    assert len(got) <= CMS_DEPTH * CMS_WIDTH
    est = (
        rows.join(sketch, ["j", "bucket"])
        .groupBy("term", "cnt")
        .agg(F.min("counter").alias("e"))
        .collect()
    )
    assert {(r["term"], r["e"]) for r in est} == {
        ("alpha", 5), ("beta", 3), ("gamma", 2)
    }


def test_term_counts_tokenization_contract(spark, tmp_path):
    # \x0B is whitespace per the repo contract; empty docs drop
    texts = ["The\x0bthe THE", "  ", ""]
    _docs(spark, texts).write.parquet(str(tmp_path / "documents.parquet"))
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    got = {r["term"]: r["cnt"] for r in term_counts(docs).collect()}
    assert got == {"the": 3}


# ---------------------------------------------------------------------------
# BPE pair-merge counting
# ---------------------------------------------------------------------------


def test_bpe_pair_counts_hand_fixture(spark, tmp_path):
    # words: aaab x2, ab x1, z x1 (dropped: length 1)
    # aaab pairs: aa, aa, ab  -> x2 = aa:4, ab:2 ; ab adds ab:1
    _docs(spark, ["aaab ab z", "aaab"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = bpe_pair_merge(spark, str(tmp_path)).collect()
    assert [(r["rank"], r["pair"], r["cnt"]) for r in out] == [
        (1, "aa", 4),
        (2, "ab", 3),
    ]


def test_bpe_counts_weight_by_word_frequency_not_distinct(spark, tmp_path):
    # "xy" appears 5 times as a word: pair xy must count 5, not 1
    _docs(spark, ["xy xy xy", "xy xy"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = bpe_pair_merge(spark, str(tmp_path)).collect()
    assert [(r["pair"], r["cnt"]) for r in out] == [("xy", 5)]


def test_bpe_tie_break_is_total(spark, tmp_path):
    # ab and ba both appear twice: tie broken by pair ascending
    _docs(spark, ["ab ba", "ab ba"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = bpe_pair_merge(spark, str(tmp_path)).collect()
    assert [(r["rank"], r["pair"]) for r in out] == [(1, "ab"), (2, "ba")]


def test_round13_plans_are_vocab_scale(spark):
    """Plan hygiene: no cartesian, no Python eval, no sort-merge join,
    and the CMS sketch join is broadcast — the corpus-scale work is
    hash aggregation only."""
    import io
    from contextlib import redirect_stdout

    for fn, want_bhj in ((countmin_heavy_hitters, 1), (bpe_pair_merge, 0)):
        df = fn(spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        tree = buf.getvalue().split("\n\n")[0]
        assert "Cartesian" not in tree
        assert "EvalPython" not in tree
        assert "SortMergeJoin" not in tree
        assert tree.count("BroadcastHashJoin") == want_bhj
        # r14 (VERDICT r13 item 2): top-k must be TakeOrderedAndProject
        # (per-partition heaps) feeding a k-row ranking window — never
        # an unpartitioned window over the full vocabulary, which at
        # 100 TB funnels billions of distinct terms through ONE task
        assert "TakeOrderedAndProject" in tree
        win_at = tree.find("Window")
        top_at = tree.find("TakeOrderedAndProject")
        assert win_at != -1 and top_at != -1 and win_at < top_at, (
            "the ranking window must consume the limit's k survivors "
            "(formatted plans print parents before children)"
        )


try:
    from hypothesis import given, settings, strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    _corpora = st.lists(
        st.lists(
            st.text(alphabet="abcxyz0", min_size=1, max_size=6),
            min_size=0,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )

    def _via_parquet(spark, texts, fn):
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="r13_hyp_")
        try:
            _docs(spark, texts).write.parquet(f"{d}/documents.parquet")
            return fn(spark, d).collect()
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def _py_words(texts, min_len):
        import re
        from collections import Counter

        c = Counter()
        for t in texts:
            if not t.strip():
                continue
            for w in re.split(r"[ \t\n\x0B\f\r]+", t.strip().lower()):
                if len(w) >= min_len:
                    c[w] += 1
        return c

    @settings(max_examples=10, deadline=None)
    @given(_corpora)
    def test_bpe_matches_python_model_on_random_corpora(spark, texts):
        from collections import Counter

        words = _py_words(texts, 2)
        pairs = Counter()
        for w, n in words.items():
            for i in range(len(w) - 1):
                pairs[w[i : i + 2]] += n
        want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        got = [
            (r["pair"], r["cnt"])
            for r in sorted(
                _via_parquet(spark, texts, bpe_pair_merge),
                key=lambda r: r["rank"],
            )
        ]
        assert got == want

    @settings(max_examples=10, deadline=None)
    @given(_corpora)
    def test_cms_matches_python_model_on_random_corpora(spark, texts):
        from collections import defaultdict

        exact = _py_words(texts, 1)
        sketch = defaultdict(int)
        for t, n in exact.items():
            for j in range(CMS_DEPTH):
                sketch[(j, _py_bucket(_py_fp(t), j))] += n
        est = {
            t: min(sketch[(j, _py_bucket(_py_fp(t), j))] for j in range(CMS_DEPTH))
            for t in exact
        }
        want = [
            (t, exact[t], est[t], est[t] >= exact[t])
            for t in sorted(exact, key=lambda t: (-exact[t], t))[:20]
        ]
        got = [
            (r["term"], r["exact_cnt"], r["cms_estimate"], r["over_ok"])
            for r in sorted(
                _via_parquet(spark, texts, countmin_heavy_hitters),
                key=lambda r: r["rank"],
            )
        ]
        assert got == want
