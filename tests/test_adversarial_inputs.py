"""Adversarial-input totality: operators must survive the corruption
modes real corpora contain — empty/whitespace-only/single-token
documents (fewer tokens than the shingle width), unicode text, a
dominant duplicate, zero embedding vectors (failed encoder calls) and
identical vectors — without ANSI divide-by-zero, invalid slice starts,
or NaN/Inf in the output.

These exact inputs crashed 9 operators before the hardening pass:
``sequence(1, 0)`` counts DOWN in Spark, feeding ``slice`` the invalid
start 0 for sub-n-token docs, and a zero vector made every cosine an
ANSI DIVIDE_BY_ZERO.
"""

from __future__ import annotations

import glob
import math
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nyc_taxi_data_clickhouse_spark import suite
from tests.conftest import SF_SMOKE

PROBED = [
    # cosine family (zero vectors)
    "ann_topk_cosine",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "dedup_embedding_cosine",
    # shingle family (sub-n-token docs)
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "near_dup_components",
    "near_dup_components_star",
    "contamination_ngram",
    # text ops on empty/unicode text
    "text_quality",
    "line_dedup_corpus",
    "unigram_surprisal",
    "term_cooccurrence",
    "bigram_surprisal",
    # round-5: sub-k-char docs (no 20-grams), unicode grams, and the
    # empty/whitespace texts through JSONL staging
    "substring_dup_fraction",
    "jsonl_ingest",
    # round-9: PII regexes over empty/unicode text; url canon over the
    # unchanged doc_id synthesis (text adversaries can't break it, but
    # the entry must stay total alongside the mutated documents table)
    "pii_scrub_documents",
    "url_canonical_dedup",
    # round-12/13: the rule filter's integer cross-multiplications and
    # the sketch/tokenizer pair's char-level hashing over empty,
    # whitespace-only, single-token, and multibyte-unicode documents
    "quality_rule_filter",
    "countmin_heavy_hitters",
    "bpe_pair_merge",
]


@pytest.fixture(scope="module")
def adversarial_sf():
    d = tempfile.mkdtemp(prefix="adv_sf_test_")
    for f in glob.glob(f"{SF_SMOKE}/*.parquet"):
        pq.write_table(pq.read_table(f), os.path.join(d, os.path.basename(f)))

    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    texts = docs["text"].to_pylist()
    adv = []
    for i in range(len(texts)):
        adv.append(
            {
                0: "",
                1: "   ",
                2: "solo",
                3: "naïve café 东京 🚀 ligne",
                4: "dup dup dup the same boiler plate text body here",
            }.get(i % 7, texts[i])
        )
    cols = {n: docs[n].to_pylist() for n in docs.schema.names}
    cols["text"] = adv
    pq.write_table(
        pa.table(cols, schema=docs.schema), os.path.join(d, "documents.parquet")
    )

    emb = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    vecs = emb["embedding"].to_pylist()
    dim = len(vecs[0])
    for i in range(len(vecs)):
        if i % 5 == 0:
            vecs[i] = [0.0] * dim  # zero vector: no direction
        elif i % 5 == 1:
            vecs[i] = [1.0] + [0.0] * (dim - 1)  # identical cluster
    ecols = {n: emb[n].to_pylist() for n in emb.schema.names}
    ecols["embedding"] = vecs
    pq.write_table(
        pa.table(ecols, schema=emb.schema), os.path.join(d, "embeddings.parquet")
    )
    yield d
    # finalizer, not bare return: this fixture leaked one dir per
    # pytest run (23 found in /tmp during round 7) — same class as
    # the VERDICT r6 staging leak
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("name", PROBED)
def test_entry_total_on_adversarial_inputs(spark, adversarial_sf, name):
    df = suite.registry()[name].spark(spark, adversarial_sf)
    rows = df.limit(100).collect()  # must evaluate without raising
    for r in rows:
        for k, v in r.asDict().items():
            if isinstance(v, float):
                assert not math.isnan(v) and not math.isinf(v), (name, k, v)


def test_zero_vector_cosine_is_zero(spark):
    from nyc_taxi_data_clickhouse_spark.operators.dedup import cosine
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([0.0, 0.0], [0.0, 0.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    vals = [r[0] for r in df.select(cosine(F.col("a"), F.col("b"))).collect()]
    assert vals == [0.0, 0.0, 1.0]


def test_sub_n_token_docs_have_no_shingles(spark):
    from nyc_taxi_data_clickhouse_spark.operators.dedup import shingles
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("",), ("one",), ("one two",), ("one two three",)], "text string"
    )
    sizes = [r[0] for r in df.select(F.size(shingles("text", 3))).collect()]
    assert sizes == [0, 0, 0, 1]
