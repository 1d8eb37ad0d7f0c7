"""Empty-input totality: every operator family must handle a
zero-row table gracefully (empty or empty-report result, never a deep
stage failure or schema-inference crash).

A fresh pipeline's tables ARE empty — ingest not yet run, a gold table
published with no partitions, a streaming source before the first
file — so this is the state every production deployment starts in.
A full registry sweep runs out-of-band (correctness_local-style probe);
this test pins the families that historically crashed (KMeans fit,
empty-partitioned-write readback, streaming staging) plus one
representative per family.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pyarrow.parquet as pq
import pytest

from nyc_taxi_data_clickhouse_spark import suite
from tests.conftest import SF_SMOKE

#: the five that crashed before the empty-input hardening, plus one
#: representative per operator family
PROBED = [
    # historically-crashing
    "ann_ivf_topk",
    "embedding_kmeans_clusters",
    "gold_partitioned_roundtrip",
    "pipeline_trips_e2e",
    "streaming_late_data_drop",
    # one per family
    "q1_group_count",
    "denormalize_join",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "near_dup_components_star",
    "text_tfidf_topk",
    "text_bm25_topk",
    "line_dedup_corpus",
    "vocab_oov_rate",
    "ann_topk_cosine",
    "window_rank",
    "streaming_hourly_rollup",
    "multimodal_video_frames",
    "zorder_layout_roundtrip",
    "compact_small_files",
    "asof_join",
    "tpch_q1_pricing_summary",
    # round-5 additions
    "exact_median_bracket",
    "substring_dup_fraction",
    "jsonl_ingest",
    "orc_roundtrip_identity",
    "streaming_session_window_append",
    "multimodal_progressive_jpeg",
    "mad_outliers",
    # round-9 additions
    "multimodal_y4m_video",
    "pii_scrub_documents",
    "url_canonical_dedup",
    "streaming_pii_scrub",
    # round-12/13 additions: iterative graph ops (empty edge set must
    # not break the checkpoint/count-gate path), the sketch family,
    # and the sampling pair
    "graph_pagerank",
    "graph_label_propagation",
    "weighted_sample_topk",
    "countmin_heavy_hitters",
    "bpe_pair_merge",
]


@pytest.fixture(scope="module")
def empty_sf():
    d = tempfile.mkdtemp(prefix="empty_sf_test_")
    for f in glob.glob(f"{SF_SMOKE}/*.parquet"):
        pq.write_table(pq.read_table(f).slice(0, 0), os.path.join(d, os.path.basename(f)))
    yield d
    # finalizer: bare return leaked one dir per pytest run (20 found
    # in /tmp during round 7)
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("name", PROBED)
def test_entry_total_on_empty_tables(spark, empty_sf, name):
    df = suite.registry()[name].spark(spark, empty_sf)
    # must evaluate without raising; row count is 0 or a small report
    assert df.count() <= 2
