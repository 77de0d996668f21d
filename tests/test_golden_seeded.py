"""Exact golden checks for the seeded probabilistic queries.

These queries are registered WITHOUT a DuckDB oracle (their output
depends on the model — minhash permutations, hyperplane draws,
k-means codebooks, HLL sketch internals — not on SQL-expressible
semantics), so the driver records only a rows-only check.  But under
their FIXED seeds they are fully deterministic, so each one also gets
an exact regression pin: the sf0.01 result frozen as parquet in
tests/golden/ (generated once via the same query functions;
regenerate deliberately when a seed or algorithm changes, never to
paper over a diff).

This upgrades the ENTIRE no-oracle family from bounds checks to exact
equality, per-row and per-value — every registered query is now
either oracle-checked or golden-pinned.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from dados_publicos_etl_spark.plans import QUERIES
from dados_publicos_etl_spark.plans import catalog  # noqa: F401  (registers queries)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
from tests.conftest import SF_CORRECT

GOLDEN_SF_DIR = SF_CORRECT

SEEDED_QUERIES = [
    # round 6: dedup_minhash_lsh and dedup_simhash moved OUT of this
    # list — their hashing is now portable (md5 + universal-hash
    # arithmetic), so the full pipelines are DuckDB-oracle-checked in
    # test_oracle_differential instead of golden-pinned.
    # round 7: similarity_ann_lsh, dedup_embedding_ann and
    # contrastive_pair_mining moved OUT — their bucketing is now the
    # portable md5-Rademacher sign projection over int64-quantized
    # vectors, so the full LSH-ANN paths are DuckDB-oracle-checked.
    # round 8: similarity_ivf, similarity_ivf_persisted, similarity_pq,
    # similarity_ivfpq (and stream_ann_probe, pinned elsewhere) moved
    # OUT — the IVF/PQ quantizers now train with integer-exact Lloyd
    # over Spark-SQL milli-quantized vectors from a hash-ordered
    # sample, so the full ANN paths are DuckDB-oracle-checked via
    # unrolled Lloyd CTEs (the kmeans_lloyd_exact pattern).
    # pinned in round 4: the remaining no-oracle entries
    "approx_sketches",       # HLL++/quantile sketches, engine-deterministic
    "hll_sketch_merge",      # sketch merge == whole, engine-deterministic
    # round 8: multimodal_audio_segments moved OUT — the oracle now
    # replays the int16-LE byte reinterpretation via get_bit over the
    # BLOB bitstring; per-segment RMS/ZCR stay pytest-exact on
    # segment_audio.
    # round 7: dedup_minhash_incremental moved OUT — its hashing now
    # shares dedup_minhash_lsh's portable construction, so the probe
    # math is DuckDB-oracle-checked; the persisted-index IO keeps its
    # planted pytest in test_extensions.py.
    # round 8: image_neardup_dhash and video_scene_detect moved OUT —
    # independently reimplemented dHash / per-frame-SAD fixtures make
    # both DuckDB-differential (banding, hamming re-rank, and
    # thresholding replay in SQL); pigeonhole/planted-cut pytests stay.
    "compression_ratio_quality",  # zlib level-6 ratios, deterministic (round 5)
    # round 9: audio_spectral_centroid moved OUT — the registered
    # query now runs a FIXED-POINT integer DFT over 128-sample full
    # windows (shared pre-rounded trig table embedded verbatim in a
    # VALUES CTE; one verified HUGEINT->DOUBLE->sqrt seam per bin),
    # so it is DuckDB-differential; the float-rFFT library sibling
    # spectral_features keeps its planted-sine pytest.
    # round 8: boruvka_msf moved OUT — the unrolled-round
    # MATERIALIZED-CTE oracle (nomination, mutual-pair rooting,
    # pointer jumps) makes it DuckDB-differential; the independent
    # python-Kruskal equality pytest stays.
]


@pytest.mark.parametrize("name", SEEDED_QUERIES)
def test_seeded_query_matches_golden(spark, name):
    golden = pd.read_parquet(
        os.path.join(GOLDEN_DIR, f"{name}_sf0.01.parquet")
    )
    actual = QUERIES[name].fn(spark, GOLDEN_SF_DIR).toPandas()
    actual = (
        actual[list(golden.columns)]
        .sort_values(list(golden.columns))
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(actual, golden, check_dtype=False)
