"""Property-based tests (hypothesis) for engine invariants that unit
examples can't sweep: order independence, idempotence, and the
connected-components fixpoint against a union-find reference.

Spark actions are slow per example, so examples are few and frames
tiny; the PROPERTY space (random values/edges) is where the breadth
comes from.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_FAST = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_FAST
@given(
    st.lists(
        st.floats(-1e6, 1e6).map(lambda x: round(x, 2)),
        min_size=1,
        max_size=50,
    ),
    st.randoms(),
)
def test_money_sum_is_order_independent(spark, values, rnd):
    """money_sum must be EXACTLY equal for any permutation of the
    rows — that is its whole contract (plain float SUM is not)."""
    from pyspark.sql import functions as F

    from dados_publicos_etl_spark.functions.numeric import money_sum

    shuffled = values[:]
    rnd.shuffle(shuffled)
    a = (
        spark.createDataFrame([(v,) for v in values], "v double")
        .agg(money_sum("v").alias("s"))
        .head()[0]
    )
    b = (
        spark.createDataFrame([(v,) for v in shuffled], "v double")
        .coalesce(1)
        .agg(money_sum("v").alias("s"))
        .head()[0]
    )
    assert a == b


@_FAST
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """CC fixpoint == classic union-find on the same random graph."""
    from dados_publicos_etl_spark.operators.graph import (
        connected_components,
    )

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    # reference: union-find with path compression
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    # min-id canonical labels
    roots: dict[int, int] = {}
    for n, r in want.items():
        roots[r] = min(roots.get(r, n), n)
    want = {n: roots[find(n)] for n in parent}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.label for r in connected_components(df).collect()}
    assert got == want


@_FAST
@given(st.text(min_size=0, max_size=200))
def test_redact_pii_is_idempotent(spark, text):
    """redact(redact(x)) == redact(x): placeholders must never match
    the patterns they replace."""
    from pyspark.sql import functions as F

    from dados_publicos_etl_spark.operators.privacy import redact_pii

    df = spark.createDataFrame([(text,)], "t string")
    once, twice = df.select(
        redact_pii("t").alias("a"), redact_pii(redact_pii("t")).alias("b")
    ).head()
    assert once == twice


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=80))
def test_mojibake_repair_inverts_double_encoding(text):
    """For ANY text whose UTF-8 bytes are Latin-1-decodable, the
    repair inverts the damage exactly; and repair of already-clean
    Latin-1-encodable text is the identity (pure-function property,
    no Spark needed — the operator maps this per row)."""
    damaged = None
    try:
        damaged = text.encode("utf-8").decode("latin-1")
    except UnicodeDecodeError:
        pass  # damage itself impossible for this text

    def one(s: str) -> str:
        try:
            return s.encode("latin-1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return s

    if damaged is not None:
        assert one(damaged) == text


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=500), max_size=40))
def test_hive_partition_path_roundtrip(value):
    """unescape_path_name inverts Spark's partition-path escaping for
    any printable value (the compaction correctness property from the
    round-3 advice)."""
    from dados_publicos_etl_spark.io import escape_path_name, unescape_path_name

    assert unescape_path_name(escape_path_name(value)) == value


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_dhash_signed_packing_roundtrip(bits_int):
    """The signed-64-bit dHash representation preserves all 64 bits:
    band extraction via unsigned shifts recovers every byte."""
    import numpy as np

    bits = np.array(
        [(bits_int >> k) & 1 for k in range(64)], dtype=bool
    )
    signed = int.from_bytes(
        np.packbits(bits, bitorder="little").tobytes(), "little", signed=True
    )
    unsigned = signed & (2**64 - 1)
    assert unsigned == bits_int
    for b in range(8):
        assert (unsigned >> (8 * b)) & 255 == (bits_int >> (8 * b)) & 255


def test_shard_assignment_balance_bound(spark):
    """Serpentine dealing over the descending token-count rank must
    bound the spread of per-shard token totals by the LARGEST single
    document (the greedy-balancing guarantee hash sharding lacks) —
    the oracle proves value equality, this proves the balance
    property the operator exists for."""
    from dados_publicos_etl_spark.io import read_table
    from dados_publicos_etl_spark.operators.sampling import (
        training_shard_assignment,
    )
    from dados_publicos_etl_spark.functions.text import tokens
    from tests.conftest import SF_SMOKE

    from pyspark.sql import functions as F

    rows = training_shard_assignment(spark, SF_SMOKE).collect()
    totals = [r["total_tokens"] for r in rows]
    max_doc = (
        read_table(spark, SF_SMOKE, "documents")
        .select(F.size(tokens("text")).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert len(rows) == 8
    assert max(totals) - min(totals) <= max_doc, (totals, max_doc)


def test_temperature_sampling_flattens_head(spark):
    """alpha < 1 must up-weight low-resource languages: keep
    thresholds strictly decrease as language frequency increases
    (the flattening the mT5/XLM-R rule exists to provide)."""
    from dados_publicos_etl_spark.operators.sampling import (
        temperature_mix_sampling,
    )
    from tests.conftest import SF_SMOKE

    rows = temperature_mix_sampling(spark, SF_SMOKE).collect()
    by_size = sorted(rows, key=lambda r: r["n_before"])
    thrs = [r["keep_thr_ppm"] for r in by_size]
    assert thrs == sorted(thrs, reverse=True), by_size
