"""Library-level tests for quality/CDC/merge operators on synthetic
frames with known ground truth (oracle-differential covers the
registered queries)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_snapshot_diff_classification(spark):
    from dados_publicos_etl_spark.operators.quality import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 value-changed, 3 NULL->value (must be
        # 'changed' under null-safe compare), 4 removed, 5 added
        [(1, "a", 10.0), (2, "b", 21.0), (3, "c", 30.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, "k", ["s", "v"]).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "changed",
        4: "removed",
        5: "added",
    }


def test_check_rules_one_pass(spark):
    from dados_publicos_etl_spark.operators.quality import check_rules

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 120.0)], "id long, v double"
    )
    out = {
        r.rule: (r.n_violations, r.n_rows, r.passed)
        for r in check_rules(
            df,
            {
                "v_not_null": F.col("v").isNull(),
                "v_below_100": F.col("v") > 100,
                "id_positive": F.col("id") <= 0,
            },
        ).collect()
    }
    assert out["v_not_null"] == (1, 3, False)
    assert out["v_below_100"] == (1, 3, False)
    assert out["id_positive"] == (0, 3, True)


def test_scd2_close_and_append_versions(spark):
    from dados_publicos_etl_spark.operators.merge import (
        scd2_close_and_append,
    )

    current = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2), (2, "a", 1)],
        "k long, val string, version int",
    )
    updates = spark.createDataFrame(
        [(1, "z"), (3, "new")], "k long, val string"
    )
    out = scd2_close_and_append(current, updates, "k")
    rows = {(r.k, r.val): r.version for r in out.collect()}
    assert rows[(1, "z")] == 3          # max existing version + 1
    assert rows[(3, "new")] == 1        # brand-new key starts at 1
    assert rows[(1, "x")] == 1 and rows[(1, "y")] == 2  # history kept
    assert out.count() == 5


def test_upsert_source_wins(spark):
    from dados_publicos_etl_spark.operators.merge import upsert

    target = spark.createDataFrame(
        [(1, "old"), (2, "keep")], "k long, v string"
    )
    source = spark.createDataFrame(
        [(1, "new"), (3, "ins")], "k long, v string"
    )
    got = {r.k: r.v for r in upsert(target, source, "k").collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_repair_mojibake_roundtrips_planted_damage(spark):
    """Plant mojibake by double-encoding accented text (the
    reference's ISO-8859-1 pipeline applied twice), repair it, and
    require exact equality with the original; pure-ASCII and
    already-clean rows must pass through untouched."""
    from dados_publicos_etl_spark.operators.clean import repair_mojibake

    originals = [
        "coração de São Paulo",   # pt accents (the reference's domain)
        "crème brûlée à côté",
        "plain ascii survives",
        "Müller-Straße",
    ]
    rows = []
    for i, t in enumerate(originals):
        damaged = t.encode("utf-8").decode("latin-1")  # é -> Ã©
        rows.append((i, damaged, t))
    df = spark.createDataFrame(rows, "id long, text string, want string")
    got = {
        r.id: r.text
        for r in repair_mojibake(df, "text").collect()
    }
    for i, t in enumerate(originals):
        assert got[i] == t, (i, got[i], t)
    # idempotence: repairing clean text changes nothing
    clean = spark.createDataFrame(
        [(i, t) for i, t in enumerate(originals)], "id long, text string"
    )
    again = {r.id: r.text for r in repair_mojibake(clean, "text").collect()}
    assert again == {i: t for i, t in enumerate(originals)}
