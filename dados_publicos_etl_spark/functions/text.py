"""Text expression helpers shared by the text-analysis / dedup
operators.  All pure Catalyst expressions; tokenization is defined
once here so Spark plans and DuckDB oracles can agree on semantics:

  token   := maximal run of non-whitespace ( split on \\s+ )
  word    := maximal run of [A-Za-z0-9]+
  norm(t) := lower(t) with whitespace runs collapsed to single spaces
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS = r"\s+"
WORD = "[A-Za-z0-9]+"


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(c) if isinstance(c, str) else c
    return F.split(F.lower(c), WS)


def distinct_tokens(c: Column | str) -> Column:
    return F.array_distinct(tokens(c))


def word_count(c: Column | str) -> Column:
    """BPE-ish word counting: number of [A-Za-z0-9]+ runs."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_count(c, F.lit(WORD))


def normalized(c: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed spaces."""
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(c), WS, " "))


def fingerprint_md5(c: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized(c))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined) over a token-array
    column.  IMPORTANT: pass a materialized column REFERENCE (select
    the token split into a column first) — lambda bodies have no
    common-subexpression elimination, so an inline split() here would
    re-tokenize once per element_at reference (measured 10s vs 0.5s
    at sf0.1).
    """

    def shingle_at(i):
        # element_at + concat instead of slice + concat_ws: avoids an
        # array allocation per shingle (~2x faster at sf0.1)
        parts: list[Column] = []
        for j in range(n):
            if j:
                parts.append(F.lit(" "))
            parts.append(F.element_at(toks, i + j))
        return F.concat(*parts)

    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                shingle_at,
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def shingles(c: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of raw text, the unit for
    near-dup similarity.  Unigram token sets are degenerate on small
    vocabularies (everything overlaps); n-grams encode word order so
    only genuine near-duplicates score high.

    Convenience form over an inline tokenization — for hot paths
    prefer ``select(tokens(...).alias(t)).select(
    shingles_from_tokens(col(t)))`` (see that function's warning).
    """
    return shingles_from_tokens(tokens(c), n)


def hashed_shingles_from_tokens(tok_col_name: str) -> Column:
    """Distinct 3-gram shingles as xxhash64 longs over a pre-split
    token array column — no string materialization.

    Functionally interchangeable with ``shingles`` for similarity
    (hash collisions are ~1e-13 per pair) but ~6x cheaper to compute
    and to set-intersect, so the MinHash/SimHash pipelines use this
    form; only the DuckDB-oracle-checked exact query pays for string
    shingles.  Docs shorter than 3 tokens clamp into one shingle.
    """
    from pyspark.sql import functions as _F

    t = tok_col_name
    return _F.expr(
        f"array_distinct(transform("
        f"  sequence(1, greatest(size({t}) - 2, 1)),"
        f"  i -> xxhash64(element_at({t}, i),"
        f"                element_at({t}, least(i + 1, size({t}))),"
        f"                element_at({t}, least(i + 2, size({t})))"
        f")))"
    )


def md5_hashed_shingles(shingle_arr: Column, hexlen: int = 7) -> Column:
    """Distinct PORTABLE shingle hashes: md5 of each shingle string,
    first ``hexlen`` hex chars as a long — the cross-engine sibling
    of ``hashed_shingles_from_tokens`` (xxhash64 exists only in
    Spark; md5 is bit-identical on Spark and DuckDB).  The default
    7 hex chars give a 28-bit universe, sized so the minhash
    permutation family's ``a*h + b`` stays inside int64
    (see operators/dedup.py).  Pass a MATERIALIZED shingle-array
    column reference (same no-CSE warning as shingles_from_tokens).
    """
    return F.array_distinct(
        F.transform(
            shingle_arr,
            lambda s: F.conv(F.substring(F.md5(s), 1, hexlen), 16, 10).cast(
                "long"
            ),
        )
    )


def duck_md5_long_sql(expr: str, hexlen: int = 7) -> str:
    """DuckDB fragment equivalent to the md5->long bucketing of
    ``md5_hashed_shingles`` for a single string expression."""
    return f"CAST(('0x' || substr(md5({expr}), 1, {hexlen})) AS BIGINT)"


def duck_shingles_sql(text_expr: str, n: int = 3) -> str:
    """DuckDB SQL fragment equivalent to ``shingles(text_expr, n)``."""
    toks = f"string_split_regex(lower({text_expr}), '{WS}')"
    return f"""
    CASE WHEN len({toks}) >= {n} THEN
      list_distinct(list_transform(
        generate_series(1, len({toks}) - {n - 1}),
        i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))
    ELSE [array_to_string({toks}, ' ')] END
    """


def jaccard_tokens(a: Column, b: Column) -> Column:
    """Jaccard similarity of two (distinct-)token arrays (double)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / union
