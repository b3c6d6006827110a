"""Text-analysis operators for a training-data pipeline.

All hot-path logic is built-in Column expressions (JVM-side, inside
whole-stage codegen) — no Python UDFs. Each operator has an exact ANSI-SQL
equivalent (see __spark_entry__.oracle_sql) so the driver's DuckDB oracle
can verify it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Deterministic stopword lists used by both quality scoring and the
# n-gram-free language-ID heuristic. Mirrored verbatim in the SQL oracles.
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
STOPWORDS_DE = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"]
STOPWORDS_FR = ["le", "la", "les", "et", "est", "une", "pour", "dans"]
STOPWORDS_ES = ["el", "la", "los", "y", "es", "una", "por", "con"]

_WS = r"\s+"


def round_portable(col: Column, digits: int) -> Column:
    """floor(x*10^d + 0.5)/10^d — identical in Spark and DuckDB (their
    native round() disagree on exact ties: HALF_UP vs HALF_EVEN)."""
    f = 10 ** digits
    return F.floor(col * f + 0.5) / f


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization; empty/blank text → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, _WS)
    )


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def _stop_hits(col, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(F.lower(F.col(col) if isinstance(col, str) else col)),
                           lambda w: F.array_contains(arr, w)))


def with_token_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """token count + char classes + stopword ratio — quality-score features."""
    n_chars = F.length(F.col(col))
    alpha = n_chars - F.length(F.regexp_replace(F.col(col), "[A-Za-z]", ""))
    digit = n_chars - F.length(F.regexp_replace(F.col(col), "[0-9]", ""))
    punct = n_chars - F.length(F.regexp_replace(F.col(col), r"[^\w\s]", ""))
    ntok = token_count(col)
    stop = _stop_hits(col, STOPWORDS_EN)
    return df.withColumns(
        {
            "n_tokens": ntok,
            "n_chars_m": n_chars,
            "alpha_ratio": round_portable(alpha / F.greatest(n_chars, F.lit(1)), 6),
            "digit_ratio": round_portable(digit / F.greatest(n_chars, F.lit(1)), 6),
            "punct_ratio": round_portable(punct / F.greatest(n_chars, F.lit(1)), 6),
            "stopword_ratio": round_portable(stop / F.greatest(ntok, F.lit(1)), 6),
            "avg_token_len": round_portable(
                (n_chars - ntok + 1) / F.greatest(ntok, F.lit(1)), 6
            ),
        }
    )


def quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Composite [0,1] quality score from deterministic features.

    Final rounding is floor(x*1e6 + 0.5)/1e6 — portable across engines
    (Spark's round is HALF_UP, DuckDB's is HALF_EVEN; exact 1e-6 ties are
    common here because the inputs are already 1e-6-rounded)."""
    d = with_token_stats(df, col)
    raw = (
        0.4 * F.least(d["n_tokens"] / F.lit(100.0), F.lit(1.0))
        + 0.3 * d["alpha_ratio"]
        + 0.2 * d["stopword_ratio"]
        + 0.1 * (1 - F.least(d["digit_ratio"] * 5, F.lit(1.0)))
    )
    score = F.floor(raw * 1e6 + 0.5) / 1e6
    return d.withColumn("quality", score)


def lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Stopword-vote language ID with a deterministic tie-break order.

    The reference has no NLP surface; this is the training-data-pipeline
    extension (langid heuristic). CASE-chain order en>de>fr>es breaks ties.
    """
    c_en = _stop_hits(col, STOPWORDS_EN)
    c_de = _stop_hits(col, STOPWORDS_DE)
    c_fr = _stop_hits(col, STOPWORDS_FR)
    c_es = _stop_hits(col, STOPWORDS_ES)
    best = F.greatest(c_en, c_de, c_fr, c_es)
    pred = (
        F.when(best == 0, F.lit("und"))
        .when(c_en == best, F.lit("en"))
        .when(c_de == best, F.lit("de"))
        .when(c_fr == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return df.withColumn("pred_lang", pred)


def fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Content fingerprints: md5 + sha256 + length — dedup/lineage keys."""
    return df.withColumns(
        {
            "fp_md5": F.md5(F.col(col)),
            "fp_sha256": F.sha2(F.col(col), 256),
            "fp_len": F.length(F.col(col)),
        }
    )


def sql_stop_hits(col: str, words: list[str]) -> str:
    """DuckDB fragment mirroring _stop_hits exactly."""
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(regexp_split_to_array(trim(lower({col})), '\\s+'), "
        f"w -> list_contains([{lst}], w)))"
    )


def sql_tokens(col: str) -> str:
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({col}), '\\s+')) END"
    )
