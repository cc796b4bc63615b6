"""Text analysis operators for training-data pipelines — JVM-side only.

Every function returns a Spark Column built purely from built-in
``pyspark.sql.functions`` (whole-stage-codegen friendly, no Python in the
hot path). Each has an exact ANSI/DuckDB-SQL mirror used as the correctness
oracle (see __spark_entry__.oracle_sql): the definitions below are chosen so
both engines compute bit-identical integers (ratios are emitted as
``floor(scale * a / b)`` of exact integer inputs — IEEE division is
deterministic across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: stopwords used by the heuristic scorers (padded occurrences)
STOPWORDS = ["the", "a", "and", "of", "to"]


def ws_token_count(c: Column) -> Column:
    """Whitespace token count: length - length(without spaces) + 1.

    SQL mirror: ``length(text) - length(replace(text, ' ', '')) + 1``.
    """
    return F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit(""))) + F.lit(1)


#: BPE-ish pre-tokenizer pattern (GPT-2-style approximation): letter runs,
#: digit runs, or single non-alphanumeric symbols. Pure ASCII classes so the
#: Java (Spark) and RE2 (DuckDB) regex engines agree exactly.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_count(c: Column) -> Column:
    """BPE-ish sub-word token count via regexp_count (JVM, codegen).

    SQL mirror: ``len(regexp_extract_all(text, pattern))``.
    """
    return F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN)).cast("long")


def occurrences(c: Column, word: str) -> Column:
    """Non-overlapping occurrences of ``' word '`` in ``' '||text||' '``."""
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    needle = f" {word} "
    return ((F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(" "))))
            / F.lit(len(needle) - 1)).cast("long")


def stopword_count(c: Column) -> Column:
    out = F.lit(0).cast("long")
    for w in STOPWORDS:
        out = out + occurrences(c, w)
    return out


def stopword_ratio_millis(c: Column) -> Column:
    """floor(1000 * stopwords / tokens) as an exact integer score."""
    return F.floor(F.lit(1000.0) * stopword_count(c) / ws_token_count(c)).cast("long")


def punct_count(c: Column) -> Column:
    """Number of ASCII punctuation characters (regex class, JVM).

    SQL mirror shares the exact pattern; both engines' regex dialects
    agree on this ASCII class.
    """
    return F.regexp_count(c, F.lit(r"[.,;:!?'\"()\[\]-]")).cast("long")


def punct_ratio_millis(c: Column) -> Column:
    """floor(1000 * punctuation chars / total chars) as an exact integer."""
    return F.floor(F.lit(1000.0) * punct_count(c)
                   / F.greatest(F.length(c), F.lit(1))).cast("long")


def avg_word_len_millis(c: Column) -> Column:
    """floor(1000 * non-space chars / tokens)."""
    nonspace = F.length(F.replace(c, F.lit(" "), F.lit("")))
    return F.floor(F.lit(1000.0) * nonspace / ws_token_count(c)).cast("long")


def quality_bucket(c: Column) -> Column:
    """Coarse quality tier from length + stopword density (deterministic)."""
    toks = ws_token_count(c)
    sw = stopword_ratio_millis(c)
    return (F.when((toks >= 30) & (sw >= 20), F.lit("high"))
            .when(toks >= 15, F.lit("medium"))
            .otherwise(F.lit("low")))


def langid_pred(c: Column) -> Column:
    """n-gram/stopword language heuristic (demonstration classifier).

    'en' when the English-stopword density clears a threshold, else 'unk'.
    Deterministic and exactly mirrored in SQL.
    """
    return F.when(stopword_ratio_millis(c) >= F.lit(10), F.lit("en")).otherwise(F.lit("unk"))


# --- SQL mirrors (DuckDB) ---------------------------------------------------

def sql_ws_token_count(col: str = "text") -> str:
    return f"(length({col}) - length(replace({col}, ' ', '')) + 1)"


def sql_bpe_token_count(col: str = "text") -> str:
    return f"CAST(len(regexp_extract_all({col}, '{BPE_TOKEN_PATTERN}')) AS BIGINT)"


def sql_occurrences(word: str, col: str = "text") -> str:
    needle = f" {word} "
    return (f"CAST((length(' '||{col}||' ') - length(replace(' '||{col}||' ', "
            f"'{needle}', ' '))) / {len(needle) - 1} AS BIGINT)")


def sql_stopword_count(col: str = "text") -> str:
    return "(" + " + ".join(sql_occurrences(w, col) for w in STOPWORDS) + ")"


def sql_stopword_ratio_millis(col: str = "text") -> str:
    return (f"CAST(floor(1000.0 * {sql_stopword_count(col)} / "
            f"{sql_ws_token_count(col)}) AS BIGINT)")


def sql_punct_count(col: str = "text") -> str:
    return (f"CAST(len(regexp_extract_all({col}, "
            f"'[.,;:!?''\"()\\[\\]-]')) AS BIGINT)")


def sql_punct_ratio_millis(col: str = "text") -> str:
    return (f"CAST(floor(1000.0 * {sql_punct_count(col)} / "
            f"greatest(length({col}), 1)) AS BIGINT)")


def sql_avg_word_len_millis(col: str = "text") -> str:
    return (f"CAST(floor(1000.0 * length(replace({col}, ' ', '')) / "
            f"{sql_ws_token_count(col)}) AS BIGINT)")


def sql_quality_bucket(col: str = "text") -> str:
    return (f"CASE WHEN {sql_ws_token_count(col)} >= 30 AND "
            f"{sql_stopword_ratio_millis(col)} >= 20 THEN 'high' "
            f"WHEN {sql_ws_token_count(col)} >= 15 THEN 'medium' "
            f"ELSE 'low' END")


def sql_langid_pred(col: str = "text") -> str:
    return (f"CASE WHEN {sql_stopword_ratio_millis(col)} >= 10 "
            f"THEN 'en' ELSE 'unk' END")
