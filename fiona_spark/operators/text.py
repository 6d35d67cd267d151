"""Text-quality operators for training-data curation (the LLM-pipeline
axis): repetition-based filters in the style of the published
Gopher/MassiveText quality heuristics — duplicate-line fraction, most-
frequent-2-gram mass, duplicated character-n-gram mass.

All measures are relational: grams explode to rows, counts aggregate
per (doc, gram), ratios join back per doc — one hash shuffle per gram
family, no Python, no per-doc state.  At 100 TB the shuffle keys are
(doc_id, gram-hash) sized by the corpus, exactly like the shingle
pipeline in :mod:`fiona_spark.operators.dedup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _rnd(col, digits):
    """Optional display rounding; ``digits=None`` keeps the raw IEEE
    double (bit-identical across engines for same-integer ratios —
    what the driver's value-hash differential needs)."""
    return col if digits is None else F.round(col, digits)


def line_dup_fraction(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      round_digits: int | None = 6) -> DataFrame:
    """Fraction of a document's lines that are duplicates of an earlier
    line: 1 - distinct/total (0 for single-line docs).  Pure codegen
    array arithmetic, no shuffle."""
    lines = F.split(F.col(text_col), "\n")
    n = F.size(lines)
    dup = (F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double")
           / F.greatest(n, F.lit(1)).cast("double"))
    return docs.select(id_col,
                       _rnd(dup, round_digits).alias("line_dup_frac"))


def _word_grams(docs: DataFrame, id_col: str, text_col: str,
                n: int) -> DataFrame:
    """(id, gram) rows of word n-grams (whitespace tokens)."""
    ws = F.split(F.col(text_col), " +")
    parts = [f"ws[i + {j}]" for j in range(n)]
    grams = (f"CASE WHEN size(ws) >= {n} THEN "
             f"transform(sequence(0, size(ws) - {n}), i -> "
             f"concat_ws(' ', {', '.join(parts)})) "
             f"ELSE CAST(array() AS ARRAY<STRING>) END")
    return (docs.select(id_col, ws.alias("ws"))
            .select(id_col, F.explode(F.expr(grams)).alias("gram")))


def top_ngram_fraction(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 2,
                       round_digits: int | None = 6) -> DataFrame:
    """Mass of the single most frequent word n-gram: count(top gram) /
    count(all grams) per doc (Gopher's top-2-gram filter shape).  Docs
    with no n-gram report 0."""
    grams = _word_grams(docs, id_col, text_col, n)
    per = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    stats = per.groupBy(id_col).agg(
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias("f"))
    return (docs.select(id_col).join(stats, id_col, "left")
            .select(id_col,
                    _rnd(F.coalesce(F.col("f"), F.lit(0.0)), round_digits)
                    .alias(f"top_{n}gram_frac")))


def dup_chargram_fraction(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 6,
                          round_digits: int | None = 6) -> DataFrame:
    """Mass of character n-grams that occur more than once in the doc:
    sum(count where count >= 2) / sum(count) (the duplicated-n-gram
    character filter).  Docs shorter than n report 0."""
    # CASE-guarded: sequence(1, 0) steps BACKWARD in Spark, so a doc
    # shorter than n would otherwise emit phantom grams
    grams_expr = (f"CASE WHEN length({text_col}) >= {n} THEN "
                  f"transform(sequence(1, length({text_col}) - {n - 1}), "
                  f"i -> substring({text_col}, i, {n})) "
                  f"ELSE CAST(array() AS ARRAY<STRING>) END")
    grams = docs.select(
        id_col, F.explode(F.expr(grams_expr)).alias("gram"))
    per = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    stats = per.groupBy(id_col).agg(
        (F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
         .cast("double") / F.sum("c").cast("double")).alias("f"))
    return (docs.select(id_col).join(stats, id_col, "left")
            .select(id_col,
                    _rnd(F.coalesce(F.col("f"), F.lit(0.0)), round_digits)
                    .alias(f"dup_{n}chargram_frac")))


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     round_digits: int | None = 6) -> DataFrame:
    """All repetition measures joined per doc: (id, line_dup_frac,
    top_2gram_frac, dup_6chargram_frac)."""
    out = line_dup_fraction(docs, id_col, text_col, round_digits)
    out = out.join(
        top_ngram_fraction(docs, id_col, text_col, 2, round_digits), id_col)
    out = out.join(
        dup_chargram_fraction(docs, id_col, text_col, 6, round_digits),
        id_col)
    return out
