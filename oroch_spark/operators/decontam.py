"""Training-data hygiene: eval-set decontamination and PII redaction.

``contamination_flags`` implements the standard n-gram-overlap
decontamination used by LLM training pipelines (GPT-3 appendix C /
PaLM / Llama-style): a training document is contaminated when it shares
at least ``min_hits`` distinct word n-grams (n around 8-13) with ANY
document of an evaluation set. Everything is built-in Spark expressions
(whole-stage codegen, no Python UDFs):

- both sides normalize the same way (lowercase, punctuation stripped,
  whitespace collapsed) so cosmetic edits cannot hide an overlap;
- the eval side reduces to DISTINCT xxhash64(n-gram) values — eval sets
  are small by construction, so this set broadcasts and the train side
  is a map-side semi-join: the 100 TB corpus is scanned ONCE, never
  shuffled on content (pass ``broadcast=False`` for a giant eval set
  and the same plan becomes an ordinary hash join);
- per-doc hit counts group only the matching (doc_id, gram) pairs —
  the exchange carries hits, not the corpus.

``redact_pii`` masks the e-mail / phone / IPv4 / SSN-ish / card-ish
token shapes with fixed placeholders — the deterministic, vectorized
scrub a transcript pipeline runs before anything persists. It is a
REGEX shape filter, not an NER model: names and free-text addresses
need a model pass (out of scope here, swap point documented).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import ngram_shingles

# one normalization for BOTH sides: Unicode-aware lowercase; every run
# of characters that are neither letters nor digits (in ANY script)
# becomes one space. \p{L}/\p{N} are Unicode general categories,
# supported identically by Java regex (Spark) and RE2 (DuckDB), so
# CJK/Cyrillic/accented text keeps its words instead of normalizing to
# empty — non-Latin-script overlap is flagged like any other.
_NORM_PATTERN = r"[^\p{L}\p{N}]+"


def _normalized(col):
    return F.trim(F.regexp_replace(F.lower(col), _NORM_PATTERN, " "))


def eval_ngram_hashes(eval_df: DataFrame, n: int = 8,
                      content_col: str = "text") -> DataFrame:
    """DISTINCT xxhash64 over the eval set's normalized word n-grams —
    the (small) contamination reference set."""
    norm = eval_df.select(_normalized(F.col(content_col)).alias("_t"))
    grams = ngram_shingles(norm.withColumn("_id", F.lit(0)),
                           content_col="_t", n=n, id_col="_id")
    return (grams.select(F.explode("shingles").alias("gram"))
            .filter(F.length("gram") > 0)
            .select(F.xxhash64("gram").alias("gram_hash"))
            .distinct())


def contamination_flags(train_df: DataFrame, eval_df: DataFrame,
                        n: int = 8,
                        content_col: str = "text",
                        id_col: str = "doc_id",
                        eval_content_col: str = "text",
                        min_hits: int = 1,
                        broadcast: bool = True) -> DataFrame:
    """One row per training document: ``n_hits`` (distinct eval n-grams
    it contains) and ``contaminated`` (n_hits >= min_hits).

    Documents shorter than ``n`` words contribute their WHOLE
    normalized text as one (short) gram — the shingle convention of
    :func:`~oroch_spark.operators.dedup.ngram_shingles` — so a short
    train doc is flagged exactly when an eval doc is its verbatim
    normalized equal (or contains nothing longer): short exact copies
    of eval prompts still count as contamination, but a short doc can
    never match a mere substring of a long eval doc."""
    ref = eval_ngram_hashes(eval_df, n=n, content_col=eval_content_col)
    if broadcast:
        ref = F.broadcast(ref)
    norm = train_df.select(
        id_col, _normalized(F.col(content_col)).alias("_t"))
    grams = ngram_shingles(norm, content_col="_t", n=n, id_col=id_col)
    hits = (grams.select(id_col, F.explode("shingles").alias("gram"))
            .filter(F.length("gram") > 0)
            .withColumn("gram_hash", F.xxhash64("gram"))
            .join(ref, "gram_hash")                  # semi-shape join
            .groupBy(id_col)
            .agg(F.count_distinct("gram_hash").alias("n_hits")))
    return (train_df.select(id_col).distinct()
            .join(hits, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                (F.coalesce("n_hits", F.lit(0)) >= min_hits)
                .alias("contaminated")))


def remove_contaminated(train_df: DataFrame, eval_df: DataFrame,
                        n: int = 8, content_col: str = "text",
                        id_col: str = "doc_id",
                        min_hits: int = 1,
                        broadcast: bool = True) -> DataFrame:
    """The filtered training set: ``train_df`` minus every document
    :func:`contamination_flags` marks contaminated."""
    flags = contamination_flags(train_df, eval_df, n=n,
                                content_col=content_col, id_col=id_col,
                                min_hits=min_hits, broadcast=broadcast)
    keep = flags.filter(~F.col("contaminated")).select(id_col)
    return train_df.join(keep, id_col, "left_semi")


# PII shapes, most-specific first (an SSN inside a longer digit run is
# a card first; e-mail before the bare-domain heuristics would go).
# Java regex, applied bottom-up by one regexp_replace each.
_PII_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("card", r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"(?<![\w.])(?:\+?\d{1,3}[ .-]?)?(?:\(\d{3}\)[ .-]?|"
              r"\d{3}[ .-])\d{3}[ .-]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
             r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b", "<IP>"),
]


def redact_pii(df: DataFrame, content_col: str = "text",
               rules: list[str] | None = None,
               out_col: str | None = None) -> DataFrame:
    """Mask PII token shapes in ``content_col`` (in place by default,
    or into ``out_col``). ``rules`` selects a subset by name from
    {email, card, ssn, phone, ipv4}; order is fixed most-specific
    first regardless of the subset's order."""
    want = set(rules) if rules is not None else None
    unknown = (want or set()) - {r[0] for r in _PII_RULES}
    if unknown:
        raise ValueError(f"unknown PII rules {sorted(unknown)}")
    col = F.col(content_col)
    for name, pat, repl in _PII_RULES:
        if want is None or name in want:
            col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out_col or content_col, col)
