"""Text-analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting. All built-in-function compositions
(whole-stage codegen); no Python UDFs."""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is",
             "it", "that", "for", "on", "with", "as", "at", "by"]


# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space
# symbols — the coarse split BPE vocabularies refine. RE2- and
# Java-regex compatible so a SQL oracle can reproduce it exactly.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_stats(df: DataFrame, content_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count, BPE-ish regex token count, char count,
    mean token length."""
    toks = F.split(F.col(content_col), " ")
    n_tokens = F.size(toks).alias("n_tokens")
    n_bpe = F.size(F.regexp_extract_all(
        F.col(content_col), F.lit(BPE_PATTERN), F.lit(0)))
    n_chars = F.length(content_col).alias("n_chars")
    return df.select(
        id_col, n_tokens,
        n_bpe.cast("long").alias("n_bpe_tokens"),
        n_chars,
        (F.length(content_col)
         / F.greatest(F.size(toks), F.lit(1))).alias("mean_tok_len"),
    )


def quality_score(df: DataFrame, content_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, alpha ratio, digit ratio,
    space ratio, stopword hit count (Gopher/C4-style filters)."""
    txt = F.col(content_col)
    length = F.length(txt)
    safe_len = F.greatest(length, F.lit(1))
    alpha = F.length(F.regexp_replace(txt, "[^a-zA-Z]", ""))
    digit = F.length(F.regexp_replace(txt, "[^0-9]", ""))
    space = F.length(F.regexp_replace(txt, "[^ ]", ""))
    toks = F.split(txt, " ")
    stop_hits = F.size(F.array_intersect(
        toks, F.array(*[F.lit(s) for s in STOPWORDS])))
    return df.select(
        id_col,
        length.alias("n_chars"),
        (alpha / safe_len).alias("alpha_ratio"),
        (digit / safe_len).alias("digit_ratio"),
        (space / safe_len).alias("space_ratio"),
        stop_hits.alias("stopword_hits"),
    )


def lang_id_ngram(df: DataFrame, content_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Tiny character-heuristic language id (en/other): scores common
    English trigram/stopword evidence. Deterministic, SQL-expressible."""
    txt = F.lower(F.col(content_col))
    toks = F.split(txt, " ")
    en_hits = F.size(F.array_intersect(
        toks, F.array(*[F.lit(s) for s in STOPWORDS])))
    pred = F.when(en_hits >= 2, F.lit("en")).otherwise(F.lit("other"))
    return df.select(id_col, en_hits.alias("en_evidence"),
                     pred.alias("lang_pred"))


def winnow_fingerprint(df: DataFrame, content_col: str = "text",
                       id_col: str = "doc_id", k: int = 5,
                       window: int = 4,
                       hasher: str = "xxhash64") -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    hash every word k-gram, slide a ``window`` over the hash sequence,
    keep each window's minimum — the classic rolling-hash fingerprint
    set for partial-overlap / plagiarism-style matching (robust to
    insertions: any shared run of >= k+window-1 words shares a
    fingerprint). All JVM-side array expressions, one narrow pass.

    ``hasher='md5'`` uses the low 60 bits of md5(gram), bit-identical
    in DuckDB, so a SQL oracle can recompute the exact sets."""
    toks = F.split(F.col(content_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    if hasher == "md5":
        hs = F.transform(grams, lambda g: F.conv(
            F.substring(F.md5(F.encode(g, "UTF-8")), 1, 15), 16, 10
        ).cast("long"))
    else:
        hs = F.transform(grams, lambda g: F.xxhash64(g))
    hs_col = F.col("_hs")
    wins = F.transform(
        F.sequence(F.lit(0),
                   F.greatest(F.size(hs_col) - window, F.lit(0))),
        lambda i: F.array_min(F.slice(hs_col, i + 1, window)),
    )
    return (df.select(id_col, hs.alias("_hs"))
              .select(id_col,
                      F.array_sort(F.array_distinct(wins))
                      .alias("fingerprints")))


def fingerprint(df: DataFrame, content_col: str = "text",
                id_col: str = "doc_id", algo: str = "xxhash64") -> DataFrame:
    """Content fingerprint of the normalized text — the cheap exact-dup
    key for massive corpora: dedup shuffles a fixed-width key instead of
    full documents. ``xxhash64`` (default, 8 bytes) for scale; ``md5``
    (hex) for cross-engine-checkable runs (DuckDB computes the same)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(content_col))),
                            " +", " ")
    if algo == "md5":
        fp = F.md5(F.encode(norm, "UTF-8"))
    else:
        fp = F.xxhash64(norm)
    return df.select(id_col, fp.alias("fingerprint"))
