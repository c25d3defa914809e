"""Text-analysis columns for large-scale training-data pipelines.

All pure Column expressions (JVM-side) so they vectorize over a 100 TB
documents table; each has a DuckDB-SQL twin for the oracle gate.
Tokenization reuses the BM25 tokenizer (whitespace + lowercase) so the
whole text stack shares one definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vecgo_spark.operators.bm25 import tokenize_expr

# A compact English stopword set (order-free); used for both quality
# scoring and the stopword-based language heuristic.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "is", "are",
    "was", "for", "with", "as", "by", "at", "it", "this", "that", "be",
)

# BPE-ish token pattern: letter runs, digit runs, or single punctuation.
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def token_count(text: Column | str) -> Column:
    """Whitespace token count (BM25 tokenizer semantics)."""
    return F.size(tokenize_expr(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Approximate subword count: regex token classes over lowercased text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), 0))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokenize_expr(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return F.when(F.size(toks) > 0, n_stop.cast("double") / F.size(toks).cast("double"))


def mean_token_length(text: Column | str) -> Column:
    toks = tokenize_expr(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks).cast("double"))


def alpha_ratio(text: Column | str) -> Column:
    """Fraction of non-whitespace characters that are ASCII letters."""
    c = F.col(text) if isinstance(text, str) else text
    non_ws = F.length(F.regexp_replace(c, "[\\x00-\\x20]+", ""))
    alpha = F.length(F.regexp_replace(F.lower(c), "[^a-z]", ""))
    return F.when(non_ws > 0, alpha.cast("double") / non_ws.cast("double"))


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0,1]: blends length saturation,
    stopword presence, and alphabetic density (the usual pretraining
    quality signals). Deterministic double arithmetic → oracle-safe."""
    toks = tokenize_expr(text)
    n = F.size(toks).cast("double")
    length_sat = F.least(n / F.lit(100.0), F.lit(1.0))
    stop = F.coalesce(stopword_ratio(text), F.lit(0.0))
    stop_sig = F.least(stop / F.lit(0.3), F.lit(1.0))
    alpha = F.coalesce(alpha_ratio(text), F.lit(0.0))
    return (F.lit(0.4) * length_sat + F.lit(0.3) * stop_sig + F.lit(0.3) * alpha)


def langid_stopword(text: Column | str, threshold: float = 0.08) -> Column:
    """Stopword-density language heuristic: 'en' when the English stopword
    ratio clears the threshold, else 'unk'. (A character-ngram profile
    model needs trained profiles; the stopword heuristic is the standard
    zero-dependency fallback and is fully oracle-checkable.)"""
    ratio = F.coalesce(stopword_ratio(text), F.lit(0.0))
    return F.when(ratio >= F.lit(threshold), F.lit("en")).otherwise(F.lit("unk"))


# Character-trigram profiles for the n-gram language heuristic: the most
# frequent trigrams of each language over space-padded text, from public
# character-frequency tables. Scoring = |distinct text trigrams ∩ profile|
# — integer set arithmetic, so the heuristic is exactly reproducible in
# any engine with list intersection.
LANG_TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", "ed ", " an", "and", "nd ", " of", "of ",
           " in", "ing", "ng ", " to", "to ", "er ", " co", "at ", "ion",
           "on ", "ent", "tio", "es ", " re", "is "),
    "de": ("er ", "en ", "ch ", " de", "der", "ie ", "die", " di", "ein",
           " ei", "ne ", "sch", "che", "nde", "den", "in ", "te ", " un",
           "und", "ung", "ich", " ge", "gen", "ten"),
    "fr": (" de", "de ", "es ", "ent", "nt ", "le ", " le", "la ", " la",
           "on ", "re ", " pa", "ion", "ne ", "que", " qu", "ue ", "ns ",
           "ait", "les", " et", "et ", "ur ", " so"),
    "es": (" de", "de ", "os ", "la ", " la", "el ", " el", "as ", "en ",
           " en", "que", " qu", "ue ", "nte", "ado", "ar ", " co", "cio",
           "res", " se", "sta", " es", "ien", "nes"),
}
_LANG_ORDER = ("en", "de", "fr", "es")  # deterministic tiebreak priority


def _norm_for_trigrams(text: Column | str) -> Column:
    """Lowercase, collapse whitespace runs to single spaces, pad with one
    boundary space each side (so word-boundary trigrams like ' th'/'he '
    exist). Empty/NULL text normalizes to a too-short string → no trigrams."""
    c = F.col(text) if isinstance(text, str) else text
    inner = F.trim(F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), "[\\x00-\\x20]+", " "))
    return F.concat(F.lit(" "), inner, F.lit(" "))


def char_trigrams(text: Column | str) -> Column:
    """ARRAY<STRING> of DISTINCT character trigrams of the normalized text."""
    norm = _norm_for_trigrams(text)
    tris = F.transform(
        F.sequence(F.lit(1), F.length(norm) - F.lit(2)),
        lambda i: F.substring(norm, i, F.lit(3)),
    )
    return F.when(F.length(norm) >= 3, F.array_distinct(tris)).otherwise(
        F.array().cast("array<string>")
    )


def langid_ngram_scores(text: Column | str) -> dict[str, Column]:
    """{lang: trigram-profile overlap count} — one intersection per
    profile over the shared distinct-trigram array."""
    tris = char_trigrams(text)
    return {
        lang: F.size(F.array_intersect(
            tris, F.array(*[F.lit(t) for t in profile])
        ))
        for lang, profile in LANG_TRIGRAM_PROFILES.items()
    }


def langid_ngram_pick(scores: dict[str, Column]) -> Column:
    """argmax over profile scores in fixed priority order (first wins on
    ties); all-zero → 'unk'. The chained CASE encodes the tiebreak
    identically in Spark and the SQL twin."""
    out = F.lit(_LANG_ORDER[-1])
    for lang in reversed(_LANG_ORDER[:-1]):
        later = [scores[x] for x in _LANG_ORDER[_LANG_ORDER.index(lang) + 1:]]
        cond = scores[lang] >= later[0]
        for c in later[1:]:
            cond = cond & (scores[lang] >= c)
        out = F.when(cond, F.lit(lang)).otherwise(out)
    allzero = sum(scores[x] for x in _LANG_ORDER) == 0
    return F.when(allzero, F.lit("unk")).otherwise(out)


def quality_filter(
    docs, text_col: str = "text", id_col: str = "doc_id",
    min_quality: float = 0.55, min_tokens: int = 20, max_tokens: int = 100_000,
    lang: str = "en",
):
    """C4-style pretraining quality gate: keep documents that pass the
    language heuristic, clear a quality-score floor, and fall inside a
    token-count band; emit the signal columns alongside the id so the
    decision is auditable.

    Scale posture: one parquet scan, zero shuffles — every signal is a
    JVM Column expression evaluated inside WholeStageCodegen, and the
    predicate is ordinary Filter logic Catalyst can reorder. On 100 TB
    this is embarrassingly parallel map work.
    """
    c = F.col(text_col)
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        langid_stopword(c).alias("langid"),
        quality_score(c).alias("quality"),
        token_count(c).alias("n_tokens"),
    )
    return out.where(
        (F.col("langid") == lang)
        & (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
    )


# ------------------------------------------------------------ SQL twins

_TOKS = "list_filter(string_split_regex(lower({c}), '[\\x00-\\x20]+'), t -> t != '')"


def toks_sql(col: str) -> str:
    return _TOKS.format(c=col)


def token_count_sql(col: str) -> str:
    return f"CAST(len({toks_sql(col)}) AS INT)"


def bpe_ish_token_count_sql(col: str) -> str:
    return f"CAST(len(regexp_extract_all(lower({col}), '{BPE_ISH_PATTERN}')) AS INT)"


def stopword_ratio_sql(col: str) -> str:
    stopset = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    toks = toks_sql(col)
    return (
        f"(CASE WHEN len({toks}) > 0 THEN "
        f"CAST(len(list_filter({toks}, t -> t IN ({stopset}))) AS DOUBLE)"
        f" / CAST(len({toks}) AS DOUBLE) END)"
    )


def mean_token_length_sql(col: str) -> str:
    toks = toks_sql(col)
    return (
        f"(CASE WHEN len({toks}) > 0 THEN "
        f"CAST(list_sum(list_transform({toks}, t -> length(t))) AS DOUBLE)"
        f" / CAST(len({toks}) AS DOUBLE) END)"
    )


def alpha_ratio_sql(col: str) -> str:
    return (
        f"(CASE WHEN length(regexp_replace({col}, '[\\x00-\\x20]+', '', 'g')) > 0 THEN "
        f"CAST(length(regexp_replace(lower({col}), '[^a-z]', '', 'g')) AS DOUBLE)"
        f" / CAST(length(regexp_replace({col}, '[\\x00-\\x20]+', '', 'g')) AS DOUBLE) END)"
    )


def quality_score_sql(col: str) -> str:
    toks = toks_sql(col)
    n = f"CAST(len({toks}) AS DOUBLE)"
    return (
        f"(0.4 * least({n} / 100.0, 1.0)"
        f" + 0.3 * least(COALESCE({stopword_ratio_sql(col)}, 0.0) / 0.3, 1.0)"
        f" + 0.3 * COALESCE({alpha_ratio_sql(col)}, 0.0))"
    )


def langid_stopword_sql(col: str, threshold: float = 0.08) -> str:
    return (
        f"(CASE WHEN COALESCE({stopword_ratio_sql(col)}, 0.0) >= {threshold!r} "
        f"THEN 'en' ELSE 'unk' END)"
    )


def char_trigrams_sql(col: str) -> str:
    """DuckDB twin of char_trigrams (range(1, n-1) == sequence(1, n-2))."""
    norm = f"(' ' || trim(regexp_replace(lower(COALESCE({col}, '')), '[\\x00-\\x20]+', ' ', 'g')) || ' ')"
    tris = f"list_transform(range(1, length({norm}) - 1), i -> substr({norm}, CAST(i AS INT), 3))"
    return (
        f"(CASE WHEN length({norm}) >= 3 THEN list_distinct({tris}) "
        f"ELSE []::VARCHAR[] END)"
    )


def langid_ngram_scores_sql(col: str) -> dict[str, str]:
    tris = char_trigrams_sql(col)
    return {
        lang: (
            "CAST(len(list_intersect({t}, [{p}])) AS INT)".format(
                t=tris, p=", ".join(f"'{x}'" for x in profile))
        )
        for lang, profile in LANG_TRIGRAM_PROFILES.items()
    }


def langid_ngram_pick_sql(score_refs: dict[str, str]) -> str:
    """CASE chain identical to langid_ngram_pick (same priority order,
    same >= tiebreak, all-zero → 'unk'). Pass column REFERENCES (e.g.
    's_en') so the scores are computed once in an inner SELECT."""
    total = " + ".join(score_refs[x] for x in _LANG_ORDER)
    cases = []
    for i, lang in enumerate(_LANG_ORDER[:-1]):
        later = _LANG_ORDER[i + 1:]
        cond = " AND ".join(f"{score_refs[lang]} >= {score_refs[x]}" for x in later)
        cases.append(f"WHEN {cond} THEN '{lang}'")
    return (
        f"(CASE WHEN {total} = 0 THEN 'unk' "
        + " ".join(cases)
        + f" ELSE '{_LANG_ORDER[-1]}' END)"
    )


def quality_filter_sql(
    docs_table: str = "documents", text_col: str = "text", id_col: str = "doc_id",
    min_quality: float = 0.55, min_tokens: int = 20, max_tokens: int = 100_000,
    lang: str = "en",
) -> str:
    return f"""
    SELECT * FROM (
        SELECT {id_col} AS doc_id,
               {langid_stopword_sql(text_col)} AS langid,
               {quality_score_sql(text_col)} AS quality,
               {token_count_sql(text_col)} AS n_tokens
        FROM {docs_table}
    )
    WHERE langid = '{lang}' AND quality >= {min_quality!r}
      AND n_tokens >= {min_tokens} AND n_tokens <= {max_tokens}
    """
