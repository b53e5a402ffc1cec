"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure Spark SQL expressions (whole-stage codegen, no Python), each
designed to be reproducible in DuckDB for the oracle gate:
regexp-free where dialects differ, md5-based hashes where hashing is
needed (see operators/dedup.py H()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import H, P, tokens_expr

#: tiny per-language stopword marker sets for the n-gram/stopword
#: language-ID heuristic; chosen to be disjoint across languages.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "que", "y"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


def _marker_hits_expr(lang: str) -> str:
    toks = tokens_expr()
    arr = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        f"size(filter({toks}, t -> array_contains(array({arr}), t)))"
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, lang_hits): argmax of per-language stopword
    hits; 'und' (undetermined) when no marker fires.  Ties break by
    language code order — deterministic, mirrored in the oracle."""
    hit_cols = {lang: _marker_hits_expr(lang) for lang in sorted(LANG_MARKERS)}
    df = docs.selectExpr(
        "doc_id", *[f"{e} as hits_{lang}" for lang, e in hit_cols.items()])
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in sorted(LANG_MARKERS)) + ")"
    pick = "case when {b} = 0 then 'und' ".format(b=best)
    for lang in sorted(LANG_MARKERS):
        pick += f"when hits_{lang} = {best} then '{lang}' "
    pick += "end"
    return df.selectExpr(
        "doc_id", f"{pick} as lang_pred", f"cast({best} as bigint) as lang_hits")


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, stopword_ratio,
    alpha_ratio, quality): length/stopword/character-class heuristics,
    the standard cheap quality filters for web text."""
    toks = tokens_expr()
    stop = _marker_hits_expr("en")
    return docs.selectExpr(
        "doc_id",
        "cast(length(text) as bigint) as n_chars",
        f"cast(size({toks}) as bigint) as n_tokens",
        f"round((length(text) - size({toks}) + 1) / size({toks}), 6) as avg_token_len",
        f"round({stop} / size({toks}), 6) as stopword_ratio",
        "round(length(regexp_replace(text, '[^a-zA-Z]', '')) / length(text), 6)"
        " as alpha_ratio",
    ).selectExpr(
        "*",
        # composite score in [0,1]: enough tokens, sane token length,
        # some stopwords, mostly alphabetic
        # floor-based half-up rounding: the composite sums 6dp-rounded
        # terms x 0.25 and can land EXACTLY on a 5e-7 boundary, where
        # Spark (BigDecimal HALF_UP) and DuckDB (scaled-double) round()
        # disagree by 1e-6; floor(x*1e6 + 0.5)/1e6 stays in pure IEEE
        # arithmetic, so both engines compute the identical double
        "floor((least(n_tokens / 20.0, 1.0) * 0.25 "
        "+ (case when avg_token_len between 2 and 12 then 0.25 else 0.0 end) "
        "+ least(stopword_ratio * 5.0, 1.0) * 0.25 "
        "+ alpha_ratio * 0.25) * 1000000 + 0.5) / 1000000 as quality",
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens): whitespace tokens plus a
    BPE-ish subword estimate (ceil of char-span/4 per word, the common
    ~4-chars-per-token rule)."""
    toks = tokens_expr()
    return docs.selectExpr(
        "doc_id",
        f"cast(size({toks}) as bigint) as ws_tokens",
        f"cast(aggregate({toks}, 0L, (acc, t) -> acc + cast(ceil(length(t) / 4.0) as bigint)) "
        "as bigint) as bpe_ish_tokens",
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): order-sensitive rolling polynomial hash of
    the token stream — acc = (acc * 31 + H(token)) % P — the rolling-hash
    document fingerprint used for fast shift-sensitive identity."""
    toks = tokens_expr()
    return docs.selectExpr(
        "doc_id",
        f"aggregate({toks}, 0L, (acc, t) -> (acc * 31 + ({H('t')} % {P})) % {P}) "
        "as fingerprint",
    )
