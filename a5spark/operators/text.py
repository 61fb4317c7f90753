"""Text-analysis operators: token counting, quality scoring, language id,
document fingerprinting. Pure Catalyst expressions (JVM-side regex/string
ops) — deterministic and ANSI-SQL-reproducible for oracle checks."""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from a5spark.operators.dedup import content_digest

# tiny per-language stopword marker sets for the n-gram heuristic
LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " die ", " und ", " das ", " ist "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " la ", " que ", " los ", " es "],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND at letter/digit/
    punctuation class transitions (a cheap stand-in for BPE tokenizers)."""
    pieces = F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces)


def punct_ratio(text: Column) -> Column:
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[.,;:!?]"), 0))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def upper_ratio(text: Column) -> Column:
    n_upper = F.size(F.regexp_extract_all(text, F.lit(r"[A-Z]"), 0))
    return n_upper / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    # NOTE: deliberately counts the BARE marker substrings (w.strip()), so
    # 'the' inside 'weather' also counts — a cheap density proxy, NOT the
    # whole-word matching lang_id does with the padded ' the ' forms. The
    # doc_quality oracle bakes this exact substring semantics; changing it
    # to whole-word matching requires updating that oracle in lockstep.
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits = None
    for words in (LANG_MARKERS["en"],):
        for w in words:
            c = F.size(F.regexp_extract_all(padded, F.lit(w.strip()), 0))
            hits = c if hits is None else hits + c
    return hits / F.greatest(token_count(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Deterministic [0, 1] quality heuristic combining length, punctuation
    presence, stopword density and shouting ratio."""
    length_term = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    punct_term = F.least(punct_ratio(text) * 20.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    shout_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - upper_ratio(text) * 4.0)
    return F.round(
        (length_term + punct_term + stop_term + shout_penalty) / 4.0, 6
    )


def lang_id(text: Column) -> Column:
    """Marker-count argmax language guess ('und' when no markers hit).
    Ties break in fixed language order en > de > fr > es."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {}
    for lang, words in LANG_MARKERS.items():
        s = None
        for w in words:
            c = F.size(F.regexp_extract_all(padded, F.lit(w), 0))
            s = c if s is None else s + c
        scores[lang] = s
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in ("en", "de", "fr", "es"):
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def fingerprint(text: Column) -> Column:
    """Normalized content fingerprint: lowercase, collapse whitespace, strip
    non-alphanumerics, digest."""
    norm = F.regexp_replace(F.lower(text), r"[^a-z0-9 ]", "")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return content_digest(norm)


def text_profile(df: DataFrame, text: str = "text") -> DataFrame:
    """Attach the full analysis column set."""
    t = F.col(text)
    return (
        df.withColumn("n_tokens", token_count(t).cast("long"))
        .withColumn("n_subtokens", bpe_ish_token_count(t).cast("long"))
        .withColumn("quality", quality_score(t))
        .withColumn("lang_guess", lang_id(t))
        .withColumn("fingerprint", fingerprint(t))
    )
