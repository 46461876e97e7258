"""Text-analysis operators for training-data pipelines (JVM-side, no UDFs).

Language-ID here is the classic stopword/n-gram profile heuristic: score a
document against small per-language marker-word profiles and take the
argmax.  Everything is built-in array functions, so it runs inside
whole-stage codegen and is expressible 1:1 in the DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# compact marker-word profiles (top function words per language)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"),
    "es": ("el", "la", "que", "los", "una", "por", "con", "para", "las", "es"),
}


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, lang_pred, hits, n_words): argmax of per-language marker-word
    hit counts over the distinct lowercase words; deterministic tie-break by
    language code order ('de' < 'en' < 'es' < 'fr').  Unscored docs (zero
    hits everywhere) predict 'und' (undetermined)."""
    text = F.coalesce(F.col(text_col), F.lit(""))  # NULL text == unscorable, not 'fr'
    words = F.array_distinct(F.split(F.lower(text), " "))
    scored = df.select(
        F.col(id_col),
        F.size(F.split(text, " ")).cast("long").alias("n_words"),
        *[
            F.size(
                F.array_intersect(words, F.array(*[F.lit(w) for w in profile]))
            ).cast("long").alias(f"_hits_{lang}")
            for lang, profile in sorted(LANG_PROFILES.items())
        ],
    )
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"_hits_{lang}") for lang in langs])
    pred = F.lit("und")
    # reversed so the FIRST language in sorted order wins ties
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col(f"_hits_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        id_col,
        pred.alias("lang_pred"),
        best.alias("hits"),
        "n_words",
    )
