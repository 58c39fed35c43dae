"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

Everything is built from JVM-side expressions (split / filter /
regexp / md5) — no Python in the hot path — and each operator has an
exact DuckDB-SQL equivalent for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from marketdatapipeline_spark.textops.dedup import MERSENNE_P, md5_int

#: Marker tokens per language for the n-gram/stopword voting heuristic.
#: Deterministic and tiny on purpose — the operator is the vote +
#: argmax machinery; richer marker lists slot in without plan changes.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "that", "with"),
    "fr": ("le", "la", "les", "et", "des", "une", "est"),
    "es": ("el", "los", "las", "que", "una", "por", "con"),
    "de": ("der", "die", "das", "und", "nicht", "mit", "ist"),
}

#: Stopwords for the quality signal (English-biased, as in common
#: quality filters; ratio features stay meaningful on any corpus).
STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def _word_count_expr(text: Column, words: tuple[str, ...]) -> Column:
    """Count whitespace-delimited tokens of ``text`` that exactly equal
    one of ``words`` (plain-letter words only — no regex escaping),
    case-insensitively.

    Equivalent to ``size(filter(split(trim(text),'\\s+'), w ->
    words contains lower(w)))`` but stays a single regexp_count inside
    whole-stage codegen — higher-order functions are interpreted per
    element and were the dominant cost of the quality/language
    queries. Counting needs delimiter-bounded matches without
    lookarounds (Java evaluates lookbehind-alternations slowly, ~7x
    the cost of the rest of the quality plan combined): whitespace
    runs are normalized to DOUBLE spaces and the ends padded, so every
    token owns a space on each side and the plain pattern
    ``" (?:w1|w2) "`` can consume its delimiters without stealing a
    neighbour's — adjacent marker tokens ("the the") still both match."""
    alt = "|".join(words)
    padded = F.concat(
        F.lit(" "), F.regexp_replace(F.lower(text), r"\s+", "  "), F.lit(" ")
    )
    return F.regexp_count(padded, F.lit(f" (?:{alt}) "))


def add_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a word-character count (BPE-ish proxy:
    alnum runs), both as scan-side expressions."""
    words = _tokens(text_col)
    return df.withColumns(
        {
            "n_tokens": F.size(words),
            # count of [A-Za-z0-9]+ runs == size(filter(split(text,
            # '[^A-Za-z0-9]+'), t -> t != '')) without the HOF
            "n_words": F.regexp_count(F.col(text_col), F.lit("[A-Za-z0-9]+")),
        }
    )


def add_quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals
    (the standard pre-training quality-filter features).

    All counts are codegen-side regexp expressions: stopword hits via
    delimiter-bounded regexp_count (see :func:`_word_count_expr`), and
    the token-length sum as ``length(text minus whitespace)`` — both
    exactly equal to the per-token fold they replace."""
    text = F.col(text_col)
    words = _tokens(text_col)
    n_tok = F.size(words)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_stop = _word_count_expr(F.trim(text), STOPWORDS)
    # sum(length(w) for w in split(trim(text), '\s+')) == every
    # non-whitespace character of text, counted once
    mean_word_len = F.length(F.regexp_replace(text, r"\s+", "")) / n_tok.cast("double")
    return df.withColumns(
        {
            "n_chars_calc": n_chars,
            "punct_ratio": n_punct / n_chars.cast("double"),
            "stopword_ratio": n_stop / n_tok.cast("double"),
            "mean_word_len": mean_word_len,
        }
    )


def add_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token voting language ID.

    Counts marker hits per language over lowercased tokens; predicts
    the argmax with a deterministic tie-break (declaration order,
    'und' = undetermined when nothing matched). A CJK-codepoint check
    routes Chinese before the Latin vote.
    """
    scores = {
        lang: _word_count_expr(F.trim(F.col(text_col)), markers)
        for lang, markers in LANG_MARKERS.items()
    }
    has_cjk = F.col(text_col).rlike(r"[一-鿿]")

    langs = list(LANG_MARKERS)
    best = None
    for lang in langs:
        cond_better = F.lit(True)
        for other in langs:
            if other == lang:
                continue
            op = (
                scores[lang] >= scores[other]
                if langs.index(other) > langs.index(lang)
                else scores[lang] > scores[other]
            )
            cond_better = cond_better & op
        step = F.when(cond_better & (scores[lang] > 0), F.lit(lang))
        best = step if best is None else best.when(
            cond_better & (scores[lang] > 0), F.lit(lang)
        )
    pred = F.when(has_cjk, F.lit("zh")).otherwise(F.coalesce(best, F.lit("und")))
    out = df.withColumn("lang_pred", pred)
    for lang in langs:
        out = out.withColumn(f"score_{lang}", scores[lang])
    return out


def add_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two document fingerprints:

    - ``fp_md5``: md5 of whitespace-normalized lowercase text — the
      canonical exact-dup key under formatting noise;
    - ``fp_roll``: order-sensitive rolling hash — sum over token
      positions of H(token) * (pos + 1) mod p. Content AND order
      sensitive, one narrow aggregate-free expression.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    words = _tokens(text_col)
    roll = (
        F.aggregate(
            F.zip_with(
                words,
                F.sequence(F.lit(1), F.size(words)),
                lambda w, i: (md5_int(w) % MERSENNE_P) * i.cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc + x) % F.lit(MERSENNE_P).cast("bigint"),
        )
    )
    return df.withColumns({"fp_md5": F.md5(norm), "fp_roll": roll})


def add_web_noise_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Web-corpus noise signals used by standard pre-training filters
    alongside :func:`add_quality_signals`:

    - ``url_count`` / ``email_count`` — scheme-anchored URL and
      name@host.tld counts (boilerplate / link-farm indicator);
    - ``digit_ratio`` — digit characters over all characters
      (tables, serial dumps, logspam);
    - ``upper_ratio`` — uppercase letters over cased letters
      (shouting / headline scrapes; cased-letter denominator so
      CJK or digit-heavy text is not penalized).

    All scan-side ``regexp_count``/``length`` expressions (no
    higher-order functions, no lookarounds) with direct DuckDB
    equivalents, same style as the other signal builders here.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    n_digits = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    n_lower = n_chars - F.length(F.regexp_replace(text, r"[a-z]", ""))
    cased = n_upper + n_lower
    return df.withColumns(
        {
            "url_count": F.regexp_count(text, F.lit(r"https?://[^\s]+")),
            "email_count": F.regexp_count(
                text, F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
            ),
            "digit_ratio": F.when(
                n_chars > 0, n_digits / n_chars.cast("double")
            ).otherwise(F.lit(0.0)),
            "upper_ratio": F.when(cased > 0, n_upper / cased.cast("double")).otherwise(
                F.lit(0.0)
            ),
        }
    )


def add_readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add Flesch reading-ease readability signals:

    - ``n_sentences`` — sentence-final punctuation runs
      (``[.!?]+``), floored at 1 (a fragment is one sentence);
    - ``n_words`` — whitespace tokens;
    - ``n_syllables`` — per word, the count of vowel GROUPS
      (``[aeiouy]+`` on the lowercased word, floored at 1 — the
      standard dictionary-free approximation);
    - ``words_per_sentence`` / ``syllables_per_word`` /
      ``flesch_reading_ease``
      (``206.835 - 1.015 wps - 84.6 spw``), null on empty text.

    The quality-filter use: pretraining pipelines bucket documents by
    readability to balance simple/complex prose (e.g. textbook-style
    filtering). All counts are integers (engine-exact); the ratios
    and the Flesch chain are pinned-order IEEE ops — UNROUNDED
    oracle territory. Per-word syllable counts fold scan-side over
    the token array (no explode, no shuffle)."""
    words = F.filter(_tokens(text_col), lambda w: w != "")
    n_words = F.size(words)
    n_sent = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    )
    syl = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc
        + F.greatest(F.regexp_count(F.lower(w), F.lit("[aeiouy]+")), F.lit(1)),
    )
    wps = n_words.cast("double") / n_sent.cast("double")
    spw = syl.cast("double") / n_words.cast("double")
    flesch = (
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    )
    has = n_words > 0
    return df.withColumns(
        {
            "n_sentences": F.when(has, n_sent).cast("int"),
            "n_words": n_words.cast("int"),
            "n_syllables": F.when(has, syl).cast("int"),
            "words_per_sentence": F.when(has, wps),
            "syllables_per_word": F.when(has, spw),
            "flesch_reading_ease": F.when(has, flesch),
        }
    )


def add_char_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add character-level quality signals:

    - ``n_chars_total`` — character count;
    - ``char_entropy`` — Shannon entropy (bits) of the character
      distribution: low = repetitive/degenerate text (keyboard mash,
      padding), high = encrypted/binary junk; quality filters cut
      both tails;
    - ``digit_ratio`` / ``punct_ratio`` / ``space_ratio`` — the
      classic web-junk screens (tables of numbers, code dumps).

    Ratios are regexp counts over the total (integer-exact, one
    division — UNROUNDED territory); the entropy needs per-character
    frequencies, which no scalar expression holds, so the plan is
    one explode to (doc, char) rows + two aggregations — both
    map-side combinable, and chars (not strings) are single-byte-ish
    shuffle keys. Empty documents emit nulls."""
    n = F.length(F.col(text_col))
    digit = F.regexp_count(F.col(text_col), F.lit(r"[0-9]"))
    punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]"))
    space = F.regexp_count(F.col(text_col), F.lit(r"\s"))
    has = n > 0
    base = df.withColumns(
        {
            "n_chars_total": n.cast("int"),
            "digit_ratio": F.when(has, digit.cast("double") / n),
            "punct_ratio": F.when(has, punct.cast("double") / n),
            "space_ratio": F.when(has, space.cast("double") / n),
        }
    )
    return base


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_chars_total, char_entropy): the explode-based entropy
    companion to :func:`add_char_stats` (a separate function because
    it is the one signal that costs a shuffle). ``-sum(p log2 p)``
    over per-character frequencies; decimal term sums so the oracle
    matches; log2 is the libm boundary (round-6 at emission)."""
    chars = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "")).alias("_c"),
    ).filter(F.col("_c") != "")
    counts = chars.groupBy(id_col, "_c").agg(F.count("*").alias("_n"))
    tot = Window.partitionBy(id_col)
    p = F.col("_n").cast("double") / F.sum("_n").over(tot).cast("double")
    term = (-(p * F.log2(p))).cast("decimal(28,14)")
    per = counts.select(F.col(id_col), F.col("_n"), term.alias("_t"))
    return per.groupBy(id_col).agg(
        F.sum("_n").cast("int").alias("n_chars_total"),
        F.sum("_t").cast("double").alias("char_entropy"),
    )
