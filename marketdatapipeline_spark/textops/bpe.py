"""Distributed BPE-merge induction support — the tokenizer-training
prep step (Sennrich et al., "Neural Machine Translation of Rare Words
with Subword Units") a pretraining pipeline runs to turn a corpus
into a trainable vocabulary. Adjacent-symbol pair counting and the
iterative merge loop both operate on the corpus's DISTINCT pre-token
frequency table (the classic word-frequency reduction: pair counts
are weighted by word frequency, so the heavy tail of repeated words
is aggregated once, not re-scanned per occurrence).

Scale shape: the only corpus-sized pass is the pre-token explode +
count (map-side combinable, keyed by the token string). Everything
after runs on the distinct-vocabulary table — bounded by vocabulary
size, not corpus size — and each merge iteration is one narrow
pair-explode + one map-combinable agg + one distributed top-1
(TakeOrderedAndProject, never a global sort). The per-iteration
argmax collects exactly ONE row (the bounded-manifest shape).

Merge application uses a flanked separator encoding: symbol state
``SEP s1 SEP SEP s2 SEP ... SEP`` makes a merge a plain literal
``replace`` (greedy, left-to-right, non-overlapping — exactly the
reference BPE scan order), evaluated JVM-side with no Python and no
per-symbol explode. Cross-engine: DuckDB's ``replace`` shares the
same scan semantics, so the oracle replays identical merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from marketdatapipeline_spark.textops.corpus import BPE_TOKEN_PATTERN

#: symbol-boundary separator (ASCII unit separator): never produced
#: by keyboards or web text encoders as content; pre-tokens that do
#: contain it are dropped with the same predicate on both engines
#: (control-character tokens are corpus garbage, not vocabulary).
SEP = "\x1f"


def bpe_word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct pre-token frequency table ``(word, freq)`` over
    :data:`~marketdatapipeline_spark.textops.corpus.BPE_TOKEN_PATTERN`
    matches — the word-frequency reduction every BPE implementation
    starts from. One corpus-sized explode + one map-combinable count;
    the result is vocabulary-sized."""
    toks = df.select(
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(BPE_TOKEN_PATTERN), F.lit(0)
            )
        ).alias("word")
    )
    return (
        toks.filter(~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _sym_init(word) -> "F.Column":
    """Initial symbol state: every character flanked by SEP
    (``SEP c1 SEP SEP c2 SEP ...``)."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(
        F.lit(SEP), F.array_join(chars, SEP + SEP), F.lit(SEP)
    )


def _state_pairs(words: DataFrame) -> DataFrame:
    """(pair_left, pair_right, pair_count) from a symbol-state table
    ``(_s, freq)``: parse symbols off the flanked encoding, zip
    adjacent, explode, weighted count (map-side combinable)."""
    syms = F.split(
        F.expr("substr(_s, 2, length(_s) - 2)"), SEP + SEP
    )
    pairs = F.zip_with(
        F.slice(syms, 1, F.size(syms) - 1),
        F.slice(syms, 2, F.size(syms) - 1),
        lambda left, right: F.struct(left.alias("l"), right.alias("r")),
    )
    return (
        words.select(F.explode(pairs).alias("_p"), "freq")
        .groupBy(
            F.col("_p.l").alias("pair_left"),
            F.col("_p.r").alias("pair_right"),
        )
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


def bpe_pair_counts(
    df: DataFrame, top_k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Top-``top_k`` adjacent character-pair counts over the corpus's
    pre-tokens, weighted by pre-token frequency — iteration 0 of BPE
    merge learning, i.e. the candidate table the first merge is
    chosen from. Deterministic total order (count desc, then pair
    lexicographic) so both engines select the identical k.

    Returns ``pair_left``, ``pair_right``, ``pair_count``.
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    freqs = bpe_word_freqs(df, text_col)
    state = freqs.select(_sym_init(F.col("word")).alias("_s"), "freq")
    return (
        _state_pairs(state)
        .orderBy(
            F.desc("pair_count"), "pair_left", "pair_right"
        )
        .limit(top_k)
    )


#: vocabulary-size bar for the driver-routed merge loop: below it the
#: distinct (word, freq) table collects (a few MB) and the loop runs
#: locally in one job; above it the distributed loop runs. 0 disables
#: the driver route (forced-route parity tests use this).
DRIVER_ROUTE_MAX_WORDS = 200_000


def bpe_learn_merges(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    driver_route_max_words: int | None = None,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus: each
    iteration counts adjacent-symbol pairs (weighted by pre-token
    frequency), picks the argmax (ties broken lexicographically so
    reruns and both engines agree), and applies the merge greedily
    left-to-right via the flanked-separator literal replace.

    Returns ``merge_rank`` (1-based), ``pair_left``, ``pair_right``,
    ``pair_count`` (the pair's weighted count when chosen) — the
    merge table a BPE tokenizer trains from, built as a driver-side
    frame of ``n_merges`` rows (each iteration's argmax is a one-row
    collect: the bounded-manifest shape; the data-scaled work stays
    in the vocabulary-table aggregations).
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    merges, _ = _learn(df, n_merges, text_col, driver_route_max_words)
    return df.sparkSession.createDataFrame(
        merges,
        "merge_rank int, pair_left string, pair_right string, "
        "pair_count long",
    )


def _learn(
    df: DataFrame,
    n_merges: int,
    text_col: str,
    driver_route_max_words: int | None = None,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """The merge loop shared by :func:`bpe_learn_merges` and
    :func:`bpe_encode_token_counts`: returns (merge list, persisted
    frequency table).

    SIZE-ROUTED (the dedup-clusters / graph-family pattern): the loop
    is inherently sequential — one global argmax per merge — so the
    distributed form pays ~2 job launches per iteration. When the
    distinct vocabulary is small (the probe count materializes the
    persisted frequency table, work both routes need), the (word,
    freq) pairs collect to the driver — a few MB, bounded by the
    threshold — and the identical walk runs locally in zero extra
    jobs. Forced-route tests pin both routes to the same merges.
    Above the bar (hundreds of millions of distinct pre-tokens at
    100 TB), the distributed loop is the only shape that fits.
    """
    from marketdatapipeline_spark.caching import scoped_persist

    freqs = scoped_persist(bpe_word_freqs(df, text_col))
    threshold = (
        DRIVER_ROUTE_MAX_WORDS
        if driver_route_max_words is None
        else driver_route_max_words
    )
    if threshold > 0 and freqs.count() <= threshold:
        wf = [(r["word"], r["freq"]) for r in freqs.collect()]
        return _learn_driver(wf, n_merges), freqs
    words = scoped_persist(
        freqs.select(_sym_init(F.col("word")).alias("_s"), "freq")
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _state_pairs(words)
            .orderBy(F.desc("pair_count"), "pair_left", "pair_right")
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        merges.append(
            (rank, b["pair_left"], b["pair_right"], b["pair_count"])
        )
        words = words.withColumn(
            "_s", _apply_merge(b["pair_left"], b["pair_right"])
        )
    return merges, freqs


def _learn_driver(
    wf: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-route twin of the distributed merge loop: same weighted
    pair counts, same (count desc, pair lex asc) argmax, same greedy
    left-to-right merge application — Python scalars instead of a
    Spark plan, pinned equal by the forced-route parity test.
    (Characters iterate as UTF-16 code units on the JVM side and code
    points here — identical on BMP text, which both the corpus
    convention and the oracle boundary already assume.)"""
    import collections

    vocab: dict[str, tuple[tuple[str, ...], int]] = {
        w: (tuple(w), f) for w, f in wf
    }
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs: collections.Counter = collections.Counter()
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, int(cnt)))
        for w, (syms, f) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (tuple(out), f)
    return merges


def _apply_merge(left: str, right: str, col: str = "_s") -> "F.Column":
    """One learned merge as a literal replace on the flanked symbol
    state — greedy, left-to-right, non-overlapping in both engines."""
    find = SEP + left + SEP + SEP + right + SEP
    repl = SEP + left + right + SEP
    return F.replace(col, F.lit(find), F.lit(repl))


def bpe_encode_token_counts(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_route_max_words: int | None = None,
) -> DataFrame:
    """Per-document token counts under the learned ``n_merges``-merge
    BPE vocabulary — the budget metric AFTER tokenizer induction
    (``add_token_estimate``'s pre-tokenizer count is the before): how
    many symbols each document costs once the corpus's own merges
    compress it.

    Learns the merges (same trajectory as :func:`bpe_learn_merges`),
    applies them to the DISTINCT pre-token vocabulary (``n_merges``
    chained literal replaces on the flanked symbol state — one
    vocabulary-sized projection, never per-occurrence work), then one
    corpus-sized pre-token explode joins each document's tokens to
    their symbol counts. Returns ``id_col``, ``n_pretokens``,
    ``n_tokens_vocab`` (both 0 for documents with no pre-tokens).
    """
    merges, freqs = _learn(df, n_merges, text_col, driver_route_max_words)
    state = _sym_init(F.col("word"))
    for _, left, right, _c in merges:
        find = SEP + left + SEP + SEP + right + SEP
        repl = SEP + left + right + SEP
        state = F.replace(state, F.lit(find), F.lit(repl))
    n_sym = F.size(
        F.split(state.substr(F.lit(2), F.length(state) - 2), SEP + SEP)
    )
    vocab = freqs.select("word", n_sym.alias("_nsym"))
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(BPE_TOKEN_PATTERN), F.lit(0)
            )
        ).alias("word"),
    ).filter(~F.col("word").contains(SEP))
    agg = (
        toks.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_pretokens"),
            F.sum("_nsym").cast("long").alias("n_tokens_vocab"),
        )
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_pretokens", F.lit(0)).alias("n_pretokens"),
            F.coalesce("n_tokens_vocab", F.lit(0).cast("long")).alias(
                "n_tokens_vocab"
            ),
        )
    )
