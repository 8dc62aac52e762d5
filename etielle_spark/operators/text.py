"""Text analysis operators: tokenization stats, quality scoring,
language ID, fingerprinting.  All pure column expressions (codegen'd);
designed to run in the same scan pass as other per-document operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import _normalize, let_, tokens_col
from ..session import ship_package

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Public knowledge; intentionally small — language ID at scale is a
# scoring pass over a broadcast keyword table, which is exactly this shape.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "with", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "las", "es", "no", "por", "que", "una", "para"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (empty tokens excluded)."""
    return F.size(tokens_col(text)).cast("bigint")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics: count, distinct count, avg length,
    and a BPE-ish subword estimate (chars/4 heuristic used by LLM costing).

    One tokenizer pass per row: the token array binds once through
    ``let_`` (CollapseProject would otherwise inline the regex split
    into every stat — 3 splits/row in the round-2 shape), and the
    token-length sum is the count of non-whitespace characters (tokens
    ARE the non-whitespace segments), one codegen'd regexp_replace
    instead of an interpreted transform+aggregate fold."""
    text = F.col(text_col)
    n_nonspace = F.length(
        F.regexp_replace(F.lower(F.trim(text)), r"\s+", "")
    ).cast("double")

    def stats(toks: Column) -> Column:
        n = F.size(toks)
        return F.struct(
            n.cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        )

    s = let_(tokens_col(text), stats)
    return df.select(
        F.col(id_col),
        s.getField("n_tokens").alias("n_tokens"),
        s.getField("n_distinct").alias("n_distinct_tokens"),
        F.round(
            F.when(
                s.getField("n_tokens") > 0,
                n_nonspace / s.getField("n_tokens"),
            ),
            4,
        ).alias("avg_token_len"),
        F.ceil(F.length(text) / 4).cast("bigint").alias("est_bpe_tokens"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document-quality features + a composite score.

    Features mirror common pretraining-data filters: document length,
    punctuation ratio, uppercase ratio, stopword ratio, mean word length.
    """
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text).cast("double")
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]]", "")).cast("double")
    n_upper = F.length(F.regexp_replace(text, r"[^A-Z]", "")).cast("double")
    all_stop = [w for ws in _LANG_MARKERS.values() for w in ws]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(all_stop)))
    n_tok = F.size(toks)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    upper_ratio = F.when(n_chars > 0, n_upper / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0))
    score = (
        F.least(n_tok.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + stop_ratio * 0.4
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-hit language ID: count marker-token hits per language,
    pick the argmax (ties break to the lexicographically greatest code;
    'und' = undetermined when zero hits).  The broadcast-keyword-scoring
    shape scales to any corpus: one pass, no shuffle."""
    toks = tokens_col(F.col(text_col))

    def marker_hits(words: list[str]):
        # NB: a plain closure, not a default-arg lambda — pyspark treats a
        # two-parameter lambda as an (element, index) higher-order function
        return F.size(F.filter(toks, lambda t: t.isin(words)))

    hit_cols = []
    for lang, words in sorted(_LANG_MARKERS.items()):
        hit_cols.append(F.struct(marker_hits(words).alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*hit_cols))
    return df.select(
        F.col(id_col),
        F.when(best.getField("hits") > 0, best.getField("lang"))
        .otherwise(F.lit("und"))
        .alias("pred_lang"),
        best.getField("hits").cast("bigint").alias("marker_hits"),
    )


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic content fingerprints: md5 of normalized text plus a
    64-bit-style rolling digest of the first/last normalized 64 chars
    (cheap prefilter for near-identical head/tail edits)."""
    norm = _normalize(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
        F.md5(F.substring(norm, 1, 64)).alias("head_fp"),
        F.md5(F.substring(F.reverse(norm), 1, 64)).alias("tail_fp"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )


def ngrams_all(toks: Column, n: int) -> Column:
    """ALL word n-gram occurrences (non-distinct) — the repetition
    signals need per-occurrence counts, unlike the dedup shingles.
    Same shift-zip construction as dedup.grams_of (CollapseProject-safe);
    a document shorter than n grams yields an empty array (not the
    whole-document fallback gram that grams_of emits for shingling)."""
    gram = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        gram = F.zip_with(gram, shifted, lambda g, t: F.concat(g, F.lit(" "), t))
    return F.when(F.size(toks) >= n, F.array_compact(gram)).otherwise(
        F.array().cast("array<string>")
    )


def repetition_signals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """Gopher-style within-document repetition filters (Rae et al. 2021):

    - ``dup_line_frac``: excess line occurrences / total lines
      ((count-1) summed over repeated lines).
    - ``dup_line_char_frac``: characters in those excess occurrences /
      total line characters.
    - ``top_ngram_char_frac``: characters covered by the single most
      frequent word ``top_n``-gram (count * gram length) / document chars.
    - ``dup_ngram_char_frac``: characters in excess occurrences of
      repeated ``dup_n``-grams / document chars (overlaps not collapsed —
      the standard cheap approximation).

    Distributed shape: explode -> two-level aggregation keyed by
    (doc, line|gram) then by doc — both shuffles are on well-spread keys,
    partial aggregation applies, nothing is collected.  Empty documents
    yield NULL fractions.
    """
    from .dedup import tokens_col

    base = df.select(F.col(id_col), F.col(text_col).alias("__text"))

    lines = (
        base.select(F.col(id_col), F.explode(F.split(F.col("__text"), "\n")).alias("ln"))
        .groupBy(id_col, "ln")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_lines"),
            F.sum(F.col("c") - 1).alias("dup_lines"),
            F.sum((F.col("c") - 1) * F.length("ln")).alias("dup_line_chars"),
            F.sum(F.col("c") * F.length("ln")).alias("line_chars"),
        )
    )

    def gram_agg(n: int, out_expr):
        return (
            base.select(
                F.col(id_col),
                F.length("__text").alias("n_chars"),
                F.explode(ngrams_all(tokens_col(F.col("__text")), n)).alias("g"),
            )
            .groupBy(id_col, "n_chars", "g")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(id_col, "n_chars")
            .agg(out_expr)
        )

    top = gram_agg(top_n, F.max(F.col("c") * F.length("g")).alias("top_chars"))
    dup = gram_agg(
        dup_n, F.sum((F.col("c") - 1) * F.length("g")).alias("dup_gram_chars")
    )

    def frac(num: Column, den: Column) -> Column:
        return F.round(F.when(den > 0, num.cast("double") / den), 6)

    return (
        base.select(id_col, F.length("__text").alias("n_chars"))
        .join(lines, id_col, "left")
        .join(top.drop("n_chars"), id_col, "left")
        .join(dup.drop("n_chars"), id_col, "left")
        .select(
            F.col(id_col),
            frac(F.col("dup_lines"), F.col("n_lines")).alias("dup_line_frac"),
            frac(F.col("dup_line_chars"), F.col("line_chars")).alias(
                "dup_line_char_frac"
            ),
            frac(F.coalesce(F.col("top_chars"), F.lit(0)), F.col("n_chars")).alias(
                "top_ngram_char_frac"
            ),
            frac(F.coalesce(F.col("dup_gram_chars"), F.lit(0)), F.col("n_chars")).alias(
                "dup_ngram_char_frac"
            ),
        )
    )


def unigram_nll(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """CCNet-style perplexity proxy (Wenzek et al. 2020): score each
    document by the mean negative log-probability of its tokens under a
    unigram model fit on the corpus itself.  High NLL = rare/garbled
    vocabulary; the standard cheap stand-in for a KenLM quality filter.

    Two global passes, both distributed:

    1. token explode -> groupBy(token) count (partial agg map-side; the
       shuffle carries one row per vocabulary type, not per occurrence);
    2. join the exploded tokens back to the vocabulary table and average
       ``-ln(count/total)`` per document.

    The vocabulary frame is left unhinted: at test scale AQE broadcasts
    it; at 100 TB vocabularies (1e8+ types) it exceeds broadcast range
    and the same plan runs as a shuffle join on the token — both sides
    are already exploded, so no extra pass is paid.

    Returns ``(id_col, n_toks, nll)``; documents with no tokens are
    absent (no tokens to score).
    """
    from .dedup import tokens_col

    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("total"))
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(
                F.avg(-F.log(F.col("c").cast("double") / F.col("total"))), round_to
            ).alias("nll"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF
    (``tf * ln((N + 1) / (df + 1))``), ties broken by term text
    ascending for determinism.

    Shape: explode -> per-(doc, term) counts -> document-frequency table
    joined back on the term -> rank with a window partitioned by doc.
    The window partitions on the document id, so no global sort; the DF
    table is vocabulary-sized.

    Returns ``(id_col, term, tfidf, rank)`` with ``rank`` in 1..k.
    """
    from .dedup import tokens_col

    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    from pyspark.sql import Window

    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)
                ),
                round_to,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def quality_filter_verdict(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_tokens: int = 20,
    max_top_ngram_frac: float = 0.12,
    max_nll: float = 3.5,
) -> DataFrame:
    """Composite keep/drop verdict — the assembled filter stage of a
    pretraining pipeline: length gate (token count), within-document
    repetition gate (``repetition_signals``), LM-quality gate
    (``unigram_nll``), evaluated in that precedence order.

    All three feature frames compute from one underlying corpus scan
    each and join back on the id; every comparison is against the
    ROUNDED feature value, so an external oracle reproduces the same
    keep set bit-for-bit.  Returns ``(id_col, keep, reason)`` where
    ``reason`` is the first failing gate ('too_short' | 'repetitive' |
    'high_nll') or 'ok'.
    """
    from .dedup import tokens_col

    toks = df.select(
        F.col(id_col), F.size(tokens_col(F.col(text_col))).alias("__nt")
    )
    rep = repetition_signals(df, id_col, text_col, top_n=2, dup_n=3).select(
        F.col(id_col), F.col("top_ngram_char_frac").alias("__rep")
    )
    nll = unigram_nll(df, id_col, text_col).select(
        F.col(id_col), F.col("nll").alias("__nll")
    )
    reason = (
        F.when(F.col("__nt") < min_tokens, F.lit("too_short"))
        .when(F.col("__rep") > max_top_ngram_frac, F.lit("repetitive"))
        .when(F.col("__nll") > max_nll, F.lit("high_nll"))
        .otherwise(F.lit("ok"))
    )
    return (
        toks.join(rep, id_col, "left")
        .join(nll, id_col, "left")
        .select(F.col(id_col), reason.alias("reason"))
        .select(
            id_col, (F.col("reason") == "ok").alias("keep"), "reason"
        )
    )


# ---------------------------------------------------------------------------
# PII redaction, chunking, token entropy
# ---------------------------------------------------------------------------

# Deliberately simple patterns restricted to syntax portable between
# Java regex and RE2-family engines (no lookarounds, no backrefs):
# redaction at corpus scale is a fleet of regexp_replace passes, and the
# operator's job is ordering + counting, not pattern research.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\-]{6,14}\d", "<PHONE>"),
]


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Scrub PII-shaped spans (emails, IPv4 addresses, phone-like
    numbers) from ``text_col``, replacing each with a typed placeholder
    token, and count the matches per type.

    Patterns run in a fixed order (email before ip before phone) on the
    progressively redacted text, so an email's host can't double-count
    as an IP; the placeholders contain no digits, so later patterns
    can't match inside earlier replacements.  Pure ``regexp_replace`` /
    ``regexp_extract_all`` column expressions — one scan pass, no
    shuffle, whole-stage codegen.

    Returns ``(id, redacted, n_email, n_ip, n_phone)``.
    """
    out = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    red = F.col("__t")
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0)))
            .cast("bigint")
            .alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, token)
    return out.select(F.col(id_col), red.alias("redacted"), *counts)


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document's whitespace tokens into fixed-size chunks of
    ``chunk_size`` tokens advancing by ``stride`` (overlap =
    ``chunk_size - stride``) — the standard context-window chunking step
    of an embedding / pretraining pipeline.

    Chunk starts are ``0, stride, 2*stride, ...``; the last chunk starts
    at the smallest multiple of ``stride`` from which it reaches the end
    (it may be shorter than ``chunk_size``).  A document with at most
    ``chunk_size`` tokens yields exactly one chunk; an empty document
    yields none.

    Pure array expressions: ``sequence`` generates the starts,
    ``posexplode`` fans out, ``slice`` + ``array_join`` materialize each
    chunk.  No shuffle at all — chunking pipelines into the scan, and
    the output inherits the input partitioning (no skew: fan-out per row
    is bounded by tokens/stride).

    Returns ``(id, chunk_idx, start_token, n_tokens, chunk_text)``.
    """
    if chunk_size < 1 or stride < 1:
        raise ValueError("chunk_size and stride must be >= 1")
    if stride > chunk_size:
        raise ValueError("stride must be <= chunk_size (contiguous cover)")
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n = F.size(toks)
    n_chunks = F.when(n <= 0, F.lit(0)).when(n <= chunk_size, F.lit(1)).otherwise(
        ((n - chunk_size + stride - 1) / stride).cast("int") + 1
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("__nc") - 1, F.lit(0)) * stride, F.lit(stride)
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"), n_chunks.alias("__nc"))
        .filter(F.col("__nc") > 0)
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.posexplode(starts).alias("chunk_idx", "__start"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("__start").cast("bigint").alias("start_token"),
            F.size(F.slice(F.col("__toks"), F.col("__start") + 1, chunk_size))
            .cast("bigint")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("__toks"), F.col("__start") + 1, chunk_size), " "
            ).alias("chunk_text"),
        )
    )


def token_entropy(
    df: DataFrame, id_col: str, text_col: str, *, round_to: int = 6
) -> DataFrame:
    """Per-document Shannon entropy (nats) of the unigram distribution —
    a repetition/quality signal: near-zero entropy means the document is
    a few tokens repeated.

    Computed as ``ln(n) - sum(c*ln(c))/n`` over per-token counts, which
    needs only two keyed aggregations (doc+token counts, then per-doc
    fold) — both shuffle on the document id, and the second reuses the
    first's partitioning.  Returns ``(id, n_tokens, entropy)``.
    """
    toks = tokens_col(F.col(text_col))
    per_tok = (
        df.select(F.col(id_col), F.explode(toks).alias("__tok"))
        .groupBy(id_col, "__tok")
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
    )
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.sum("__c").alias("__n"),
            F.sum(F.col("__c") * F.log(F.col("__c"))).alias("__clc"),
        )
        .select(
            F.col(id_col),
            F.col("__n").cast("bigint").alias("n_tokens"),
            F.round(
                F.log(F.col("__n")) - F.col("__clc") / F.col("__n"), round_to
            ).alias("entropy"),
        )
    )


def bigram_nll(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Bigram-LM quality score: mean negative log conditional
    probability ``-ln(c(w1 w2) / c(w1 ·))`` of each document's bigrams
    under counts fit on the corpus itself — one order up from
    ``unigram_nll``, the next-cheapest KenLM stand-in.

    Same distributed shape as the unigram pass: bigram explode ->
    vocabulary count (one row per bigram TYPE crosses the shuffle),
    context totals folded from the bigram counts (no second corpus
    pass), then a join back and per-document average.  Documents with
    fewer than two tokens are absent.

    Returns ``(id, n_bigrams, nll)``.
    """
    from .dedup import tokens_col

    toks = tokens_col(F.col(text_col))
    grams = df.select(
        F.col(id_col), F.explode(ngrams_all(toks, 2)).alias("bg")
    )
    vocab = grams.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    ctx = vocab.groupBy(
        F.split(F.col("bg"), " ").getItem(0).alias("w1")
    ).agg(F.sum("c2").alias("c1"))
    return (
        grams.join(vocab, "bg")
        .join(ctx, F.split(F.col("bg"), " ").getItem(0) == F.col("w1"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.avg(-F.log(F.col("c2").cast("double") / F.col("c1"))),
                round_to,
            ).alias("nll"),
        )
    )


def interpolated_nll(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    lam: float = 0.7,
    round_to: int = 6,
) -> DataFrame:
    """Jelinek-Mercer interpolated bigram LM score: mean
    ``-ln(lam * c(w1 w2)/c(w1 .) + (1-lam) * c(w2)/T)`` per document —
    the smoothing step between ``bigram_nll`` (which assigns unseen
    bigrams nothing: they never miss, the model is corpus-fit) and a
    real KenLM: the unigram backoff keeps the estimate finite for rare
    contexts and is the form actually used for perplexity filtering.

    Shape (round 10 — ONE tokenize pass, previously three): the corpus
    explodes once to a ``(id, w1, w2-or-NULL)`` token/next-token pair
    frame (``zip_with`` pads the shorter array, so every token appears
    exactly once as ``w1`` with NULL ``w2`` at document ends), persisted
    for its consumers — unigram counts are ``w1`` counts, bigram
    occurrences are the non-NULL rows, the bigram-TYPE vocabulary and
    the context totals fold from those, and the scoring joins key on
    the pair columns directly (no re-split of the bigram string).  All
    SHUFFLES are counts-level (types, not occurrences), but the pinned
    CACHE is the occurrence-scale ``(id, w1, w2)`` pair frame itself —
    it grows linearly with corpus tokens (unlike the vocabulary-sized
    count caches in pmi/keyness), spills to disk at MEMORY_AND_DISK,
    and is held until ``release_operator_caches()`` in a long-lived
    driver; size cache plans accordingly.  Documents with fewer than
    two tokens are absent.

    Returns ``(id, n_bigrams, nll)``.
    """
    if not 0.0 < lam <= 1.0:
        raise ValueError("lam must be in (0, 1]")
    from pyspark import StorageLevel

    from ..caches import track_cache
    from .dedup import tokens_col

    toks_arr = tokens_col(F.col(text_col))
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                toks_arr,
                F.slice(toks_arr, 2, F.greatest(F.size(toks_arr) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("pr"),
    ).select(F.col(id_col), F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
    pairs = track_cache(pairs.persist(StorageLevel.MEMORY_AND_DISK))
    grams = pairs.filter(F.col("w2").isNotNull())
    vocab2 = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ctx = vocab2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    uni = pairs.groupBy(F.col("w1").alias("tok")).agg(
        F.count(F.lit(1)).alias("cu")
    )
    total = uni.agg(F.sum("cu").alias("total"))
    p = F.lit(float(lam)) * F.col("c2").cast("double") / F.col("c1") + F.lit(
        1.0 - float(lam)
    ) * F.col("cu").cast("double") / F.col("total")
    return (
        grams.join(vocab2, ["w1", "w2"])
        .join(ctx, "w1")
        .join(uni, grams["w2"] == F.col("tok"))
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), round_to).alias("nll"),
        )
    )


# Portable approximation of the GPT-2 pre-tokenizer: letter runs, digit
# runs, and punctuation runs, each optionally preceded by one space.
# (The original's contraction cases and lookahead whitespace rule need
# regex features RE2-family engines lack; this keeps the split points
# engines agree on.)
BPE_PRETOKEN_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"


def bpe_pretokenize_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Pre-tokenizer statistics: the number of BPE pre-token spans (the
    unit a subword tokenizer then splits) and distinct spans per
    document — the accurate version of the chars/4 token estimate.
    One regexp_extract_all per row, no shuffle."""
    spans = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_PRETOKEN_PATTERN), F.lit(0)
    )
    return df.select(
        F.col(id_col),
        F.size(spans).cast("bigint").alias("n_pretokens"),
        F.size(F.array_distinct(spans)).cast("bigint").alias("n_distinct_pretokens"),
    )


def feature_hash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 256,
) -> DataFrame:
    """Hashing-trick featurization: map each token to one of
    ``n_buckets`` via md5 and count occurrences per (document, bucket)
    — fixed-width sparse features with no vocabulary pass, the standard
    trick when the vocab won't fit or drifts.

    The bucket is the first 8 md5 nibbles mod ``n_buckets`` (engine-
    independent, unlike ``hash()``).  One explode + one groupBy on
    (id, bucket); no vocabulary state anywhere.

    Returns ``(id, bucket, n)``.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    return (
        toks.select("id", bucket.alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def vocab_stats(df: DataFrame, text_col: str, *, top_k: int = 10) -> DataFrame:
    """Corpus-level vocabulary profile in one pass over the token
    stream: total tokens, distinct types, hapax count (frequency-1
    types), type/token ratio, and the corpus frequency share of the
    ``top_k`` most frequent tokens (the Zipf head) — the sanity gate
    that catches tokenizer breakage and template spam at ingest.

    Plan: explode tokens, ONE groupBy(token) count (the only wide
    state, spread across the vocabulary), then a single global rollup
    of that (small) frequency table plus a top-k take.  Token counts
    never come back to the driver.

    Returns one row: ``(n_tokens, n_types, n_hapax, type_token_ratio,
    top{top_k}_share, top_tokens)`` where ``top_tokens`` is a
    '|'-joined "token:count" list in (count desc, token asc) order.
    """
    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    top = (
        freq.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(top_k)
        .select(
            F.sum("c").alias("top_c"),
            F.array_join(
                F.collect_list(F.concat(F.col("tok"), F.lit(":"), F.col("c"))), "|"
            ).alias("top_tokens"),
        )
    )
    totals = freq.agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum((F.col("c") == 1).cast("bigint")).cast("bigint").alias("n_hapax"),
    )
    return (
        totals.crossJoin(top)
        .select(
            "n_tokens",
            "n_types",
            "n_hapax",
            F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 6).alias(
                "type_token_ratio"
            ),
            F.round(F.col("top_c").cast("double") / F.col("n_tokens"), 6).alias(
                f"top{top_k}_share"
            ),
            "top_tokens",
        )
    )


def bpe_merge_candidates(
    df: DataFrame, text_col: str, *, top_n: int = 20
) -> DataFrame:
    """One BPE vocabulary-training step: count adjacent character pairs
    across the corpus (weighted by word frequency) and return the top
    ``top_n`` merge candidates — the inner loop of byte-pair-encoding
    tokenizer training (Sennrich et al. 2016), map-reduced.

    Two cheap shuffles, both on tiny keys: corpus -> distinct-word counts
    (the word table is orders of magnitude smaller than the corpus), then
    word -> pair explode -> pair counts.  Everything before the first
    groupBy is a single scan with codegen'd split/explode; no Python.

    Ties order by pair text ascending so the result is deterministic.
    Returns ``(pair, cnt)``.
    """
    toks = tokens_col(F.col(text_col))
    words = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.length("w") >= 2)
    )
    # substring with a dynamic start needs Column.substr (the three-arg
    # F.substring takes a literal pos)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        F.col("wc"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(top_n)
    )


def token_budget_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    budget: int,
) -> DataFrame:
    """Per-group token-budget sampling: walk each group's documents in
    ``id_col`` order and keep documents while the group's cumulative
    token count stays within ``budget`` — the "give me 50B tokens per
    source" step of assembling a training mixture.

    One window shuffle partitioned by the group column; the running sum
    is a single pass per partition.  A document that would cross the
    budget line is dropped along with everything after it (strict
    prefix), which keeps the rule deterministic and order-respecting.

    Returns ``(id, group, n_tokens, cum_tokens)`` for kept documents.
    """
    from pyspark.sql import Window

    n_toks = F.size(tokens_col(F.col(text_col))).cast("bigint")
    w = (
        Window.partitionBy("group")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(group_col).alias("group"),
            n_toks.alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
    )


def quality_percentile_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    *,
    keep_frac: float = 0.3,
) -> DataFrame:
    """Relative quality filtering (DCLM-style): keep the top
    ``keep_frac`` fraction of documents PER GROUP by the heuristic
    quality score, instead of a fixed threshold — per-source score
    distributions differ, and an absolute cutoff over- or under-prunes
    each source.

    One window shuffle on the group column (score computation rides the
    scan).  ``percent_rank`` over (score desc, id) makes the boundary
    deterministic; a group with one document keeps it (rank 0).
    Returns ``(id, group, score, pct_rank)`` for kept documents.
    """
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError("quality_percentile_filter: keep_frac in (0, 1]")
    from pyspark.sql import Window

    scored = quality_score(df, id_col, text_col).select(
        F.col(id_col).alias("id"), F.col("quality_score").alias("score")
    )
    base = df.select(F.col(id_col).alias("id"), F.col(group_col).alias("group"))
    j = base.join(scored, "id")
    w = Window.partitionBy("group").orderBy(F.col("score").desc(), F.col("id"))
    return (
        j.withColumn("pct_rank", F.round(F.percent_rank().over(w), 6))
        .filter(F.col("pct_rank") <= keep_frac)
        .select("id", "group", "score", "pct_rank")
    )


def truncate_tokens(
    df: DataFrame, id_col: str, text_col: str, *, max_tokens: int = 512
) -> DataFrame:
    """Context-limit truncation: keep each document's first
    ``max_tokens`` whitespace tokens — map-only (slice + join per row,
    no shuffle), the standard pre-tokenizer length clamp.

    Returns ``(id, text, n_tokens, truncated)`` where ``n_tokens`` is
    the ORIGINAL count and ``truncated`` flags clamped rows.
    """
    if max_tokens < 1:
        raise ValueError("truncate_tokens: max_tokens must be >= 1")
    from .dedup import let_

    packed = let_(
        tokens_col(F.col(text_col)),
        lambda t: F.struct(
            F.size(t).cast("bigint").alias("n"),
            F.array_join(F.slice(t, 1, max_tokens), " ").alias("txt"),
        ),
    )
    return df.select(
        F.col(id_col).alias("id"), packed.alias("__p")
    ).select(
        "id",
        F.col("__p.txt").alias("text"),
        F.col("__p.n").alias("n_tokens"),
        (F.col("__p.n") > max_tokens).alias("truncated"),
    )


def classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, float],
    *,
    bias: float = 0.0,
    average: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Linear text-classifier inference (the fastText / DCLM quality-
    classifier shape): ``score = sigmoid(bias + mean_t w[token_t])`` over
    lowercase whitespace tokens, unknown tokens contributing 0.

    The model is a token->weight table.  Small models (the common case —
    a quality classifier is a few 10k weights) compile to a broadcast map
    literal probed per token with ``element_at``: map-only inference, no
    shuffle, no Python in the loop, so scoring 100 TB is exactly one scan.
    Bigger vocabularies would flip to explode + broadcast-join against a
    weights DataFrame; this entry point covers the literal-map path and
    guards the size.

    Returns ``(id, score)`` with ``score`` rounded to ``round_to``.
    """
    if len(weights) > 100_000:
        raise ValueError(
            f"classifier_score: {len(weights)} weights is too large for a "
            "plan literal; join an exploded token frame against a weights "
            "DataFrame instead"
        )
    toks = tokens_col(F.col(text_col))
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in (kv[0], float(kv[1]))]
    )
    contrib = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.coalesce(wmap[F.lower(t)], F.lit(0.0)),
    )
    z = F.lit(float(bias)) + (
        F.when(F.size(toks) > 0, contrib / F.size(toks)).otherwise(F.lit(0.0))
        if average
        else contrib
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.select(F.col(id_col).alias("id"), F.round(score, round_to).alias("score"))


def densify_counts(
    feats: DataFrame,
    id_col: str,
    bucket_col: str,
    n_col: str,
    *,
    n_buckets: int,
    normalize: bool = True,
) -> DataFrame:
    """Turn long-form hashed features (``feature_hash`` output) into
    dense per-document vectors: one groupBy(id) building a bucket->count
    map, then a fixed ``n_buckets``-wide probe — the ONE shuffle that
    amortizes across every subsequent training pass (margins and
    gradients over dense arrays are map-only).

    ``normalize=True`` divides by the document's total count (bounded
    [0, 1] features keep logistic margins from saturating).  Returns
    ``(id, x array<double>)``.
    """
    if n_buckets < 1 or n_buckets > 65536:
        raise ValueError("n_buckets must be in [1, 65536]")
    agg = feats.groupBy(F.col(id_col).alias("id")).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col(bucket_col), F.col(n_col).cast("double")))
        ).alias("__m"),
        F.sum(F.col(n_col).cast("double")).alias("__t"),
    )
    probe = F.transform(
        F.sequence(F.lit(0), F.lit(int(n_buckets) - 1)),
        lambda i: F.coalesce(F.element_at("__m", i.cast("long")), F.lit(0.0)),
    )
    if normalize:
        probe = F.transform(
            probe,
            lambda v: F.when(F.col("__t") > 0, v / F.col("__t")).otherwise(F.lit(0.0)),
        )
    return agg.select("id", probe.alias("x"))


def logreg_train(
    df: DataFrame,
    id_col: str,
    feat_col: str,
    label_col: str,
    *,
    lr: float = 0.1,
    n_steps: int = 2,
    round_to: int = 9,
) -> tuple[list[float], float]:
    """Full-batch gradient-descent training of a logistic-regression
    classifier over dense feature vectors — the quality-classifier
    training loop (fastText-linear shape) run natively on Spark.

    Scale shape: each step is ONE corpus pass.  Margins are a literal-
    weight dot product (map-only, whole-stage codegen); the gradient is
    a posexplode -> groupBy(dim) partial-sum whose shuffle carries ``D``
    rows regardless of corpus size; the ``D + 1`` sums collect to the
    driver for the update — the same driver-coordinated iteration as
    ``kmeans_fit`` (and MLlib's own LBFGS/SGD).  Weights and margins are
    rounded to ``round_to`` each step so a SQL replay of the unrolled
    loop reproduces the trajectory exactly.

    Returns ``(weights, bias)`` after ``n_steps`` updates from zero
    init.
    """
    if n_steps < 0:
        raise ValueError("n_steps must be >= 0")
    from pyspark import StorageLevel

    src = df.select(
        F.col(feat_col).cast("array<double>").alias("__x"),
        F.col(label_col).cast("double").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    # The upstream feature pipeline (tokenize -> hash -> densify) feeds
    # every GD step plus the dim probe and the count; persist so it runs
    # ONCE, not n_steps + 2 times — the iterative-ML scale essential
    # (recoverable storage, lineage survives executor loss).
    src = src.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _logreg_train_loop(src, lr=lr, n_steps=n_steps, round_to=round_to)
    finally:
        src.unpersist()


def _logreg_train_loop(
    src: DataFrame, *, lr: float, n_steps: int, round_to: int
) -> tuple[list[float], float]:
    # one probe job for (n, D) instead of first() + count() — each extra
    # job is a full pass at 100 TB scale (here it also fills the persist)
    probe = src.select(
        F.count(F.lit(1)).alias("n"), F.first(F.size("__x")).alias("d")
    ).first()
    if probe is None or probe["n"] == 0:
        raise ValueError("logreg_train: empty input")
    dim = int(probe["d"])
    n = int(probe["n"])
    w = [0.0] * dim
    b = 0.0
    for _ in range(int(n_steps)):
        w_arr = F.array(*[F.lit(x) for x in w])
        z = F.round(
            F.lit(b)
            + F.aggregate(
                F.zip_with("__x", w_arr, lambda xv, wv: xv * wv),
                F.lit(0.0),
                lambda acc, e: acc + e,
            ),
            round_to,
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        resid = src.select((p - F.col("__y")).alias("__r"), "__x")
        # one job per step, NO explode and NO keyed exchange: the D + 1
        # gradient components (bias = plain residual sum) are D + 1
        # column aggregates in one keyless HashAggregate — partial sums
        # combine map-side and a single row reaches the driver, vs the
        # old posexplode (a D+1 x row multiplication) -> groupBy(dim)
        # shuffle (guide §2.3: aggregate before you shuffle)
        grad_row = resid.agg(
            *[
                F.sum(F.col("__r") * F.col("__x")[j]).alias(f"g{j}")
                for j in range(dim)
            ],
            F.sum("__r").alias("gb"),
        ).first()
        gmap = {
            j: float(grad_row[j])
            for j in range(dim)
            if grad_row[j] is not None
        }
        rsum = float(grad_row[dim]) if grad_row[dim] is not None else 0.0

        def rnd(x: float) -> float:
            # half-away-from-zero, matching SQL round() (Python's built-in
            # round is banker's)
            import math

            return math.copysign(
                math.floor(abs(x) * 10**round_to + 0.5) / 10**round_to, x
            )

        w = [rnd(w[j] - lr * gmap.get(j, 0.0) / n) for j in range(dim)]
        b = rnd(b - lr * float(rsum) / n)
    return w, b


def logreg_score(
    df: DataFrame,
    id_col: str,
    feat_col: str,
    weights: list[float],
    bias: float = 0.0,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Score dense feature vectors with a trained logistic model:
    ``sigmoid(bias + w . x)`` as a literal-weight fold — map-only, no
    shuffle, one scan at any corpus size.  Returns ``(id, score)``."""
    w_arr = F.array(*[F.lit(float(x)) for x in weights])
    z = F.lit(float(bias)) + F.aggregate(
        F.zip_with(F.col(feat_col).cast("array<double>"), w_arr, lambda xv, wv: xv * wv),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.select(
        F.col(id_col).alias("id"), F.round(score, round_to).alias("score")
    )


def _apply_bpe_merge(ts: Column, a: Column, b: Column) -> Column:
    """One BPE merge applied exhaustively left-to-right: a fold carrying
    the output array, combining the last element with the current one
    whenever they equal (a, b)."""
    return F.aggregate(
        ts,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a)
            & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(a, b)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: "list[tuple[str, str]]",
) -> DataFrame:
    """Full BPE tokenization: apply a learned, rank-ordered merge table
    (Sennrich et al. 2016) to every document, character-level start.

    The merge loop is a pure Catalyst nested fold — outer ``aggregate``
    over the (literal) merge table in rank order, inner ``aggregate``
    over the word's token array applying one merge exhaustively
    left-to-right — so the hot path is JVM-side codegen, no Python.
    Applying merges in rank order is exact BPE: a merged symbol only
    exists after its own merge, so later adjacencies can only enable
    later-ranked merges.

    Scale shape (the trick every fast tokenizer uses, as a dataflow):
    encode each DISTINCT word once, then join the per-word encodings
    back onto the corpus' (doc, position, word) spine.  The distinct-word
    table is Zipf-small relative to the corpus, so AQE turns the
    join broadcast at runtime; the per-document reassembly is one
    groupBy(id) with an order-preserving sorted-struct flatten.

    Documents with zero tokens are dropped (consistent with the other
    tokenizer-derived operators).  Returns ``(id, bpe_tokens, n_bpe)``.

    Complements ``bpe_merge_candidates`` (the training step) — together
    they are the tokenizer train/apply pair of a data pipeline.
    """
    if len(merges) > 2000:
        raise ValueError(
            f"bpe_encode: {len(merges)} merges is too large for a plan "
            "literal; store the merge table in a DataFrame and encode "
            "via an Arrow-batched pandas UDF over distinct words instead"
        )
    if merges:
        mlit = F.array(
            *[
                F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
                for a, b in merges
            ]
        )
        encode_word = lambda w: F.aggregate(  # noqa: E731
            mlit, F.split(w, ""), lambda acc, m: _apply_bpe_merge(acc, m["a"], m["b"])
        )
    else:
        # empty merge table: characters pass through (a zero-element
        # struct array is VOID-typed — the fold cannot run over it)
        encode_word = lambda w: F.split(w, "")  # noqa: E731

    spine = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "w"),
    )
    encoded = (
        spine.select("w")
        .distinct()
        .select("w", encode_word(F.col("w")).alias("__bpe"))
    )
    return (
        spine.join(encoded, "w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "__bpe"))),
                    lambda s: s["__bpe"],
                )
            ).alias("bpe_tokens")
        )
        .withColumn("n_bpe", F.size("bpe_tokens").cast("bigint"))
    )


def _bpe_train_local(
    word_counts: "list[tuple[str, int]]",
    num_merges: int,
    min_count: int,
) -> "list[tuple[str, str]]":
    """Sennrich merge loop over a collected (word, count) table, with
    incremental pair-count maintenance: each round only the words
    containing the chosen pair are re-segmented (subtract their old pair
    multiset, apply the merge left-to-right exhaustively, add the new
    one).  Semantics identical to the Catalyst fold in
    ``_apply_bpe_merge``; tie-break (count desc, a asc, b asc) identical
    to the Spark path's orderBy."""
    from collections import Counter

    vocab: list[list] = [[list(w), c] for w, c in word_counts]
    pair_counts: Counter = Counter()
    pair_words: dict = {}
    for idx, (syms, c) in enumerate(vocab):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_words.setdefault(p, set()).add(idx)

    def apply_merge(syms: list, a: str, b: str) -> list:
        out: list = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        (a, b), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((a, b))
        for idx in list(pair_words.get((a, b), ())):
            syms, c = vocab[idx]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(idx)
                    if not ws:
                        del pair_words[p]
            syms = apply_merge(syms, a, b)
            vocab[idx][0] = syms
            for p in zip(syms, syms[1:]):
                pair_counts[p] += c
                pair_words.setdefault(p, set()).add(idx)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str,
    *,
    num_merges: int = 16,
    min_count: int = 2,
    collect_cap: int = 2_000_000,
) -> "list[tuple[str, str]]":
    """Full BPE tokenizer training (Sennrich et al. 2016): iteratively
    pick the most frequent adjacent symbol pair and add it to the merge
    table, ``num_merges`` times.  Ties break on pair text ascending so
    training is deterministic across engines and runs.

    Scale shape: training never touches the corpus again after ONE pass
    that builds the (word, count) table — the classic trick, since pair
    statistics only depend on distinct words weighted by frequency, and
    the distinct-word table is Zipf-small.  When that table fits under
    ``collect_cap`` distinct words (it virtually always does — Zipf),
    it is collected ONCE and the whole merge loop runs driver-side with
    incremental pair counts: one Spark job total, seconds for a
    32k-vocab run, identical results (the round-2 VERDICT's bpe_train
    fix).  Above the cap, the fallback re-encodes the distinct-word
    table per round with the merges learned so far (the same Catalyst
    nested fold as ``bpe_encode``) and collects one row per round —
    corpus-scale-safe, but one driver-paced job per merge.

    Stops early when the best pair's count falls below ``min_count``.
    Returns the merge list, ready for ``bpe_encode``.
    """
    words = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.length("w") >= 2)
        .persist()
    )
    n_words = words.count()
    if n_words <= collect_cap:
        try:
            rows = words.collect()
        finally:
            words.unpersist()
        return _bpe_train_local(
            [(r["w"], r["wc"]) for r in rows], num_merges, min_count
        )
    try:
        merges: list[tuple[str, str]] = []
        for _ in range(num_merges):
            if merges:
                mlit = F.array(
                    *[
                        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
                        for a, b in merges
                    ]
                )
                toks = F.aggregate(
                    mlit,
                    F.split(F.col("w"), ""),
                    lambda acc, m: _apply_bpe_merge(acc, m["a"], m["b"]),
                )
            else:
                toks = F.split(F.col("w"), "")
            pairs = words.select(
                F.col("wc"),
                F.explode(
                    let_(
                        toks,
                        lambda ts: F.zip_with(
                            ts,
                            F.slice(
                                ts, 2, F.greatest(F.size(ts) - 1, F.lit(0))
                            ),
                            lambda x, y: F.struct(
                                x.alias("a"), y.alias("b")
                            ),
                        ),
                    )
                ).alias("p"),
            ).filter(F.col("p.b").isNotNull())
            best = (
                pairs.groupBy("p")
                .agg(F.sum("wc").alias("cnt"))
                .orderBy(F.col("cnt").desc(), F.col("p.a"), F.col("p.b"))
                .limit(1)
                .collect()
            )
            if not best or best[0]["cnt"] < min_count:
                break
            merges.append((best[0]["p"]["a"], best[0]["p"]["b"]))
        return merges
    finally:
        words.unpersist()


def pmi_collocations(
    df: DataFrame,
    text_col: str,
    *,
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Collocation mining by pointwise mutual information: adjacent word
    pairs whose co-occurrence beats chance — ``pmi = ln(c12 * N / (c1 *
    c2))`` over corpus bigram/unigram counts (Church & Hanks 1990), the
    multi-word-expression signal of a vocabulary pipeline.

    ONE tokenize pass over the corpus (round 10; previously three):
    ``zip_with`` pads the shorter array with NULLs, so exploding the
    UNFILTERED token/next-token zip yields exactly one ``(w1, w2)`` row
    per token with ``w2`` NULL at each document's last position — the
    pair-count aggregation then carries everything at once: unigram
    counts are ``sum(c)`` per ``w1`` (every token is ``w1`` exactly
    once), bigram counts are the non-NULL-``w2`` rows, and the scalar
    bigram total is their sum.  The bigram-vocabulary-sized pair-count
    frame is persisted and eagerly materialized (one Spark job runs at
    operator-call time) so its three consumers never re-scan the raw
    text; the cache is registered for ``release_operator_caches()`` and
    recomputes from lineage if blocks are lost.  ``min_count``
    suppresses the unstable low-frequency tail; output is the ``top_n``
    by PMI with a deterministic (pmi desc, w1, w2) order.  Returns
    ``(w1, w2, c12, c1, c2, pmi)``.
    """
    toks = df.select(tokens_col(F.col(text_col)).alias("__t")).filter(
        F.size("__t") >= 1
    )
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.col("__t"),
                F.slice(F.col("__t"), 2, F.greatest(F.size("__t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    )
    from pyspark import StorageLevel

    from ..caches import track_cache

    # persist + count, not localCheckpoint (round 11, ADVICE r10): the
    # lineage survives, so an executor-decommission block loss RECOMPUTES
    # instead of failing the job, and release_operator_caches() can free
    # the blocks in a long-lived driver.  The eager count() keeps the
    # single-tokenize guarantee — the three consumers are independent
    # join sides that would otherwise race to fill the cache.  BOUND:
    # the pinned frame is vocabulary-squared-sized (distinct bigram
    # types), not corpus-sized; Zipf keeps that far below token count.
    pair_counts = track_cache(
        pairs.groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pair_counts.count()
    bg_counts = (
        pair_counts.filter(F.col("w2").isNotNull())
        .select("w1", "w2", F.col("c").alias("c12"))
        .filter(F.col("c12") >= min_count)
    )
    uni = pair_counts.groupBy(F.col("w1").alias("w")).agg(
        F.sum("c").alias("c")
    )
    n_bigrams = pair_counts.filter(F.col("w2").isNotNull()).agg(
        F.sum("c").alias("n")
    )
    scored = (
        bg_counts.join(
            uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1"
        )
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_bigrams))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.round(
                F.log(
                    F.col("c12").cast("double")
                    * F.col("n")
                    / (F.col("c1").cast("double") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(top_n)


RAKE_STOPWORDS: list[str] = sorted(
    {w for ws in _LANG_MARKERS.values() for w in ws}
    | {"a", "an", "on", "at", "by", "as", "or", "be", "are", "was", "from"}
)


def rake_keyphrases(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    stopwords: "list[str] | None" = None,
    top_n: int = 50,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal runs of non-stopword tokens; each word scores
    degree/frequency over the phrases it appears in (degree counts
    phrase length, so words that travel in long phrases score high), and
    a phrase scores the sum of its member word scores.

    Distributed shape: one per-document window splits tokens into
    phrase islands at stopword boundaries, then two word-keyed
    aggregations (freq/degree) and one phrase-keyed join — every shuffle
    key is a word or a phrase string, never a document.  Output is the
    corpus-level ``top_n`` phrases by score with a deterministic
    (score desc, phrase) order.  Returns ``(phrase, n_words, freq,
    score)`` where ``freq`` counts the phrase's occurrences.
    """
    from pyspark.sql import Window

    stops = RAKE_STOPWORDS if stopwords is None else stopwords
    spine = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "w"),
    ).withColumn("__stop", F.col("w").isin(stops))
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        spine.withColumn(
            "__isl", F.sum(F.col("__stop").cast("int")).over(w_doc)
        )
        .filter(~F.col("__stop"))
    )
    phrases = islands.groupBy(id_col, "__isl").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("n_words"),
    )
    members = phrases.select(
        "phrase", "n_words", F.explode(F.split("phrase", " ")).alias("w")
    )
    word_scores = members.groupBy("w").agg(
        (
            F.sum("n_words").cast("double") / F.count(F.lit(1))
        ).alias("__wscore")
    )
    phrase_scores = (
        members.join(word_scores, "w")
        .groupBy("phrase")
        .agg(F.sum("__wscore").alias("__total"), F.count(F.lit(1)).alias("__nm"))
    )
    out = (
        phrases.groupBy("phrase", "n_words")
        .agg(F.count(F.lit(1)).alias("freq"))
        .join(phrase_scores.select("phrase", "__total"), "phrase")
        .select(
            "phrase",
            "n_words",
            "freq",
            (F.round(F.col("__total") / F.col("freq"), 6)).alias("score"),
        )
    )
    return out.orderBy(F.col("score").desc(), "phrase").limit(top_n)


def keyness_g2(
    df: DataFrame,
    text_col: str,
    group_col: "Column | str",
    *,
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Corpus-comparison keyness by Dunning's log-likelihood ratio
    (Dunning 1993): which words are over-represented in the target
    subcorpus (``group_col`` true) versus the rest — the standard
    "what makes this source/language/split distinctive" statistic,
    more reliable than PMI or chi-square at low counts.

    ``G2 = 2 * (a*ln(a/E1) + b*ln(b/E2))`` with expected counts from the
    pooled distribution; zero cells contribute zero.  One word-keyed
    aggregation carrying the two per-group counts (a conditional sum —
    no second pass), plus a broadcast 1-row total.  The corpus is
    tokenized ONCE (round 10; previously twice): the totals are the
    column sums of the UNFILTERED vocabulary-sized count frame, which is
    persisted and eagerly materialized (one Spark job at operator-call
    time; released via ``release_operator_caches()``) so both consumers
    read it instead of re-scanning the raw text.
    Signed output: positive G2 means over-represented in the target.
    Returns ``(word, a, b, g2)`` top ``top_n`` by |G2| with
    deterministic ties.
    """
    flag = F.col(group_col) if isinstance(group_col, str) else group_col
    words = df.select(
        F.explode(tokens_col(F.col(text_col))).alias("w"),
        flag.cast("boolean").alias("__t"),
    )
    from pyspark import StorageLevel

    from ..caches import track_cache

    # persist + count, not localCheckpoint — same recoverable/releasable
    # rationale as pmi_collocations above; the pinned frame is
    # vocabulary-sized (one row per distinct word)
    counts0 = track_cache(
        words.groupBy("w")
        .agg(
            F.sum(F.col("__t").cast("long")).alias("a"),
            F.sum((~F.col("__t")).cast("long")).alias("b"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts0.count()
    counts = counts0.filter(F.col("a") + F.col("b") >= min_count)
    totals = counts0.agg(
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    e1 = F.col("na") * (F.col("a") + F.col("b")) / (F.col("na") + F.col("nb"))
    e2 = F.col("nb") * (F.col("a") + F.col("b")) / (F.col("na") + F.col("nb"))
    term = lambda c, e: F.when(  # noqa: E731
        c > 0, c.cast("double") * F.log(c.cast("double") / e)
    ).otherwise(F.lit(0.0))
    g2 = 2.0 * (term(F.col("a"), e1) + term(F.col("b"), e2))
    signed = F.when(
        F.col("a").cast("double") / F.col("na")
        >= F.col("b").cast("double") / F.col("nb"),
        g2,
    ).otherwise(-g2)
    out = j.select(
        F.col("w").alias("word"), "a", "b", F.round(signed, 4).alias("g2")
    )
    return out.orderBy(F.abs(F.col("g2")).desc(), "word").limit(top_n)


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    mask_bits: int = 4,
) -> DataFrame:
    """Content-defined chunking: split each document at token positions
    whose local ``n``-gram hash has its low ``mask_bits`` bits zero —
    boundaries depend only on nearby content, so an insertion re-chunks
    a neighborhood instead of shifting every downstream chunk (the
    rsync/LBFS/FastCDC property, applied to text for chunk-level dedup).
    Expected chunk length is ~2^mask_bits tokens.

    One token spine, one per-document window for the running boundary
    count, one (doc, chunk) rollup — a single document-keyed shuffle.
    Chunk digests use md5 over the space-joined tokens, ready for
    exact-dedup joins.  Returns ``(id, chunk_idx, start_tok, end_tok,
    n_tokens, digest)``.
    """
    from pyspark.sql import Window

    from .dedup import minhash_base_col

    toks = df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
    ).filter(F.size("__toks") > 0)

    gram = F.col("__toks")
    for k in range(1, n):
        shifted = F.slice(
            F.col("__toks"), k + 1, F.greatest(F.size("__toks") - k, F.lit(0))
        )
        gram = F.zip_with(gram, shifted, lambda g, t: F.concat(g, F.lit(" "), t))
    mask = (1 << mask_bits) - 1
    entries = toks.select(
        F.col(id_col),
        F.posexplode(
            F.zip_with(
                F.col("__toks"),
                gram,
                lambda w, g: F.struct(
                    w.alias("w"),
                    F.when(
                        g.isNotNull(),
                        minhash_base_col(g).bitwiseAND(F.lit(mask)) == 0,
                    )
                    .otherwise(F.lit(False))
                    .alias("bnd"),
                ),
            )
        ).alias("pos", "e"),
    )
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    chunked = entries.withColumn(
        "chunk_idx",
        F.coalesce(
            F.sum(F.col("e.bnd").cast("long")).over(
                w_doc.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    return (
        chunked.groupBy(id_col, "chunk_idx")
        .agg(
            F.min("pos").alias("start_tok"),
            F.max("pos").alias("end_tok"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", F.col("e.w").alias("w")))),
                        lambda s: s["w"],
                    ),
                    " ",
                )
            ).alias("digest"),
        )
    )


def stylometric_deviation(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    *,
    top_k: int = 10,
) -> DataFrame:
    """Burrows' Delta, turned inward: how far each document's
    function-word profile sits from its OWN group's centroid — the
    stylometric outlier signal (injected spam, machine-generated
    passages, wrong-source attribution) used in authorship forensics
    (Burrows 2002).

    The ``top_k`` most frequent corpus words (the classic function-word
    proxy) are collected once (tiny, tie-broken deterministically) and
    compiled as literals; per-document relative frequencies are then
    ``top_k`` map-only array-count expressions — the document text never
    shuffles.  Corpus means/stds ride a broadcast 1-row aggregate,
    z-scores are a projection, group centroids one groupBy, and delta =
    mean |z - centroid| after a group-keyed join.  Returns
    ``(id, group, delta)`` — sort descending to review outliers.
    """
    toks = tokens_col(F.col(text_col))
    top = [
        r["w"]
        for r in (
            df.select(F.explode(toks).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), "w")
            .limit(top_k)
            .collect()
        )
    ]
    n_tok = F.size(toks)

    def count_of(word: str):
        # a closure, not a default-arg lambda — pyspark treats a
        # two-parameter lambda as an (element, index) HOF
        return F.size(F.filter(toks, lambda t: t == F.lit(word)))

    freq_cols = [
        (count_of(wd).cast("double") / n_tok).alias(f"__f{i}")
        for i, wd in enumerate(top)
    ]
    base = df.filter(F.size(toks) > 0).select(
        F.col(id_col).alias("id"), F.col(group_col).alias("group"), *freq_cols
    )
    stats = base.agg(
        *[F.avg(f"__f{i}").alias(f"__m{i}") for i in range(len(top))],
        *[F.stddev_samp(f"__f{i}").alias(f"__s{i}") for i in range(len(top))],
    )
    z = base.crossJoin(F.broadcast(stats)).select(
        "id",
        "group",
        *[
            F.when(
                F.col(f"__s{i}") > 0,
                (F.col(f"__f{i}") - F.col(f"__m{i}")) / F.col(f"__s{i}"),
            )
            .otherwise(F.lit(0.0))
            .alias(f"__z{i}")
            for i in range(len(top))
        ],
    )
    centroids = z.groupBy("group").agg(
        *[F.avg(f"__z{i}").alias(f"__c{i}") for i in range(len(top))]
    )
    delta = sum(
        F.abs(F.col(f"__z{i}") - F.col(f"__c{i}")) for i in range(len(top))
    ) / F.lit(float(len(top)))
    return (
        z.join(centroids, "group")
        .select("id", "group", F.round(delta, 6).alias("delta"))
    )


def dsir_logratio(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame,
    *,
    target_text_col: str | None = None,
    n: int = 2,
    n_buckets: int = 1024,
    k: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every corpus
    document by the SUM of log-likelihood ratios of its hashed word
    ``n``-grams under a bag-of-hashed-ngrams model of the TARGET sample
    vs one of the raw corpus — i.e. the document's log importance
    weight under the independent-gram model — the standard cheap way to select
    pretraining data that "looks like" a high-quality target domain.
    Rank/threshold on ``log_ratio`` (or exp() it for sampling weights).

    Hashing uses the md5-prefix bucket (engine-independent, same trick
    as ``feature_hash``); both models are add-``k``-smoothed bucket
    multinomials over DISTINCT per-doc grams (``grams_of`` semantics).
    Per-bucket log ratios enter the plan as exact integers in
    ``10^-round_to`` units, so the per-doc sum (and thus the score) is
    bit-identical in any engine at any data order — no floating-point
    summation drift, no final rounding boundary.

    Scale shape: two bucket-count aggregations whose outputs are
    ``<= n_buckets`` rows (map-side partials; the target side is usually
    dimension-sized anyway), a ``n_buckets``-row ratio table that
    BROADCASTS by construction, and ONE corpus pass: explode grams →
    broadcast-join the ratio → per-doc mean.  No driver collect, no
    corpus-keyed shuffle beyond the per-doc groupBy.

    Returns ``(id, n_grams, log_weight)``; divide by ``n_grams`` for a
    length-normalized score.  Documents with zero grams are dropped (no
    model support either way).
    """
    from .dedup import grams_of, tokens_col

    tcol = target_text_col or text_col
    B = int(n_buckets)

    def bucket(gram: Column) -> Column:
        return (
            F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long") % B
        )

    def bucket_counts(df: DataFrame, col: str) -> DataFrame:
        return (
            df.select(F.explode(grams_of(tokens_col(F.col(col)), n)).alias("__g"))
            .select(bucket(F.col("__g")).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    import math

    # ONE corpus tokenize+hash pass: the bucketed grams feed BOTH the
    # source bucket counts and the scoring join, so persist them
    # (recoverable storage, the semdedup/ivf pattern) instead of
    # re-shingling the corpus for each — the tokenize+md5 explode is the
    # dominant cost at scale and this halves it (600k-doc stress:
    # 10.2 s -> 7.0 s).
    from pyspark import StorageLevel

    doc_buckets = (
        corpus.select(
            F.col(id_col).alias("id"),
            F.explode(grams_of(tokens_col(F.col(text_col)), n)).alias("__g"),
        )
        .select("id", bucket(F.col("__g")).alias("bucket"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # both count tables are <= n_buckets rows BY CONSTRUCTION — collect
    # them (KB-sized driver probe, the kmeans/logreg pattern) and build
    # the smoothed ratio table driver-side; it re-enters the plan as a
    # broadcast-joined local relation, so the scoring pass is ONE corpus
    # scan with no extra shuffles
    src = {
        int(r["bucket"]): int(r["cnt"])
        for r in doc_buckets.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    tgt = {int(r["bucket"]): int(r["cnt"]) for r in bucket_counts(target, tcol).collect()}
    ts = float(sum(src.values()))
    tt = float(sum(tgt.values()))

    scale = 10**round_to

    def to_units(x: float) -> int:
        # half-away-from-zero to round_to digits, then EXACT integer
        # units: per-doc means sum integers, so the aggregation is
        # order-independent and bit-identical in any engine (a mean of
        # rounded DOUBLES drifts by 1 ulp with summation order — caught
        # by the cross-sf oracle sweep)
        r = math.copysign(math.floor(abs(x) * scale + 0.5) / scale, x)
        return int(math.floor(r * scale + 0.5))

    rows = [
        (
            b,
            to_units(
                math.log((tgt.get(b, 0) + k) / (tt + k * B))
                - math.log((cs + k) / (ts + k * B))
            ),
        )
        for b, cs in src.items()
    ]
    ratio = corpus.sparkSession.createDataFrame(
        rows, "bucket long, __lr_u long"
    )
    scored = (
        doc_buckets.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            # exact integer sum / 10^round_to: deterministic in every
            # engine with NO final rounding step (a mean's division can
            # land exactly on a decimal half, where engines' double
            # rounding disagrees — caught by the sf0.1 oracle sweep).
            # The SUM is also the faithful DSIR log importance weight
            # (product of per-gram ratios); divide by n_grams downstream
            # for a length-normalized score.
            (F.sum("__lr_u") / F.lit(float(scale))).alias("log_weight"),
        )
    )
    # Materialize the (one-row-per-doc) scores so the gram-level cache
    # can be released NOW instead of lingering until LRU eviction —
    # repeated calls in a long-lived session would otherwise accumulate
    # corpus-sized gram caches.  The returned frame stays persisted
    # (doc-count rows; lineage can rebuild it if evicted).
    scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
    scored.count()
    doc_buckets.unpersist()
    return scored


def compression_ratio(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    level: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the cheap redundancy signal
    curation pipelines use alongside entropy: boilerplate and template
    spam compress far below natural prose (ratio = compressed bytes /
    raw UTF-8 bytes; typical English sits ~0.3-0.6, a repeated line
    collapses toward 0).  Filter tails on BOTH ends: very low = spammy
    repetition, near/above 1.0 = random or already-compressed bytes.

    zlib is stdlib-C and inherently per-row, so this is the Arrow path:
    one ``mapInPandas`` scan, no shuffle, and the batch loop zips numpy
    arrays (no per-row pandas overhead).  Returns
    ``(id, n_bytes, ratio)``; NULL text -> NULL ratio, empty -> 1.0.
    """
    from typing import Iterator

    import pandas as pd

    out_schema = f"{id_col} {df.schema[id_col].dataType.simpleString()}, n_bytes bigint, ratio double"

    def op(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import zlib

        for pdf in batches:
            ids, texts = pdf[id_col].to_numpy(), pdf[text_col].to_numpy()
            n_bytes: list = []
            ratios: list = []
            for t in texts:
                if t is None:
                    n_bytes.append(None)
                    ratios.append(None)
                    continue
                raw = (
                    bytes(t)
                    if isinstance(t, (bytes, bytearray, memoryview))
                    else t.encode("utf-8")
                )
                if not raw:
                    n_bytes.append(0)
                    ratios.append(1.0)
                    continue
                comp = zlib.compress(raw, level)
                n_bytes.append(len(raw))
                ratios.append(round(len(comp) / len(raw), round_to))
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": n_bytes, "ratio": ratios}
            )

    ship_package(df)
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(op, out_schema)


def vocab_drift(
    df: DataFrame,
    text_col: str,
    group_col: str,
    *,
    n_buckets: int = 1024,
    k: float = 1.0,
    round_to: int = 6,
    max_groups: int = 1000,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-group hashed
    unigram distributions — the corpus drift monitor: did this week's
    crawl, this source, or this pipeline revision shift the vocabulary?
    JS is symmetric and bounded by ln 2, so thresholds transfer across
    corpora (0 = identical distributions, ~0.69 = disjoint).

    Scale shape follows DSIR (``dsir_logratio``): ONE distributed
    tokenize+hash pass and a count keyed on (group, bucket) whose
    output is at most ``groups x n_buckets`` rows — a dimension-sized
    table collected to the driver (the kmeans/logreg KB-probe pattern),
    where the add-``k``-smoothed pairwise JS is computed in exact
    ``10^-round_to`` integer units per bucket term (engine- and
    order-independent sums, same trick as DSIR's ratio table).

    Returns one row per unordered group pair, lexically ordered:
    ``(group_a, group_b, n_tokens_a, n_tokens_b, js_divergence)``
    (nats).  NULL groups are dropped; groups with zero tokens don't
    appear.
    """
    counts = vocab_bucket_counts(df, text_col, group_col, n_buckets=n_buckets)
    # the guard must bound the DRIVER, so it has to bind before the big
    # collect: fetch at most the contract-size row count + 1 (each group
    # contributes <= n_buckets rows, so more rows than that PROVES more
    # than max_groups groups) — an entity column mistakenly used as the
    # group can no longer OOM the driver on the way to the error message
    cap = max_groups * int(n_buckets)
    rows = counts.limit(cap + 1).collect()
    by_group: dict[str, dict[int, int]] = {}
    for r in rows:
        by_group.setdefault(r["group"], {})[int(r["bucket"])] = int(r["cnt"])
    if len(rows) > cap or len(by_group) > max_groups:
        raise ValueError(
            f"vocab_drift: more than max_groups={max_groups} distinct "
            "groups — the driver-side pairwise JS loop is "
            "O(groups^2 x n_buckets); groups are sources/snapshots, "
            "not entities. Pre-bucket the group column or raise "
            "max_groups deliberately."
        )
    return js_from_counts(
        df.sparkSession, by_group, n_buckets=n_buckets, k=k, round_to=round_to
    )


def vocab_bucket_counts(
    df: DataFrame,
    text_col: str,
    group_col: str,
    *,
    n_buckets: int = 1024,
) -> DataFrame:
    """One tokenize+hash pass to (group, bucket, cnt) — the unigram
    distribution summary :func:`vocab_drift` scores.  Counts are
    ADDITIVE across row slices, so the streaming twin appends these per
    micro-batch and sum-merges at read for an EXACTLY batch-equal
    distribution (split out for streaming/incremental_drift.py)."""
    from .dedup import tokens_col

    B = int(n_buckets)
    return (
        df.filter(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).cast("string").alias("group"),
            F.explode(tokens_col(F.col(text_col))).alias("__t"),
        )
        .select(
            "group",
            (
                F.conv(F.substring(F.md5("__t"), 1, 8), 16, 10).cast("long")
                % B
            ).alias("bucket"),
        )
        .groupBy("group", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def js_from_counts(
    spark,
    by_group: dict[str, dict[int, int]],
    *,
    n_buckets: int,
    k: float,
    round_to: int,
) -> DataFrame:
    """Exact-integer-micro-unit pairwise JS over collected (group,
    bucket) counts — shared verbatim by the batch and streaming paths so
    the differential contract is equality, not closeness."""
    import math

    B = int(n_buckets)
    totals = {g: sum(c.values()) for g, c in by_group.items()}

    scale = 10**round_to

    def to_units(x: float) -> int:
        r = math.copysign(math.floor(abs(x) * scale + 0.5) / scale, x)
        return int(math.floor(r * scale + 0.5))

    groups = sorted(by_group)
    out = []
    for i, ga in enumerate(groups):
        for gb in groups[i + 1 :]:
            ca, cb = by_group[ga], by_group[gb]
            ta, tb = totals[ga], totals[gb]
            u = 0
            for b in range(B):
                p = (ca.get(b, 0) + k) / (ta + k * B)
                q = (cb.get(b, 0) + k) / (tb + k * B)
                m = (p + q) / 2
                u += to_units(0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m))
            out.append((ga, gb, ta, tb, u / float(scale)))
    return spark.createDataFrame(
        out,
        "group_a string, group_b string, n_tokens_a bigint, "
        "n_tokens_b bigint, js_divergence double",
    )
