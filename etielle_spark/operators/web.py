"""Web-corpus curation operators: HTML-to-text extraction, character-set
profiling, URL parsing, and per-domain frequency caps.

These are the first stages of a Common-Crawl-style pretraining pipeline
(reference scope: the engine's per-document transform pass — see
SURVEY.md §2.3/§6; the reference has no web layer, this is the
Spark-native extension the task brief asks for).  Everything here is a
pure column-expression pass (regexp_replace / regexp_extract chains,
whole-stage codegen) except ``cap_per_domain``, which needs exactly one
shuffle on the domain key.

Cross-engine notes (queries are oracle-checked against DuckDB): all
regexes stay inside the RE2 ∩ java.util.regex dialect — character
classes with ``\\x{...}`` ranges, ``(?s)`` dotall, non-greedy ``.*?``;
no backreferences, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Tag-stripping patterns, applied in order.  script/style bodies drop
# entirely (their text is code, not content); remaining tags become a
# space so adjacent words don't fuse ("</p><p>" -> " ").
_BLOCK_PAT = r"(?s)<(script|style)[^>]*>.*?</(script|style)>"
_TAG_PAT = r"<[^>]*>"

# Minimal named-entity map (the ones that matter for text statistics);
# numeric entities are handled separately.
_ENTITIES = [
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
]


def html_text_col(html: Column) -> Column:
    """Visible-text extraction as one codegen'd expression chain."""
    t = F.regexp_replace(html, _BLOCK_PAT, " ")
    t = F.regexp_replace(t, _TAG_PAT, " ")
    for ent, rep in _ENTITIES:
        t = F.regexp_replace(t, ent, rep)
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def html_to_text(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """(id, text): strip script/style blocks and tags, decode the common
    entities, collapse whitespace.  One scan pass, no shuffle; at 100 TB
    this pipelines into the same stage as tokenization/quality scoring."""
    return df.select(F.col(id_col), html_text_col(F.col(html_col)).alias("text"))


# Character classes for script profiling.  Explicit code-point ranges —
# identical semantics in java.util.regex and RE2 (DuckDB), unlike the
# \p{Script} syntaxes which differ between the two engines.
SCRIPT_CLASSES: list[tuple[str, str]] = [
    ("latin", r"A-Za-z"),
    ("digit", r"0-9"),
    ("cyrillic", r"\x{0400}-\x{04FF}"),
    ("cjk", r"\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}"),
    ("arabic", r"\x{0600}-\x{06FF}"),
    ("space", r"\s"),
]


def charset_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document character-class fractions: what share of the
    characters are Latin letters, digits, Cyrillic, CJK, Arabic,
    whitespace, or other.  The classic script/garbage gate before
    language-specific processing (mojibake and binary-in-text documents
    show up as high ``other_frac``).

    Each class count is ``regexp_count(text, '[class]')`` — a per-row
    expression, no shuffle, runs in the scan stage (regexp_count walks
    the string without building the stripped copy regexp_replace
    would, ~4x faster on the 600k-doc stress: 14 s -> ~3.5 s).

    Returns ``(id, n_chars, <class>_frac ..., other_frac)``.
    """
    t = F.col(text_col)
    n = F.length(t)
    cols: list[Column] = [F.col(id_col), n.cast("bigint").alias("n_chars")]
    counted = F.lit(0)
    for name, cls in SCRIPT_CLASSES:
        c = F.regexp_count(t, F.lit(f"[{cls}]"))
        counted = counted + c
        cols.append(
            F.round(F.when(n > 0, c.cast("double") / n).otherwise(F.lit(0.0)), 6)
            .alias(f"{name}_frac")
        )
    cols.append(
        F.round(
            F.when(n > 0, (n - counted).cast("double") / n).otherwise(F.lit(0.0)), 6
        ).alias("other_frac")
    )
    return df.select(*cols)


_HOST_PAT = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
_SCHEME_PAT = r"^([a-z][a-z0-9+.-]*)://"
_PATH_PAT = r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
_REG_DOMAIN_PAT = r"([^.]+\.[^.]+)$"


def url_parts(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """(id, scheme, host, registered_domain, path): URL decomposition as
    regexp_extract expressions (both engines' regexp_extract take a
    group index, so the oracle reproduces this verbatim).  The
    registered domain is the last two host labels — the grouping key for
    per-site statistics and caps."""
    u = F.col(url_col)
    host = F.regexp_extract(u, _HOST_PAT, 1)
    return df.select(
        F.col(id_col),
        F.regexp_extract(u, _SCHEME_PAT, 1).alias("scheme"),
        host.alias("host"),
        F.regexp_extract(host, _REG_DOMAIN_PAT, 1).alias("registered_domain"),
        F.regexp_extract(u, _PATH_PAT, 1).alias("path"),
    )


def cap_per_domain(
    df: DataFrame,
    id_col: str,
    url_col: str,
    *,
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain, chosen by a
    deterministic md5 order (reproducible across engines/runs — not
    arrival order, which is partitioning-dependent).

    One shuffle on the domain key; rank within domain via a window.  At
    100 TB the domain distribution is zipfian — AQE's skew handling
    splits the giant domains' partitions, and the window only needs each
    domain's rows together, which is exactly what the shuffle provides.
    Hot-domain rows beyond ``cap`` could also be pre-pruned with a
    count-min pass, but a single window over the domain shuffle is the
    plan Spark executes well.

    Returns the surviving rows of ``df`` plus ``registered_domain`` and
    ``domain_rank`` (1-based).
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    host = F.regexp_extract(F.col(url_col), _HOST_PAT, 1)
    dom = F.regexp_extract(host, _REG_DOMAIN_PAT, 1)
    w = Window.partitionBy("registered_domain").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("registered_domain", dom)
        .withColumn("domain_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("domain_rank") <= cap)
    )


def c4_page_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words_per_line: int = 3,
    min_lines: int = 1,
    require_terminal_punct: bool = True,
    bad_substrings: tuple[str, ...] = ("lorem ipsum", "{"),
) -> DataFrame:
    """C4-style line- and page-level cleaning (Raffel et al. 2020 §2.2):
    keep lines that end in terminal punctuation and have at least
    ``min_words_per_line`` words; drop the whole page if a bad substring
    appears (boilerplate/code markers) or fewer than ``min_lines`` lines
    survive.

    Map-only: one pass of array expressions per document (split ->
    filter -> rejoin), no shuffle, no Python — the shape that lets this
    run inside the same scan as tokenization and dedup hashing at 100 TB.

    Returns ``(id, clean_text, n_kept, n_dropped, kept)`` where ``kept``
    is the page-level verdict and ``clean_text`` is the surviving lines
    joined by newline (empty string when the page is dropped).
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")

    def line_ok(l: Column) -> Column:
        t = F.trim(l)
        ok = F.length(t) > 0
        ok = ok & (F.size(F.split(t, r"\s+")) >= min_words_per_line)
        if require_terminal_punct:
            ok = ok & t.rlike('[.!?"]$')
        return ok

    kept_lines = F.filter(lines, line_ok)
    n_kept = F.size(kept_lines)
    n_dropped = F.size(lines) - n_kept
    page_bad = F.lit(False)
    for s in bad_substrings:
        page_bad = page_bad | F.contains(F.lower(text), F.lit(s.lower()))
    kept = (~page_bad) & (n_kept >= min_lines)
    return df.select(
        F.col(id_col).alias("id"),
        F.when(kept, F.array_join(kept_lines, "\n")).otherwise(F.lit("")).alias(
            "clean_text"
        ),
        n_kept.cast("bigint").alias("n_kept"),
        n_dropped.cast("bigint").alias("n_dropped"),
        kept.alias("kept"),
    )


_TRACKING_RE = "^(utm_[^=]*|gclid|fbclid|msclkid|ref_src)="


def canonical_url_col(url: Column) -> Column:
    """Canonical form of a URL as a column expression: fragment dropped,
    scheme and host lowercased, tracking query parameters (utm_*, gclid,
    fbclid, msclkid, ref_src) removed with the remaining parameter ORDER
    preserved, trailing '?' elided."""
    no_frag = F.regexp_replace(url, "#.*$", "")
    scheme = F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    host = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    path = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        F.lower(scheme),
        F.lit("://"),
        F.lower(host),
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def canonical_url(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """URL canonicalization (the dedup-key step of a web-corpus pipeline:
    crawl variants of one page — tracking params, fragments, case-shifted
    hosts — must collapse to one canonical string BEFORE exact/near dedup,
    or every variant survives).  Map-only regexp/array expressions.

    Returns ``(id, url, canonical_url)``.
    """
    return df.select(
        F.col(id_col).alias("id"),
        F.col(url_col).alias("url"),
        canonical_url_col(F.col(url_col)).alias("canonical_url"),
    )


def blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocked_domains: list[str],
) -> DataFrame:
    """Drop rows whose registered domain (last two host labels) is on the
    blocklist — the URL-filtering stage every crawl pipeline runs (spam /
    adult / boilerplate domain lists).

    The blocklist is a plan literal probed per row (map-only — a list of
    even millions of domains would instead broadcast-anti-join; this
    entry point covers the literal path and guards the size).
    """
    if len(blocked_domains) > 100_000:
        raise ValueError(
            "blocklist too large for a plan literal; broadcast-anti-join a "
            "blocklist DataFrame instead"
        )
    host = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1
    )
    domain = F.regexp_extract(F.lower(host), r"([^.]+\.[^.]+)$", 1)
    return df.filter(~domain.isin([d.lower() for d in blocked_domains]))
