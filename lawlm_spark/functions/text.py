"""Scalar text operators as JVM-side column expressions.

Re-expresses the reference's imperative text processing
(reference: data-ingestion/opinion_utills.py:64-179) as Catalyst
expressions — no Python UDFs in the hot path, so every operator here
stays inside whole-stage codegen and scales linearly with executors.

Operators (SURVEY.md §2.2):
  O11 clean_text          — HTML strip + whitespace normalize
                            (opinion_utills.py:132-146)
  O12 extract_citations   — legal citation regexes, union + dedup
                            (opinion_utills.py:64-83)
  O13 extract_entities    — judges/parties/courts/statutes struct
                            (opinion_utills.py:85-128)
  O14 text_stats          — {length, word_count, citation_count}
                            (opinion_utills.py:174-178)
  O15 enhanced_processing — composite clean -> extract -> stats
                            (opinion_utills.py:149-179)
plus the beyond-reference text-analytics family (task brief):
  tokenize / token_count, quality_score, lang_id, fingerprint.

All regexes are written in the Java-regex / RE2 common subset so the
same pattern string runs in Spark and in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# O11 — HTML strip + whitespace normalize (opinion_utills.py:132-146).
# The reference uses BeautifulSoup.get_text(separator=' ', strip=True);
# the engine's canonical fast path is tag-regex removal + entity unescape +
# whitespace collapse, which matches bs4 on the well-formed markup the
# CourtListener API returns.


def strip_html(col: Column) -> Column:
    return F.regexp_replace(col, r"<[^>]+>", " ")


def unescape_entities(col: Column) -> Column:
    # '&amp;' must be unescaped LAST so double-escaped text ('&amp;lt;')
    # resolves to the literal '&lt;', matching html.unescape ordering.
    out = col
    for ent, rep in [
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ]:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return out


def normalize_whitespace(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def clean_text(col: Column) -> Column:
    """O11: strip markup, unescape entities, collapse whitespace."""
    return normalize_whitespace(unescape_entities(strip_html(col)))


# ---------------------------------------------------------------------------
# O12 — citation extraction (opinion_utills.py:64-83).
# INTENTIONAL DEVIATION from the reference patterns: the reference requires
# a trailing "(year)" parenthetical and matches case-insensitively, and its
# fifth family is law reviews; this engine's canonical patterns drop the
# year requirement (recall over precision for corpus analytics), match
# case-sensitively (reporter abbreviations are canonically capitalized),
# and swap law reviews for U.S.C. statute cites.  Pinned by unit tests.

CITATION_PATTERNS = (
    r"\d+\s+U\.S\.\s+\d+",  # 347 U.S. 483
    r"\d+\s+F\.\s*(?:2d|3d|4th)?\s*\d+",  # 123 F.3d 456
    r"\d+\s+S\.\s*Ct\.\s+\d+",  # 98 S. Ct. 2733
    r"\d+\s+[A-Z][a-z]+\.?\s*(?:2d|3d)?\s+\d+",  # 45 Cal. 2d 101
    r"\d+\s+U\.S\.C\.\s*§+\s*\d+",  # 42 U.S.C. § 1983
)


def extract_citations(col: Column) -> Column:
    """O12: union of all citation-pattern matches, order-preserving dedup."""
    parts = [F.regexp_extract_all(col, F.lit(p), 0) for p in CITATION_PATTERNS]
    return F.array_distinct(F.concat(*parts))


# Reference-parity variant (opinion_utills.py:65-77): year parenthetical
# required, case-insensitive, law-review family instead of U.S.C.
CITATION_PATTERNS_REFERENCE = (
    r"(?i)\d+\s+U\.S\.\s+\d+\s*\(\d{4}\)",
    r"(?i)\d+\s+F\.\s*(?:2d|3d|4th)?\s*\d+\s*\(\d{4}\)",
    r"(?i)\d+\s+S\.\s*Ct\.\s+\d+\s*\(\d{4}\)",
    r"(?i)\d+\s+[A-Z][a-z]+\.?\s*(?:2d|3d)?\s+\d+\s*\(\d{4}\)",
    r"(?i)\d+\s+[A-Z][a-z]+\.?\s*L\.\s*Rev\.\s+\d+\s*\(\d{4}\)",
)


def extract_citations_reference(col: Column) -> Column:
    """O12 in strict reference mode — use when byte-parity with the
    reference's citation lists matters more than recall."""
    parts = [F.regexp_extract_all(col, F.lit(p), 0) for p in CITATION_PATTERNS_REFERENCE]
    return F.array_distinct(F.concat(*parts))


# ---------------------------------------------------------------------------
# O13 — entity extraction (opinion_utills.py:85-128).

# judge forms incl. the reference's "Associate Justice X" and "Name, J."
# opinion-signature style (opinion_utills.py:87-89)
_JUDGE_PAT = (
    r"(?:(?:Associate |Chief )?Justice|Judge)\s+[A-Z][A-Za-z]+"
    r"|[A-Z][A-Za-z]+,\s+(?:C\.\s*)?J\.(?![A-Za-z])"
)
_PARTY_PAT = r"[A-Z][A-Za-z&.,' ]{0,40}?\s+v\.\s+[A-Z][A-Za-z&.,' ]{0,40}"
_COURT_PAT = r"(?:Supreme Court|Court of Appeals|District Court|Circuit Court)(?:\s+(?:of|for)\s+[A-Z][A-Za-z ]+)?"
_STATUTE_PAT = r"\d+\s+U\.S\.C\.\s*§+\s*\d+(?:\([a-z0-9]+\))?"


def _dedup_trim(arr: Column) -> Column:
    # NOT F.transform(arr, F.trim): transform passes (x, i) to binary
    # callables and F.trim's second parameter is the trim CHARACTER SET,
    # so the index silently became the trim set and nothing was trimmed.
    return F.array_distinct(F.transform(arr, lambda x: F.trim(x)))


def extract_entities(col: Column) -> Column:
    """O13: struct<judges, parties, courts, statutes> of distinct matches.

    Fixed keys => StructType, not MapType (SURVEY.md §1.2).  Parties are
    the full "X v. Y" captions; the reference splits plaintiff/defendant
    which `split_parties` below provides.
    """
    return F.struct(
        _dedup_trim(F.regexp_extract_all(col, F.lit(_JUDGE_PAT), 0)).alias("judges"),
        _dedup_trim(F.regexp_extract_all(col, F.lit(_PARTY_PAT), 0)).alias("parties"),
        _dedup_trim(F.regexp_extract_all(col, F.lit(_COURT_PAT), 0)).alias("courts"),
        _dedup_trim(F.regexp_extract_all(col, F.lit(_STATUTE_PAT), 0)).alias("statutes"),
    )


def split_parties(captions: Column) -> Column:
    """Explode "X v. Y" captions into individual party names.

    The inner transform must wrap F.trim in a unary lambda (same hazard as
    _dedup_trim above): transform passes (element, index) to binary
    callables and trim's second parameter is the trim CHARACTER SET, so a
    bare F.trim silently stripped the element's index digits from party
    names ('Agent 1' -> 'Agent ').
    """
    return F.array_distinct(
        F.flatten(
            F.transform(
                captions,
                lambda c: F.transform(F.split(c, r"\s+v\.\s+"), lambda x: F.trim(x)),
            )
        )
    )


# ---------------------------------------------------------------------------
# O14 — text stats (opinion_utills.py:174-178).

TOKEN_PATTERN = r"[a-z0-9]+"  # canonical engine tokenizer (SURVEY.md §2.7 V9)


def tokenize(col: Column) -> Column:
    """Canonical tokenizer: lowercase alnum runs.  Shared with BM25/dedup."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0)


def let_bound(val: Column, fn) -> Column:
    """Let-binding for column expressions: evaluate `val` ONCE per row and
    feed it to `fn` as a lambda variable.

    Catalyst inlines a plain Python reuse of a Column into every
    reference site, and neither whole-stage codegen's subexpression
    elimination (conditional branches are excluded) nor interpreted
    higher-order-function lambdas deduplicate the copies — so an
    expression like `tokenize(col)` referenced k times costs k full
    regex scans of the text per row (the shingles() case was
    O(n_tokens) scans: 27 s for 5k docs vs ~1 s bound).  Lambda
    variables, by contrast, are evaluated once per element; a
    one-element transform turns that into a general `let`.
    """
    return F.element_at(F.transform(F.array(val), fn), 1)


def word_count(col: Column) -> Column:
    # INTENTIONAL DEVIATION: the reference counts whitespace-separated
    # words (len(cleaned.split()), opinion_utills.py:176); this engine
    # counts canonical tokens so word_count, BM25 dl and token stats all
    # share one tokenizer.  whitespace_word_count is the parity variant.
    return F.size(tokenize(col)).cast("long")


def whitespace_word_count(col: Column) -> Column:
    """Reference-parity word count: whitespace-split segments.  Empty /
    whitespace-only input counts 0, matching python's ''.split()
    (F.split of '' yields [''] — size 1 — so gate explicitly)."""
    return (
        F.when(F.length(F.trim(col)) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(col), r"\s+")))
        .cast("long")
    )


def text_stats(text: Column, citations: Column) -> Column:
    """O14: struct<length, word_count, citation_count> — all long."""
    return F.struct(
        F.length(text).cast("long").alias("length"),
        word_count(text).alias("word_count"),
        F.size(citations).cast("long").alias("citation_count"),
    )


def enhanced_processing(raw: Column) -> dict[str, Column]:
    """O15 composite (opinion_utills.py:149-179): returns named columns.

    Usage: df.withColumns(enhanced_processing(F.col('raw_text')))
    """
    cleaned = clean_text(raw)
    cites = extract_citations(cleaned)
    return {
        "opinion_text": cleaned,
        "citations": cites,
        "legal_entities": extract_entities(cleaned),
        "text_stats": text_stats(cleaned, cites),
    }


# ---------------------------------------------------------------------------
# Beyond-reference text analytics (task brief: language-ID, quality
# scoring, token counting, fingerprinting).  All pure column expressions.

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "that")

# Small marker lexicons for the n-gram/stopword language heuristic.  The
# markers are high-frequency function words per language; argmax of marker
# hits wins, deterministic tiebreak by fixed language order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "that", "with", "for"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por"),
    "fr": ("le", "la", "les", "des", "une", "est", "dans", "pour"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
}
LANG_ORDER = ("en", "es", "fr", "de")

_CJK_PATTERN = r"[\x{4e00}-\x{9fff}]"  # CJK Unified Ideographs (Java regex \x{...})


def _marker_hits(tokens: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*markers))).cast("long")


def cjk_ratio(col: Column) -> Column:
    """Fraction of non-space characters that are CJK ideographs."""
    n = F.length(F.regexp_replace(col, r"\s+", "")).cast("double")
    cjk = F.size(F.regexp_extract_all(col, F.lit(_CJK_PATTERN), 0)).cast("double")
    return F.when(n > 0, cjk / n).otherwise(F.lit(0.0))


def lang_id(col: Column, default: str = "und") -> Column:
    """Heuristic language ID: CJK-codepoint ratio decides 'zh' (marker
    tokens can't — the [a-z0-9]+ tokenizer drops CJK); otherwise argmax of
    marker-token hits with deterministic ties -> LANG_ORDER.

    Two let-binding levels: the token array is materialized once (not
    once per marker filter), and the four hit counts once (not once per
    when-branch reference) — the inlined form re-ran the tokenizer
    ~10x per row and its expression tree took seconds to codegen."""

    def pick(h: Column) -> Column:
        best = F.greatest(*[h[lang] for lang in LANG_ORDER])
        expr = F.lit(default)
        for lang in reversed(LANG_ORDER):
            expr = F.when((h[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
        # reversed + overwrite ==> earliest language in LANG_ORDER wins ties
        return expr

    hits = let_bound(
        tokenize(col),
        lambda toks: F.struct(
            *[_marker_hits(toks, LANG_MARKERS[lang]).alias(lang) for lang in LANG_ORDER]
        ),
    )
    return F.when(cjk_ratio(col) >= 0.25, F.lit("zh")).otherwise(let_bound(hits, pick))


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(r"[.!?;:,]"), 0)).cast("long")


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    def ratio(toks: Column) -> Column:
        n = F.size(toks).cast("double")
        hit = F.size(F.filter(toks, lambda t: t.isin(*stopwords))).cast("double")
        return F.when(n > 0, hit / n).otherwise(F.lit(0.0))

    return let_bound(tokenize(col), ratio)


def quality_score(col: Column) -> Column:
    """Composite quality score in [0,1]: length, punctuation, stopword signals.

    Mirrors the shape of standard pretraining-quality filters (length /
    punct / stopword ratios); weights fixed so the score is deterministic.
    """
    def score(toks: Column) -> Column:
        n_chars = F.length(col).cast("double")
        n_tok = F.size(toks).cast("double")
        n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN))).cast("double")
        len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
        avg_tok_len = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
        tok_len_score = F.when(
            (avg_tok_len >= 3.0) & (avg_tok_len <= 10.0), F.lit(1.0)
        ).otherwise(F.lit(0.0))
        stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
        stop_score = F.least(stop_ratio * 4.0, F.lit(1.0))
        punct_ratio = F.when(n_chars > 0, punct_count(col).cast("double") / n_chars).otherwise(
            F.lit(0.0)
        )
        punct_score = F.when(punct_ratio <= 0.1, F.lit(1.0)).otherwise(F.lit(0.0))
        return F.round(
            0.4 * len_score + 0.2 * tok_len_score + 0.2 * stop_score + 0.2 * punct_score, 4
        )

    # one tokenize per row for the token-length AND stopword signals
    # (the inlined form re-ran it ~5x: twice per n_tok reference plus
    # stopword_ratio's two)
    return let_bound(tokenize(col), score)


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text.  Portable across engines (exact-dedup key)."""
    return F.md5(F.lower(normalize_whitespace(col)))


def rolling_fingerprint(col: Column, base: int = 31, mod: int = 2**31 - 1) -> Column:
    """Polynomial rolling hash over the token stream:
    h = Σ h*base + token_hash (mod m).  Order-sensitive (unlike the md5
    fingerprint, which normalizes), so reordered text fingerprints
    differently; pure fold, no shuffle."""
    tok_h = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % mod
    return F.aggregate(
        tokenize(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * base + tok_h(t)) % mod,
    )


# BPE-ish pretokenizer: the GPT-2 pattern family — contractions, letter
# runs (with optional leading space), digit runs, punctuation runs.
# Approximation in the Java/RE2 common subset (no lookahead).
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_ish_tokenize(col: Column) -> Column:
    """BPE-style pretokenization (token-count estimation for LLM data
    budgeting).  Counts differ from whitespace/alnum tokenizers on
    punctuation-heavy text, like real BPE vocabularies do."""
    return F.regexp_extract_all(col, F.lit(BPE_PATTERN), 0)


def bpe_ish_token_count(col: Column) -> Column:
    return F.size(bpe_ish_tokenize(col)).cast("long")


def shingles(col: Column, n: int = 3) -> Column:
    """n-gram (token-level) shingle set — input to Jaccard/MinHash dedup.

    Returns the *distinct* shingles.  Pure expression: tokenize ->
    sliding windows via sequence+transform (no UDF, no explode until the
    caller chooses to).

    The token array is LET-BOUND via a one-element transform: lambda
    variables are evaluated once, whereas inlining `tokenize(col)` into
    the window lambda makes Catalyst re-run the regexp_extract_all for
    every element_at — O(n_tokens x n) regex scans of the full text per
    row, which measured 27 s for 5k sf0.1 docs vs ~1 s with the binding.
    """

    def windows_of(toks: Column) -> Column:
        count = F.size(toks) - (n - 1)
        return F.when(
            count > 0,
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.array_distinct(let_bound(tokenize(col), windows_of))


# ---------------------------------------------------------------------------
# PII scrubbing (training-data prep: strip contact identifiers before a
# corpus is used for training).  Baseline pattern set — RE2-compatible
# (no lookaround/backrefs) so the DuckDB oracle runs the SAME regexes;
# extend per deployment.

PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
)


def scrub_pii(col: Column) -> Column:
    """Replace each PII class with its [TYPE] token, in PII_PATTERNS
    order (SSN before phone is load-bearing only for pattern sets where
    they overlap; this baseline set is disjoint).  Pure chained
    regexp_replace — codegen'd, no UDF."""
    out = col
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


def pii_counts(col: Column) -> Column:
    """struct(n_email, n_ssn, n_phone): per-class match counts on the
    RAW text (count before scrubbing — the audit a curation run logs)."""
    return F.struct(
        *[
            F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("long").alias(f"n_{name}")
            for name, pat in PII_PATTERNS
        ]
    )
