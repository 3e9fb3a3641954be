"""Text operators O11-O15 + the text-analytics family."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.functions.text import (
    clean_text,
    extract_citations,
    extract_entities,
    fingerprint,
    lang_id,
    quality_score,
    shingles,
    text_stats,
    tokenize,
    unescape_entities,
    whitespace_word_count,
    word_count,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["t"]).select(col.alias("v")).collect()[0]["v"]


def test_clean_text_strips_html(spark):
    got = _one(spark, "<p>Hello   <b>world</b></p>\n\n  extra", clean_text(F.col("t")))
    assert got == "Hello world extra"


def test_unescape_amp_last(spark):
    # double-escaped '&amp;lt;' must become the literal '&lt;', not '<'
    got = _one(spark, "&amp;lt; and &lt; and &amp;", unescape_entities(F.col("t")))
    assert got == "&lt; and < and &"


def test_malformed_html_matching_bs4(spark):
    """Golden pins where the regex fast path AGREES with the reference's
    BeautifulSoup.get_text on malformed markup (deviation table in
    COVERAGE.md): unclosed tags, script bodies (get_text keeps them too),
    comments without '>' inside."""
    assert _one(spark, "<p>Hello <b>world", clean_text(F.col("t"))) == "Hello world"
    got = _one(
        spark,
        "<script>var x=1; alert('hi');</script>Body text.",
        clean_text(F.col("t")),
    )
    assert got == "var x=1; alert('hi'); Body text."
    assert _one(spark, "Before<!-- a comment -->After", clean_text(F.col("t"))) == (
        "Before After"
    )


def test_malformed_html_bs4_divergence_golden(spark):
    """Golden pins where the regex path DEVIATES from bs4 (documented in
    COVERAGE.md): '<[^>]+>' stops at the FIRST '>', so a '>' inside an
    attribute value or a comment leaves a fragment where bs4 drops it.
    Acceptable for API-shaped input: serialized HTML escapes '>' in
    attributes and carries no comments; pinned so any future change to
    the canonical path is a conscious one."""
    got = _one(spark, '<a title="a>b">link</a>', clean_text(F.col("t")))
    assert got == 'b">link'  # bs4 would yield 'link'
    got = _one(spark, "<!-- note: a > b -->After.", clean_text(F.col("t")))
    assert got == "b -->After."  # bs4 would yield 'After.'
    # the escaped form of the same attribute IS handled identically to bs4
    got = _one(spark, '<a title="a&gt;b">link</a>', clean_text(F.col("t")))
    assert got == "link"


def test_citations_golden(spark):
    text = "See 347 U.S. 483 and 123 F.3d 456; also 98 S. Ct. 2733, 45 Cal. 2d 101, 42 U.S.C. § 1983. Repeat: 347 U.S. 483."
    got = _one(spark, text, extract_citations(clean_text(F.col("t"))))
    assert "347 U.S. 483" in got and got.count("347 U.S. 483") == 1  # deduped
    assert "123 F.3d 456" in got
    assert "98 S. Ct. 2733" in got
    assert "42 U.S.C. § 1983" in got


def test_citations_reference_mode(spark):
    from lawlm_spark.functions.text import extract_citations_reference

    text = "See Brown, 347 U.S. 483 (1954); compare 347 U.S. 483 without year and 12 Harv. L. Rev. 417 (1899)."
    got = _one(spark, text, extract_citations_reference(F.col("t")))
    assert "347 U.S. 483 (1954)" in got  # year parenthetical required
    assert "12 Harv. L. Rev. 417 (1899)" in got  # law-review family
    assert not any(c == "347 U.S. 483" for c in got)  # no-year cite excluded


def test_judge_signature_forms(spark):
    text = "Associate Justice Kagan joined. Roberts, C. J. filed a dissent; Marshall, J. concurred."
    got = _one(spark, text, extract_entities(F.col("t")))
    assert any("Kagan" in j for j in got["judges"])
    assert any(j == "Marshall, J." for j in got["judges"])
    assert any("Roberts" in j for j in got["judges"])


def test_split_parties_trailing_digits(spark):
    # Regression (ADVICE r3): a bare F.trim passed to the inner transform
    # binds the array index as trim's CHARACTER-SET argument, so
    # 'Smith v. Agent 1' lost its trailing '1' (index=1) while whitespace
    # survived.  The unary-lambda fix must trim whitespace and keep digits.
    from lawlm_spark.functions.text import split_parties

    got = _one(
        spark,
        "x",
        split_parties(F.array(F.lit("Smith v. Agent 1"), F.lit("  A 2  v.  B 3  "))),
    )
    assert got == ["Smith", "Agent 1", "A 2", "B 3"]


def test_entities_struct(spark):
    text = (
        "Justice Marshall delivered the opinion. Brown v. Board of Education was "
        "heard by the Supreme Court of the United States under 42 U.S.C. § 1983."
    )
    got = _one(spark, text, extract_entities(F.col("t")))
    assert any("Marshall" in j for j in got["judges"])
    assert any("v." in p for p in got["parties"])
    assert any(c.startswith("Supreme Court") for c in got["courts"])
    assert got["statutes"] == ["42 U.S.C. § 1983"]


def test_text_stats_and_word_counts(spark):
    text = "One two three. U.S. law."
    df = spark.createDataFrame([(text,)], ["t"])
    row = df.select(
        text_stats(F.col("t"), extract_citations(F.col("t"))).alias("s"),
        word_count(F.col("t")).alias("wc"),
        whitespace_word_count(F.col("t")).alias("wwc"),
    ).collect()[0]
    assert row["s"]["length"] == len(text)
    assert row["wc"] == 6  # tokens: one two three u s law
    assert row["wwc"] == 5  # whitespace parity variant (reference semantics)


def test_lang_id(spark):
    cases = {
        "the cat and the dog went to the market for food": "en",
        "el perro y la casa de los niños por la mañana": "es",
        "le chat est dans la maison pour les enfants": "fr",
        "der hund ist nicht mit das und die katze": "de",
        "这是一个中文句子没有任何拉丁字母": "zh",
        "xyzzy qwerty 12345": "und",
    }
    for text, want in cases.items():
        got = _one(spark, text, lang_id(F.col("t")))
        assert got == want, f"{text!r}: got {got}, want {want}"


def test_quality_score_bounds(spark, docs):
    rows = docs.select(quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_fingerprint_whitespace_invariant(spark):
    a = _one(spark, "Hello   World", fingerprint(F.col("t")))
    b = _one(spark, "  hello world  ", fingerprint(F.col("t")))
    assert a == b


def test_shingles(spark):
    got = _one(spark, "a b c d", shingles(F.col("t"), 3))
    assert got == ["a b c", "b c d"]
    assert _one(spark, "a b", shingles(F.col("t"), 3)) == []


def test_tokenize(spark):
    assert _one(spark, "Hello, WORLD-42!", tokenize(F.col("t"))) == ["hello", "world", "42"]
