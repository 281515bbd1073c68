"""Golden tests for the HTML landing-page extraction operator.

The oracle below (`_reference_merge`) is an independent reimplementation of
the reference's per-file dict merge (parse_landing_page_html.py:188-228);
the Spark path is extract_html_pairs + dedup_pairs_with_sources. Both are
driven over synthesized pages covering every construct the reference
handles: meta state machine, orphan institution tags, blank contents,
ul.authors direct-children / nested spans / second-ul, source merging.
"""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.html_extract import (
    decode_doi_filename,
    extract_html_pairs,
    html_parse_stats,
    parse_landing_page,
)
from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.span_pairing import (
    dedup_pairs_with_sources,
)


def _fname(doi: str) -> str:
    return base64.urlsafe_b64encode(doi.encode()).decode() + ".html"


PAGES = {
    # plain meta: two authors, first with two institutions, second lonely
    _fname("10.1234/a"): """
<html><head>
<meta name="citation_author" content="Ada Lovelace">
<meta name="citation_author_institution" content="Analytical Engines Inc">
<meta name="citation_author_institution" content="Univ of London">
<meta name="citation_author" content="Charles Babbage">
</head><body></body></html>""",
    # orphan institution before any author (ignored, but flag set);
    # blank-content author skipped; NAME attr case-insensitive
    _fname("10.1234/b"): """
<html><head>
<meta name="citation_author_institution" content="Orphan Inst">
<meta name="citation_author" content="   ">
<meta NAME="Citation_Author" content=" Grace Hopper ">
<meta name="citation_author_institution" content=" Navy ">
</head><body></body></html>""",
    # ul.authors: direct li children only, nested span text, second ul ignored,
    # li without span.name dropped, meta+ul same key -> merged sources
    _fname("10.1234/c"): """
<html><head>
<meta name="citation_author" content="Alan Turing">
<meta name="citation_author_institution" content="Bletchley">
</head><body>
<ul class="authors extra">
  <li><span class="name">Alan <b>Turing</b></span><span class="affiliation">Bletchley</span></li>
  <li><span class="name">John von Neumann</span></li>
  <li><em>no name span here</em></li>
  <li><ul><li><span class="name">NestedNope</span></li></ul>
      <span class="name">Outer Li</span></li>
</ul>
<ul class="authors"><li><span class="name">SecondUlIgnored</span></li></ul>
</body></html>""",
    # duplicate meta key: first original wins; then ul overwrites
    _fname("10.1234/d"): """
<html><head>
<meta name="citation_author" content="X Y">
<meta name="citation_author_institution" content="Z">
<meta name="citation_author" content="X Y">
<meta name="citation_author_institution" content="Z">
</head><body>
<ul class="authors"><li><span class="name">X Y</span><span class="affiliation">Z</span></li></ul>
</body></html>""",
    # no metadata at all
    _fname("10.1234/e"): "<html><head></head><body><p>nothing</p></body></html>",
}


def _reference_merge(meta_pairs, ul_pairs):
    """parse_landing_page_html.py:188-228, verbatim semantics."""
    combined = {}
    for author, institutions in meta_pairs:
        a = author.strip() if author else ""
        for inst in institutions or [""]:
            i = inst.strip() if inst else ""
            key = (a, i)
            if key not in combined:
                combined[key] = {"sources": set(), "original": [author, inst]}
            combined[key]["sources"].add("meta")
    for author, inst in ul_pairs:
        a = author.strip() if author else ""
        i = inst.strip() if inst else ""
        key = (a, i)
        if key not in combined:
            combined[key] = {"sources": set(), "original": [author, inst]}
        combined[key]["sources"].add("ul.authors")
        combined[key]["original"] = [author, inst]
    return sorted(
        (d["original"][0], d["original"][1], ";".join(sorted(d["sources"])))
        for d in combined.values()
    )


def test_doi_filename_roundtrip():
    for doi in ["10.1234/a", "10.99/x?y=1", "10.1/ünïcode"]:
        doi2, err = decode_doi_filename(_fname(doi))
        assert err is None and doi2 == doi
    # b64 of 0xff -> invalid UTF-8 -> decode error routed, doi empty
    bad, err = decode_doi_filename("_w==.html")
    assert bad == "" and "DOI decoding error" in err
    # pure-junk filenames decode leniently to b'' (a2b_base64 discards
    # non-alphabet bytes) -> empty doi, no error — same as the reference
    empty, err2 = decode_doi_filename("!!!.html")
    assert empty == "" and err2 is None


def test_parser_kernel_constructs():
    meta, ul, has_a, has_i = parse_landing_page(PAGES[_fname("10.1234/b")])
    # orphan institution ignored, blank author skipped, contents stripped
    assert meta == [("Grace Hopper", ["Navy"])]
    assert has_a and has_i and ul == []

    meta, ul, *_ = parse_landing_page(PAGES[_fname("10.1234/c")])
    assert meta == [("Alan Turing", ["Bletchley"])]
    # nested span text concatenated (bs4 get_text(strip=True) parity);
    # li without name dropped; the nested-ul li is NOT its own direct child
    # but item.find() searches ALL descendants, so the nested span.name
    # ('NestedNope') wins in document order — bs4 semantics; 2nd ul ignored
    assert ul == [
        ("AlanTuring", "Bletchley"),
        ("John von Neumann", ""),
        ("NestedNope", ""),
    ]


def test_spark_path_matches_reference_merge(spark):  # noqa: F811
    df = spark.createDataFrame(list(PAGES.items()), "file_name string, html string")
    ex = extract_html_pairs(df).persist()
    pairs = ex.where(F.col("author").isNotNull()).select(
        F.col("file_name").alias("doc_id"), "author", "institution", "source", "seq"
    )
    merged = dedup_pairs_with_sources(pairs)
    got = {}
    for r in merged.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["author"], r["institution"], r["sources"])
        )
    for fname, html in PAGES.items():
        meta, ul, *_ = parse_landing_page(html)
        expect = _reference_merge(meta, ul)
        assert sorted(got.get(fname, [])) == expect, fname

    # per-file doi decode through the distributed path
    dois = {r["file_name"]: r["doi"] for r in ex.select("file_name", "doi").distinct().collect()}
    for doi in ["10.1234/a", "10.1234/b", "10.1234/c", "10.1234/d", "10.1234/e"]:
        assert dois[_fname(doi)] == doi

    stats = html_parse_stats(ex).collect()[0]
    assert stats["total_files"] == 5
    assert stats["files_processed_ok"] == 5
    assert stats["files_with_author_tag"] == 4
    assert stats["files_with_institution_tag"] == 4
    assert stats["files_with_both_tags"] == 4
    assert stats["files_with_ul_authors"] == 2
    ex.unpersist()


def test_cross_check_vs_span_model(spark):  # noqa: F811
    """The meta state machine must agree with the span-model W2 operator
    (pair_authors_affiliations) when the meta tags are re-expressed as
    author/affiliation spans."""
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.span_pairing import (
        pair_authors_affiliations,
    )

    rows = []
    for fname, html in PAGES.items():
        meta, _, _, _ = parse_landing_page(html)
        spans, off = [], 0
        for author, insts in meta:
            spans.append(("author", author, "", off)); off += 1
            for i in insts:
                spans.append(("affiliation", i, "", off)); off += 1
        rows.append((fname, spans))
    docs = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = {
        (r["doc_id"], r["author"], r["institution"])
        for r in pair_authors_affiliations(docs).collect()
    }
    expect = set()
    for fname, html in PAGES.items():
        meta, *_ = parse_landing_page(html)
        for author, insts in meta:
            for i in insts or [""]:
                expect.add((fname, author, i))
    assert got == expect


@pytest.mark.parametrize("junk", ["", "<", "<<<>>>", "<html", "\x00\x01", "a" * 10_000])
def test_parser_never_raises(junk):
    meta, ul, ha, hi = parse_landing_page(junk)
    assert meta == [] and ul == []


def test_dedup_original_selection_first_meta_last_ul(spark):
    """Differing raw strings within one trimmed key: meta keeps the FIRST
    original (dict setdefault, py:194-208), ul.authors rows OVERWRITE it
    (py:210-219) — regardless of seq interleaving."""
    rows = [
        # doc A: two meta raws differing in whitespace -> first wins
        ("A", " X", "Z ", "meta", 0),
        ("A", "X ", " Z", "meta", 1),
        # doc B: meta then ul with a different raw -> last ul wins
        ("B", " X", "Z ", "meta", 0),
        ("B", "X ", " Z", "ul.authors", 1),
        ("B", "X", "Z", "ul.authors", 2),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, author string, institution string, source string, seq int"
    )
    got = {r["doc_id"]: r for r in dedup_pairs_with_sources(df).collect()}
    assert (got["A"]["author"], got["A"]["institution"]) == (" X", "Z ")
    assert got["A"]["sources"] == "meta"
    assert (got["B"]["author"], got["B"]["institution"]) == ("X", "Z")
    assert got["B"]["sources"] == "meta;ul.authors"


def test_unclosed_li_implied_close():
    """ADVICE r2: HTML5 allows omitting </li>; a new <li> at list level (or
    </ul>) must imply-close the open item instead of nesting forever and
    collapsing every author into the first item."""
    page = (
        '<ul class="authors">'
        '<li><span class="name">Ada Lovelace</span>'
        '<span class="affiliation">Analytical Engine</span>'
        '<li><span class="name">Charles Babbage</span>'
        '<li><span class="name">Mary Somerville</span>'
        '<span class="affiliation">RAS</span>'
        "</ul>"
    )
    _, ul, *_ = parse_landing_page(page)
    assert ul == [
        ("Ada Lovelace", "Analytical Engine"),
        ("Charles Babbage", ""),
        ("Mary Somerville", "RAS"),
    ]
    # unclosed li with an unclosed span, closed only by </ul>
    page2 = '<ul class="authors"><li><span class="name">Solo Author</ul>'
    _, ul2, *_ = parse_landing_page(page2)
    assert ul2 == [("Solo Author", "")]
    # nested ul inside an li still does NOT produce extra direct items,
    # and the explicit-close path is unchanged
    page3 = (
        '<ul class="authors">'
        '<li><span class="name">Outer</span><ul><li>inner</li></ul></li>'
        '<li><span class="name">Second</span></li>'
        "</ul>"
    )
    _, ul3, *_ = parse_landing_page(page3)
    assert ul3 == [("Outer", ""), ("Second", "")]
