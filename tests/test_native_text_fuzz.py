"""Hypothesis fuzz for the native text index and FSA5 FST round trip
(round-7 item 7) — the same strategy-driven coverage the segment format
gets in test_segment_fuzz.py.

Strategies deliberately include the nasty shapes: unicode multibyte
terms, empty strings, ~2000-byte terms, stop-word-only documents, None
documents, and prefix-heavy vocabularies (shared-prefix runs stress the
FSA5 subtree encoding). Each config checks write/read identity (vocab,
postings, FST outputs) and index-vs-reference equivalence for term and
prefix queries, where the reference is a direct Python evaluation of
the analyzed-token semantics.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from hurricanedb_spark.sources.native_text_index import (
    ImmutableFst,
    NativeTextIndex,
    analyze,
    encode_native_text_index,
    serialize_fst,
)

# -- FST round trip ---------------------------------------------------------

_term = hst.one_of(
    hst.text(min_size=0, max_size=12),  # arbitrary unicode incl. ''
    hst.text(alphabet="ab", min_size=1, max_size=8),  # prefix-heavy
    hst.sampled_from(["café", "žluťoučký", "東京タワー", "the", "a" * 2000]),
    hst.text(alphabet="x", min_size=100, max_size=400),  # long runs
)


@settings(max_examples=150, deadline=None)
@given(terms=hst.lists(_term, min_size=1, max_size=40, unique=True))
def test_fst_round_trip_fuzz(terms):
    ordered = sorted(terms)  # FSA5 writer contract: sorted input
    buf = serialize_fst([(t, i) for i, t in enumerate(ordered)])
    fst = ImmutableFst(buf)
    # exact lookup of every term -> its output id
    for i, t in enumerate(ordered):
        assert fst.lookup(t) == i, t
    # absent terms -> None (an existing term with a suffix is never final
    # unless it is itself a term)
    for t in ordered[:5]:
        probe = t + "☃"
        if probe not in terms:
            assert fst.lookup(probe) is None
    # full enumeration is the identity
    assert sorted((t, o) for t, o in fst.terms()) == [
        (t, i) for i, t in enumerate(ordered)
    ]
    # prefix subtree equals a filtered enumeration
    if ordered:
        p = ordered[0][:2]
        got = sorted(o for _, o in fst.terms_with_prefix(p))
        want = sorted(i for i, t in enumerate(ordered) if t.startswith(p))
        assert got == want


# -- native text index round trip -------------------------------------------

_doc = hst.one_of(
    hst.none(),
    hst.just(""),
    hst.just("the and of to in is"),  # stop words only -> no postings
    hst.text(max_size=60),
    hst.lists(
        hst.sampled_from(
            ["alpha", "alphabet", "alp", "beta", "Beta9", "the", "café",
             "x" * 1500, "42", "spark"]
        ),
        min_size=1,
        max_size=8,
    ).map(" ".join),
)


@settings(max_examples=150, deadline=None)
@given(docs=hst.lists(_doc, min_size=1, max_size=30), data=hst.data())
def test_native_text_index_fuzz(docs, data):
    buf = encode_native_text_index(iter(docs))
    idx = NativeTextIndex(buf)
    # reference postings from the same analyzer
    ref: dict[str, set[int]] = {}
    for i, d in enumerate(docs):
        for tok in analyze(d):
            ref.setdefault(tok, set()).add(i)
    assert idx.n_tokens == len(ref)
    # write/read identity: every vocabulary term answers its posting
    for tok, want in ref.items():
        assert set(int(x) for x in idx.doc_ids_for_term(tok)) == want, tok
    # absent / stop-word terms answer empty
    for probe in ("nosuchtok", "the", ""):
        if probe not in ref:
            assert len(idx.doc_ids_for_term(probe)) == 0
    # prefix query equals the reference union
    if ref:
        tok = data.draw(hst.sampled_from(sorted(ref)))
        plen = data.draw(hst.integers(1, max(1, len(tok))))
        prefix = tok[:plen]
        want = set().union(
            *(v for t, v in ref.items() if t.startswith(prefix))
        )
        assert set(int(x) for x in idx.doc_ids_with_prefix(prefix)) == want
    # arbitrary-predicate scan (the regexp path's engine) equals reference
    want_sub = set().union(
        *(v for t, v in ref.items() if "a" in t), set()
    ) if ref else set()
    assert (
        set(int(x) for x in idx.doc_ids_matching(lambda t: "a" in t))
        == want_sub
    )


@settings(max_examples=40, deadline=None)
@given(docs=hst.lists(_doc, min_size=1, max_size=20), data=hst.data())
def test_text_match_allowlist_superset_fuzz(docs, data):
    """For random docs and random boolean TEXT_MATCH queries built from
    their own tokens, the allowlist must be a superset of the residual's
    matches evaluated directly in Python (raw-substring term semantics,
    the translator's authoritative meaning)."""
    from hurricanedb_spark.sources.native_text_index import (
        text_match_allowlist,
    )

    buf = encode_native_text_index(iter(docs))
    idx = NativeTextIndex(buf)
    vocab = sorted({t for d in docs for t in analyze(d)}) or ["zz"]
    t1 = data.draw(hst.sampled_from(vocab))
    t2 = data.draw(hst.sampled_from(vocab + ["nosuchtok"]))
    q = data.draw(
        hst.sampled_from(
            [
                f"{t1}",
                f"{t1} AND {t2}",
                f"{t1} OR {t2}",
                f"{t1} {t2}",
                f"({t1} OR {t2}) AND {t1}",
                f'"{t1} {t2}"',
                f"{t1[:2]}*",
                f"{t1} AND NOT {t2}",
            ]
        )
    )
    allow = text_match_allowlist(idx, q)
    if allow is None:
        return  # unknown: never prunes, trivially sound
    allowed = set(int(x) for x in allow)

    def contains(doc, lit):  # raw-substring term residual
        return doc is not None and lit in doc

    def matches(doc):
        # evaluate the same grammar shapes directly
        if q == f"{t1}":
            return contains(doc, t1)
        if q == f"{t1} AND {t2}":
            return contains(doc, t1) and contains(doc, t2)
        if q in (f"{t1} OR {t2}", f"{t1} {t2}"):
            return contains(doc, t1) or contains(doc, t2)
        if q == f"({t1} OR {t2}) AND {t1}":
            return (contains(doc, t1) or contains(doc, t2)) and contains(doc, t1)
        if q == f'"{t1} {t2}"':
            return contains(doc, f"{t1} {t2}")
        if q == f"{t1[:2]}*":
            import re

            return doc is not None and re.search(
                r"\b" + re.escape(t1[:2]), doc
            ) is not None
        if q == f"{t1} AND NOT {t2}":
            # AND(known, unknown) keeps the known bound: allowlist must
            # still cover every doc matching the full conjunction
            return contains(doc, t1) and not contains(doc, t2)
        return None

    for i, d in enumerate(docs):
        m = matches(d)
        if m:
            assert i in allowed, (q, d)
