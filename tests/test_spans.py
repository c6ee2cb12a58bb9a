"""Duplicate-span detection/removal (ExactSubstr-style): Spark vs
pure-python model parity, canonical-copy semantics, edge cases."""

import re
from collections import defaultdict

import pytest

from feature_extraction_spark.ops.spans import (
    duplicate_spans,
    remove_duplicate_spans,
)

BOILER = "this license block is shared verbatim across many documents today"  # 10 tokens

DOCS = [
    (0, f"alpha beta gamma {BOILER} delta epsilon"),
    (1, f"zeta eta {BOILER} theta iota kappa"),
    (2, f"{BOILER} standalone tail words here now"),
    (3, "completely unrelated content with no duplicated runs at all kept"),
    (4, None),
    (5, ""),
    (6, "short doc"),
    # within-doc repetition (only counts when min_docs=1)
    (7, "x1 x2 x3 x4 x5 x6 x7 x8 q x1 x2 x3 x4 x5 x6 x7 x8"),
    # case-insensitive matching, original case preserved on rebuild
    (8, f"THIS LICENSE BLOCK IS SHARED VERBATIM ACROSS MANY DOCUMENTS TODAY tail"),
]


def _toks(t):
    return [w for w in re.split(r"\s+", t or "") if w]


def spans_model(docs, l, min_docs):
    wins = []
    for d, t in docs:
        ws = _toks(t)
        for p in range(1, len(ws) - l + 2):
            wins.append((d, p, " ".join(x.lower() for x in ws[p - 1 : p - 1 + l])))
    occ = defaultdict(list)
    for d, p, g in wins:
        occ[g].append((d, p))
    if min_docs > 1:
        dup = {g for g, o in occ.items() if len({d for d, _ in o}) >= min_docs}
    else:
        dup = {g for g, o in occ.items() if len(o) >= 2}
    hits = defaultdict(list)
    for d, p, g in wins:
        if g in dup:
            hits[d].append(p)
    spans = []
    for d, ps in sorted(hits.items()):
        ps.sort()
        start = prev = None
        nwin = 0
        for p in ps:
            if start is None:
                start, prev, nwin = p, p, 1
            elif p <= prev + l:
                prev, nwin = p, nwin + 1
            else:
                spans.append((d, start, prev + l - 1, prev + l - start, nwin))
                start, prev, nwin = p, p, 1
        if start is not None:
            spans.append((d, start, prev + l - 1, prev + l - start, nwin))
    keeper = {g: min(o) for g, o in occ.items() if g in dup}
    removed = []
    for d, t in docs:
        ws = _toks(t)
        cov = set()
        for dd, p, g in wins:
            if dd == d and g in dup and (dd, p) != keeper[g]:
                cov.update(range(p, p + l))
        kept = [w for i, w in enumerate(ws, 1) if i not in cov]
        new_text = None if t is None else " ".join(kept)
        removed.append((d, new_text, len(ws) - len(kept)))
    return sorted(spans), sorted(removed)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("l,min_docs", [(8, 2), (5, 2), (8, 1), (10, 3)])
def test_duplicate_spans_parity(docs_df, l, min_docs):
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in duplicate_spans(docs_df, l=l, min_docs=min_docs).collect()
    )
    exp_spans, _ = spans_model(DOCS, l, min_docs)
    assert got == exp_spans


@pytest.mark.parametrize("l,min_docs", [(8, 2), (8, 1)])
def test_remove_duplicate_spans_parity(docs_df, l, min_docs):
    out = remove_duplicate_spans(docs_df, l=l, min_docs=min_docs)
    assert out.columns == ["doc_id", "text", "n_removed_tokens"]
    got = sorted(
        (r.doc_id, r.text, r.n_removed_tokens) for r in out.collect()
    )
    _, exp = spans_model(DOCS, l, min_docs)
    assert got == exp


def test_one_canonical_copy_survives(docs_df):
    """Exactly one copy of the shared boilerplate survives removal (the
    smallest (doc, pos) occurrence — doc 0), all other copies are cut."""
    out = {
        r.doc_id: r.text
        for r in remove_duplicate_spans(docs_df, l=8, min_docs=2).collect()
    }
    n_copies = sum(BOILER in (t or "").lower() for t in out.values())
    assert n_copies == 1
    assert BOILER in out[0]
    # untouched docs keep all their tokens (canonical whitespace join)
    assert out[3] == DOCS[3][1]
    assert out[6] == "short doc"


def test_within_doc_repetition_needs_min_docs_1(docs_df):
    cross = duplicate_spans(docs_df, l=8, min_docs=2).filter("doc_id = 7").count()
    assert cross == 0
    within = duplicate_spans(docs_df, l=8, min_docs=1).filter("doc_id = 7").count()
    assert within > 0


def test_no_python_udfs(docs_df):
    plan = (
        remove_duplicate_spans(docs_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
