"""dedup_substring_spans — exact-substring span dedup (Lee et al. 2022
style, seed-window + island-merge formulation). Planted-corpus semantics:
maximal-span merging, the L-token visibility threshold, cross-document-only
flagging, and a brute-force oracle over random corpora."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

from roar_spark.operators.dedup import SUBSTRING_WINDOW, dedup_substring_spans

L = SUBSTRING_WINDOW


def _write_docs(tmp_path, texts):
    d = tmp_path / "corpus"
    d.mkdir(parents=True)
    ids = list(range(len(texts)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["t"] * len(ids)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def _words(tag, n):
    return [f"{tag}{i}" for i in range(n)]


def test_planted_shared_span_reported_maximal(spark, tmp_path):
    """A 15-token passage shared verbatim by two docs at different offsets
    is reported as ONE maximal span per doc, at each doc's own offset."""
    shared = _words("s", L + 5)  # 15 tokens: 6 seed windows that must merge
    doc_a = _words("a", 3) + shared + _words("b", 4)
    doc_b = _words("c", 7) + shared + _words("d", 2)
    filler = [" ".join(_words(f"f{k}_", L + 8)) for k in range(3)]
    sf = _write_docs(tmp_path, [" ".join(doc_a), " ".join(doc_b)] + filler)
    got = {
        r.doc_id: (r.span_start, r.span_end, r.span_len)
        for r in dedup_substring_spans(spark, sf).collect()
    }
    assert got == {
        0: (3, 3 + L + 4, L + 5),
        1: (7, 7 + L + 4, L + 5),
    }


def test_sub_window_overlap_invisible_by_contract(spark, tmp_path):
    """Shared runs shorter than L tokens are below the match threshold."""
    shared = _words("s", L - 1)
    sf = _write_docs(
        tmp_path,
        [
            " ".join(_words("a", 5) + shared),
            " ".join(shared + _words("b", 5)),
        ],
    )
    assert dedup_substring_spans(spark, sf).count() == 0


def test_intra_document_repeat_not_flagged(spark, tmp_path):
    """A doc repeating its own L-gram twice is NOT cross-document
    duplication; a distinct doc sharing the gram IS."""
    gram = _words("g", L)
    doc_self = gram + _words("x", 2) + gram  # repeats itself only
    sf = _write_docs(tmp_path, [" ".join(doc_self), " ".join(_words("y", L + 5))])
    assert dedup_substring_spans(spark, sf).count() == 0

    # now add a second doc carrying the same gram: BOTH repeats in doc 0
    # become duplicated spans (two islands: starts 0..0 and L+2..L+2)
    sf2 = _write_docs(
        tmp_path / "again",
        [" ".join(doc_self), " ".join(gram + _words("z", 3))],
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in dedup_substring_spans(spark, sf2).collect()
    )
    assert got == [
        (0, 0, L - 1),
        (0, L + 2, 2 * L + 1),
        (1, 0, L - 1),
    ]


def test_adjacent_seeds_merge_across_gap_boundary(spark, tmp_path):
    """Two shared passages separated by ≥1 unshared token stay TWO spans;
    separated by 0 tokens they fuse into one (island boundary math)."""
    p1, p2 = _words("p", L), _words("q", L)
    # gap variant: one private token between the passages in doc 0
    doc0 = p1 + ["gap0only"] + p2
    sf = _write_docs(tmp_path, [" ".join(doc0), " ".join(p1 + _words("r", 2)), " ".join(p2)])
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in dedup_substring_spans(spark, sf).collect()
    )
    assert (0, 0, L - 1) in got and (0, L + 1, 2 * L) in got
    assert (0, 0, 2 * L) not in got


def test_matches_bruteforce_oracle_random_corpus(spark, tmp_path):
    """Property-style check on a seeded random corpus with planted copies:
    the operator equals a plain-Python brute-force of the definition
    (position duplicated iff covered by an L-window occurring in ≥2 docs)."""
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(25)]  # small vocab → organic collisions
    docs = [[rng.choice(vocab) for _ in range(rng.randint(L, 40))] for _ in range(30)]
    # plant verbatim passages across random doc pairs
    for _ in range(6):
        src, dst = rng.sample(range(30), 2)
        ln = rng.randint(L, min(len(docs[src]), L + 8))
        st = rng.randint(0, len(docs[src]) - ln)
        ins = rng.randint(0, len(docs[dst]))
        docs[dst] = docs[dst][:ins] + docs[src][st : st + ln] + docs[dst][ins:]
    texts = [" ".join(d) for d in docs]
    sf = _write_docs(tmp_path, texts)

    # brute force the definition
    from collections import defaultdict

    owners = defaultdict(set)
    for i, d in enumerate(docs):
        for s in range(len(d) - L + 1):
            owners[" ".join(d[s : s + L])].add(i)
    expect = []
    for i, d in enumerate(docs):
        starts = [
            s
            for s in range(len(d) - L + 1)
            if len(owners[" ".join(d[s : s + L])]) >= 2
        ]
        run: list[int] = []
        for s in starts:
            if run and s > run[-1] + L:
                expect.append((i, run[0], run[-1] + L - 1, run[-1] + L - run[0]))
                run = []
            run.append(s)
        if run:
            expect.append((i, run[0], run[-1] + L - 1, run[-1] + L - run[0]))
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in dedup_substring_spans(spark, sf).collect()
    )
    assert got == sorted(expect)
    assert len(got) >= 6  # the planted copies are visible


# --- dedup_substring_strip (the keep-first-occurrence transform) ---

import hashlib

from roar_spark.operators.dedup import dedup_substring_strip


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_strip_first_owner_keeps_later_doc_loses_span(spark, tmp_path):
    shared = _words("s", L + 3)
    doc_a = _words("a", 2) + shared           # doc 0: first owner, untouched
    doc_b = _words("b", 4) + shared + _words("c", 2)  # doc 1: loses the span
    sf = _write_docs(tmp_path, [" ".join(doc_a), " ".join(doc_b)])
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.kept_md5)
           for r in dedup_substring_strip(spark, sf).collect()}
    assert got[0] == (len(doc_a), 0, _md5(" ".join(doc_a)))
    assert got[1] == (
        len(doc_b),
        len(shared),
        _md5(" ".join(_words("b", 4) + _words("c", 2))),
    )


def test_strip_verbatim_copy_strips_to_empty(spark, tmp_path):
    doc = _words("x", L + 5)
    sf = _write_docs(tmp_path, [" ".join(doc), " ".join(doc)])
    got = {r.doc_id: (r.n_removed, r.kept_md5)
           for r in dedup_substring_strip(spark, sf).collect()}
    assert got[0] == (0, _md5(" ".join(doc)))
    assert got[1] == (len(doc), _md5(""))


def test_strip_short_doc_passes_through(spark, tmp_path):
    """Docs below the L-token seed threshold are never candidates and
    come through byte-identical."""
    short = _words("q", L - 2)
    sf = _write_docs(tmp_path, [" ".join(short), " ".join(_words("r", L + 2))])
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.kept_md5)
           for r in dedup_substring_strip(spark, sf).collect()}
    assert got[0] == (len(short), 0, _md5(" ".join(short)))


def test_strip_matches_bruteforce_oracle_random_corpus(spark, tmp_path):
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(25)]
    docs = [[rng.choice(vocab) for _ in range(rng.randint(L, 40))] for _ in range(30)]
    for _ in range(6):
        src, dst = rng.sample(range(30), 2)
        ln = rng.randint(L, min(len(docs[src]), L + 8))
        st = rng.randint(0, len(docs[src]) - ln)
        ins = rng.randint(0, len(docs[dst]))
        docs[dst] = docs[dst][:ins] + docs[src][st : st + ln] + docs[dst][ins:]
    sf = _write_docs(tmp_path, [" ".join(d) for d in docs])

    from collections import defaultdict

    owners = defaultdict(list)
    for i, d in enumerate(docs):
        for s in range(len(d) - L + 1):
            owners[" ".join(d[s : s + L])].append(i)
    expect = {}
    for i, d in enumerate(docs):
        removed = set()
        for s in range(len(d) - L + 1):
            if min(owners[" ".join(d[s : s + L])]) < i:
                removed.update(range(s, s + L))
        kept = [t for p, t in enumerate(d) if p not in removed]
        expect[i] = (len(d), len(removed), _md5(" ".join(kept)))
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.kept_md5)
           for r in dedup_substring_strip(spark, sf).collect()}
    assert got == expect
    assert any(v[1] > 0 for v in expect.values())
