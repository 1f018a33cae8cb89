"""Property-based tests (hypothesis) for the pure driver-side logic.

These cover the invariants a fixed example set can't: the bracket/quote-
aware expression splitter over arbitrary well-formed inputs, band-bound
partitioning over every (bits, n_bands) shape, and the multiple-
expressions normaliser. No SparkSession — every property here is pure
Python, so hypothesis can run hundreds of examples per property.
"""

from __future__ import annotations

import warnings

from hypothesis import given, settings
from hypothesis import strategies as st

from data_validation_engine_spark.exprs import (
    parse_multiple_expressions,
    split_expressions,
)
from data_validation_engine_spark.llmops.dedup import simhash_band_bounds

# -- strategies --------------------------------------------------------------

# characters that carry no splitter semantics
_plain = st.text(
    alphabet=st.characters(
        codec="ascii",
        exclude_characters="(),[]{}'\"`\\",
        exclude_categories=("Cc",),
    ),
    min_size=1,
    max_size=8,
)


@st.composite
def balanced_atom(draw, depth=2):
    """One well-formed expression WITHOUT top-level commas: plain runs,
    quoted strings (commas inside are fine), and bracketed groups (commas
    inside are fine)."""
    parts = []
    n = draw(st.integers(min_value=1, max_value=3))
    for _ in range(n):
        kind = draw(
            st.sampled_from(
                ["plain", "quoted", "bracket"] if depth > 0 else ["plain", "quoted"]
            )
        )
        if kind == "plain":
            parts.append(draw(_plain))
        elif kind == "quoted":
            q = draw(st.sampled_from(["'", '"', "`"]))
            inner = draw(
                st.text(
                    alphabet=st.characters(
                        codec="ascii",
                        exclude_characters="'\"`\\",
                        exclude_categories=("Cc",),
                    ),
                    max_size=8,
                )
            )
            parts.append(f"{q}{inner}{q}")
        else:
            o, c = draw(st.sampled_from([("(", ")"), ("[", "]"), ("{", "}")]))
            inner_atoms = draw(
                st.lists(balanced_atom(depth=depth - 1), max_size=3)
            )
            parts.append(o + ",".join(inner_atoms) + c)
    return " ".join(parts)


# -- split_expressions -------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.lists(balanced_atom(), min_size=1, max_size=5))
def test_split_roundtrips_balanced_atoms(atoms):
    """Joining well-formed comma-free atoms with ',' and splitting gives
    the atoms back (stripped, empties dropped) — commas inside brackets
    and quotes never split, top-level commas always do."""
    joined = ",".join(atoms)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # well-formed input must not warn
        got = split_expressions(joined)
    want = [a.strip() for a in atoms if a.strip()]
    assert got == want


@settings(max_examples=300, deadline=None)
@given(balanced_atom())
def test_split_single_atom_is_identity(atom):
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = split_expressions(atom)
    assert got == ([atom.strip()] if atom.strip() else [])


@settings(max_examples=300, deadline=None)
@given(st.lists(balanced_atom(), min_size=1, max_size=4))
def test_split_parts_are_balanced(atoms):
    """Every emitted part has balanced brackets and closed quotes."""
    for part in split_expressions(",".join(atoms)):
        stack = []
        quote = None
        escaped = False
        opens = {"(": ")", "[": "]", "{": "}"}
        closes = {v: k for k, v in opens.items()}
        for ch in part:
            if escaped:
                escaped = False
                continue
            if ch == "\\":
                escaped = True
            elif quote:
                if ch == quote:
                    quote = None
            elif ch in "'\"`":
                quote = ch
            elif ch in opens:
                stack.append(ch)
            elif ch in closes and stack and stack[-1] == closes[ch]:
                stack.pop()
        assert not stack and quote is None and not escaped


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="(),'x ", max_size=30))
def test_split_never_crashes_and_preserves_content(text):
    """Arbitrary junk (possibly unbalanced): the splitter warns instead of
    raising, and never LOSES non-comma content — the concatenation of the
    parts equals the input minus split commas and whitespace."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        parts = split_expressions(text)
    squash = lambda s: s.replace(",", "").replace(" ", "")
    assert squash("".join(parts)) == squash(text)


# -- parse_multiple_expressions ----------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        _plain,
        st.one_of(_plain, st.lists(_plain, min_size=1, max_size=3)),
        min_size=1,
        max_size=4,
    )
)
def test_parse_dict_bakes_aliases(mapping):
    rendered = parse_multiple_expressions(mapping)
    assert len(rendered) == len(mapping)
    for (expr, alias), out in zip(mapping.items(), rendered):
        assert out.startswith(f"{expr} AS ")
        if isinstance(alias, list):
            assert out == f"{expr} AS ({', '.join(alias)})"
        else:
            assert out == f"{expr} AS {alias}"


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(_plain, st.just(""), st.just("  ")), max_size=6))
def test_parse_list_strips_and_drops_empties(items):
    got = parse_multiple_expressions(items)
    assert got == [e.strip() for e in items if e and e.strip()]


# -- simhash band bounds -----------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=1, max_value=512),
    st.integers(min_value=1, max_value=64),
)
def test_band_bounds_partition_exactly(bits, n_bands):
    """Bands tile [1, bits] contiguously: total width == bits, no gaps or
    overlaps, widths differ by at most one and never exceed ceil."""
    bounds = simhash_band_bounds(bits, n_bands)
    assert len(bounds) == n_bands
    pos = 1
    widths = []
    for start, width in bounds:
        assert start == pos
        assert width >= 0
        widths.append(width)
        pos = start + width
    assert pos == bits + 1
    nonzero = [w for w in widths if w]
    if nonzero:
        assert max(nonzero) - min(nonzero) <= 1


# -- interval-join anchor-bucket math ---------------------------------------
# Pure-Python mirror of llmops/interval.py's bucketized formulation: a pair
# is emitted iff the two intervals share the bucket containing
# floor(max(starts)/w) AND the exact overlap predicate holds. The property
# pins, over arbitrary intervals and widths, that this equals the naive
# predicate with each pair emitted EXACTLY once (anchor dedup).


def _bucketized_pairs(lefts, rights, width):
    import math

    def buckets(s, e):
        lo, hi = math.floor(s / width), math.floor(e / width)
        step = 1 if hi >= lo else -1
        return set(range(lo, hi + step, step))

    out = []
    for li, (ls, le) in enumerate(lefts):
        lb = buckets(ls, le)
        for ri, (rs, re_) in enumerate(rights):
            for b in lb & buckets(rs, re_):
                if (
                    ls <= re_
                    and rs <= le
                    and b == math.floor(max(ls, rs) / width)
                ):
                    out.append((li, ri))
    return out


_interval = st.tuples(
    st.floats(-1e5, 1e5, allow_nan=False, allow_infinity=False),
    st.floats(0, 500, allow_nan=False, allow_infinity=False),
).map(lambda t: (t[0], t[0] + t[1]))


@given(
    st.lists(_interval, max_size=12),
    st.lists(_interval, max_size=12),
    st.floats(0.5, 1000, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_interval_anchor_bucket_equals_naive_exactly_once(
    lefts, rights, width
):
    got = _bucketized_pairs(lefts, rights, width)
    naive = [
        (li, ri)
        for li, (ls, le) in enumerate(lefts)
        for ri, (rs, re_) in enumerate(rights)
        if ls <= re_ and rs <= le
    ]
    assert sorted(got) == sorted(naive)  # complete AND duplicate-free


# -- fuzzy-linkage length-bucket completeness (llmops/linkage.py) -----------


@settings(max_examples=500, deadline=None)
@given(
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=0, max_value=8),
    st.integers(min_value=1, max_value=16),
)
def test_fuzzy_length_bucket_covers_all_close_pairs(ll, rl, d, w):
    """The anchor-bucket lemma behind fuzzy_string_join's hot-block
    decomposition: whenever two strings are within edit distance d their
    lengths differ by at most d, and the left row's single bucket
    floor(ll/w) must fall inside the right row's replicated range
    floor((rl-d)/w) .. floor((rl+d)/w) — zero pair loss for ANY (d, w)."""
    if abs(ll - rl) <= d:
        assert (rl - d) // w <= ll // w <= (rl + d) // w


@settings(max_examples=500, deadline=None)
@given(
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=0, max_value=8),
    st.integers(min_value=1, max_value=16),
)
def test_fuzzy_length_bucket_replication_is_bounded(rl, d, w):
    """The replication factor is (range width)/w + 1 <= 2d/w + 2 — the
    cost of exactness stays O(d/w) copies per register row, never data-
    dependent."""
    n_copies = (rl + d) // w - (rl - d) // w + 1
    assert 1 <= n_copies <= 2 * d // w + 2


# -- BM25 idf positivity (llmops/text.py) -----------------------------------


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=10**9))
def test_bm25_idf_positive_for_any_df(n):
    """The +1-smoothed Okapi idf ln(1 + (n-df+0.5)/(df+0.5)) is strictly
    positive for every df in [1, n] — scores can never flip sign on
    ubiquitous terms (the classic negative-idf BM25 pitfall)."""
    import math

    for df in {1, n // 2 or 1, n}:
        assert math.log(1.0 + (n - df + 0.5) / (df + 0.5)) > 0


# -- KMV sketch formula (llmops/sketch.py) ----------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.sets(
        st.text(alphabet="abcdef0123456789", min_size=1, max_size=8),
        min_size=1,
        max_size=120,
    ),
    st.integers(min_value=2, max_value=64),
)
def test_kmv_exact_below_k_and_estimate_bounds(values, k):
    """Pure-python mirror of the sketch: below saturation the sketch IS
    the exact distinct count; at saturation the estimate is positive and
    the k-th hash is a real member of the hash set."""
    import hashlib

    hs = sorted(
        int(hashlib.md5(v.encode()).hexdigest()[:15], 16) for v in values
    )
    if len(hs) < k:
        assert float(len(hs)) == float(len(values))
    else:
        kth = hs[k - 1]
        est = (k - 1) * float(1 << 60) / kth
        assert est > 0 and kth in hs
