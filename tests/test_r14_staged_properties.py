"""Property-based tests (hypothesis) for the round-14 staged
operators' core ALGORITHMS — pure-python, engine-free, they pin the
algebra the oracle hash can only witness on the fixture's inputs:

- flashtext doubled-space replace: on ANY token sequence the chain
  finds exactly the non-overlapping, priority-ordered phrase
  occurrences a reference scanner finds, never corrupts neighboring
  tokens, and the length-delta count algebra is exact.
- harmonic size-class packing: on ANY length multiset, no
  non-oversize bin overflows, bins per class = ceil(n/k), and the
  oversize (len > capacity) routing puts each such doc alone in a
  class-1 bin.
- Poisson-bootstrap thresholds: the md5-CDF multiplicity is a total
  function into {0..4} and its distribution over many draws matches
  the CDF constants (a sanity band, not an exact pin).
"""

import hashlib
import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from market_pulse_data_pipeline_spark.queries.r25_staging import (
    _FT_PHRASES,
    _HP_CAP,
    _ft_pat,
    _ft_rep,
)
from market_pulse_data_pipeline_spark.queries.r26_staging import (
    _BS_SCALE,
    _BS_T0,
    _BS_T1,
    _BS_T2,
    _BS_T3,
)

# token alphabet: the phrase vocabulary plus fillers, so phrases occur
# often under random composition
_TOKENS = ["merge", "part", "window", "table", "scan", "hash", "join",
           "sort", "x", "y"]
TOKSEQ = st.lists(st.sampled_from(_TOKENS), min_size=0, max_size=24)


def _ft_chain(text: str):
    """The shipping algorithm, replayed in python."""
    s = " " + text.replace(" ", "  ") + " "
    counts = []
    for i, p in enumerate(_FT_PHRASES):
        pat, rep = _ft_pat(p), _ft_rep(i)
        before = len(s)
        s = s.replace(pat, rep)
        counts.append((before - len(s)) // (len(pat) - len(rep)))
    out = " ".join(tok for tok in s.split(" ") if tok)
    return counts, out


def _reference_scanner(tokens):
    """Priority-ordered, left-to-right, non-overlapping token-aligned
    phrase matcher — the semantics the doubled-space chain claims."""
    out = list(tokens)
    taken = [False] * len(tokens)
    counts = [0] * len(_FT_PHRASES)
    for i, p in enumerate(_FT_PHRASES):
        ptoks = p.split(" ")
        j = 0
        while j + len(ptoks) <= len(tokens):
            window = tokens[j : j + len(ptoks)]
            if window == ptoks and not any(taken[j : j + len(ptoks)]):
                for k in range(j, j + len(ptoks)):
                    taken[k] = True
                out[j] = f"__E{i}__"
                for k in range(j + 1, j + len(ptoks)):
                    out[k] = None
                counts[i] += 1
                j += len(ptoks)
            else:
                j += 1
    return counts, " ".join(t for t in out if t is not None)


@settings(max_examples=300, deadline=None)
@given(toks=TOKSEQ)
def test_flashtext_chain_equals_reference_scanner(toks):
    text = " ".join(toks)
    if not toks:
        # empty text splits to [''] in the engines; skip the
        # degenerate composition (the fixture has no empty docs and
        # the chain's contract is over token sequences)
        return
    counts, out = _ft_chain(text)
    ref_counts, ref_out = _reference_scanner(toks)
    assert counts == ref_counts
    assert out == ref_out


@settings(max_examples=300, deadline=None)
@given(
    lens=st.lists(
        st.integers(min_value=1, max_value=2 * _HP_CAP),
        min_size=1,
        max_size=60,
    )
)
def test_harmonic_packing_invariants(lens):
    # the shipping rule: k = max(CAP div len, 1); rank by len desc;
    # bin = rank0 div k
    by_class: dict = {}
    for idx, n in enumerate(lens):
        k = max(_HP_CAP // n, 1)
        by_class.setdefault(k, []).append((n, idx))
    for k, items in by_class.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        bins: dict = {}
        for rank0, (n, _) in enumerate(items):
            bins.setdefault(rank0 // k, []).append(n)
        # bins per class is optimal within the class
        assert len(bins) == math.ceil(len(items) / k)
        for members in bins.values():
            assert len(members) <= k
            if all(m <= _HP_CAP for m in members):
                # the harmonic no-overflow theorem: every member of
                # class k satisfies CAP div m == k, hence m <= CAP
                # div k, so k of them sum to at most CAP
                assert sum(members) <= _HP_CAP
            else:
                # oversize docs are ALONE in class-1 bins (negative
                # slack records the truncation debt)
                assert k == 1 and len(members) == 1


@settings(max_examples=50, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10**6))
def test_bootstrap_multiplicity_total_and_calibrated(seed):
    def mult(doc_id, r):
        u = int(
            hashlib.md5(f"{doc_id}#{r}".encode()).hexdigest()[:15], 16
        ) % _BS_SCALE
        if u < _BS_T0:
            return 0
        if u < _BS_T1:
            return 1
        if u < _BS_T2:
            return 2
        if u < _BS_T3:
            return 3
        return 4

    draws = Counter(mult(seed + i, i % 7) for i in range(400))
    assert set(draws) <= {0, 1, 2, 3, 4}
    # loose calibration band: P(0) and P(1) are each ~0.368 — over
    # 400 hash-uniform draws the observed counts stay in a wide band
    # (this is a sanity property, not a statistical test)
    assert 90 <= draws[0] <= 210
    assert 90 <= draws[1] <= 210
