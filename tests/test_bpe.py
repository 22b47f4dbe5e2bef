"""BPE trainer unit tests (queries/bpe_queries.py, VERDICT_r04 item 3).

The registered queries are oracle-checked against the unrolled
MATERIALIZED-CTE SQL; these tests pin the trainer's semantics on
closed-form lexica where the expected merges are hand-computable.
"""

from __future__ import annotations

from amorphous_mapreduce_spark.queries_registry import QUERIES  # noqa: F401 — import order
from amorphous_mapreduce_spark.queries.bpe_queries import _make_kernels


def _train(words, freqs, n):
    merge_kernel, _, _ = _make_kernels(n)
    import pandas as pd

    return merge_kernel(pd.DataFrame({"word": words, "freq": freqs}))


def test_single_word_merges_left_to_right():
    out = _train(["abc"], [5], 2)
    # round 1: pairs (a,b) and (b,c) both cnt 5 -> tie-break picks (a,b)
    assert list(out.itertuples(index=False))[0][:5] == (1, "a", "b", "ab", 5)
    # round 2: only pair (ab, c)
    assert list(out.itertuples(index=False))[1][:5] == (2, "ab", "c", "abc", 5)


def test_frequency_weighting_dominates():
    # 'zz' appears 10x, 'ab' once: (z,z) wins round 1 despite 'a' < 'z'
    out = _train(["zz", "ab"], [10, 1], 1)
    assert list(out.itertuples(index=False))[0][:5] == (1, "z", "z", "zz", 10)


def test_replace_semantics_non_overlapping():
    # 'aaaa' with merge (a,a): the documented replace-scan semantics
    # (resume AFTER the replacement, delimiter consumed) merge only the
    # first pair — ' a a a a ' -> ' aa a a '. Python str.replace and
    # DuckDB replace agree byte-for-byte on this, which is the whole
    # cross-engine contract; canonical BPE would give ' aa aa '.
    _, token_kernel, _ = _make_kernels(1)
    import pandas as pd

    toks = token_kernel(pd.DataFrame({"word": ["aaaa"], "freq": [1]}))
    got = dict(zip(toks["symbol"], toks["n_tokens"]))
    assert got == {"aa": 1, "a": 2}
    assert " a a a a ".replace(" a a ", " aa ") == " aa a a "


def test_token_counts_conserve_mass():
    # after any number of merges, sum(symbol occurrences weighted) only
    # shrinks by exactly one per merge applied per occurrence; with 0
    # rounds nothing merges and counts equal character counts
    _, token_kernel, _ = _make_kernels(0)
    import pandas as pd

    toks = token_kernel(pd.DataFrame({"word": ["spark"], "freq": [3]}))
    assert toks["n_tokens"].sum() == 5 * 3
