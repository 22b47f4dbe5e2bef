"""Pure-Python invariants for the round-7 second-sitting additions —
no SparkSession needed, so these run in milliseconds and pin the
literal tables / packing contracts the oracles share with the engine.

NOTE: query modules must be imported via queries_registry (the
circular-import convention, CLAUDE.md).
"""

from __future__ import annotations

import math

from amorphous_mapreduce_spark import queries_registry as QR
from amorphous_mapreduce_spark.queries import ulm_queries
from amorphous_mapreduce_spark.queries import eval_queries


def test_ulm_composition_counts_are_tribonacci():
    """#compositions of L into parts <= 3 is the tribonacci sequence —
    if the generator drops or duplicates a segmentation, the Viterbi
    argmin domain (and the oracle VALUES table) silently shrinks."""
    trib = {1: 1, 2: 2, 3: 4, 4: 7, 5: 13, 6: 24, 7: 44, 8: 81}
    by_len: dict[int, set] = {}
    for wl, sid, np_, k, st, ln in ulm_queries._COMP:
        by_len.setdefault(wl, set()).add(sid)
    assert {wl: len(s) for wl, s in by_len.items()} == trib


def test_ulm_composition_pieces_tile_each_word():
    """Every segmentation's pieces are contiguous, 1-based, cover
    [1, L] exactly, and no piece exceeds _MAXP."""
    segs: dict[tuple, list] = {}
    for wl, sid, np_, k, st, ln in ulm_queries._COMP:
        segs.setdefault((wl, sid, np_), []).append((k, st, ln))
    for (wl, sid, np_), pieces in segs.items():
        pieces.sort()
        assert len(pieces) == np_
        pos = 1
        for k, st, ln in pieces:
            assert st == pos and 1 <= ln <= ulm_queries._MAXP
            pos += ln
        assert pos == wl + 1


def test_ulm_pack_roundtrip():
    """pack = total*8192 + np*512 + sid must decode uniquely for every
    (np, sid) the composition table can produce (sid <= 80 < 512)."""
    for wl, sid, np_, k, st, ln in ulm_queries._COMP:
        assert 0 <= sid < 512 and 1 <= np_ <= 8
        for total in (0, 1, 10**11 * 8):
            pack = total * 8192 + np_ * 512 + sid
            assert pack % 512 == sid
            assert (pack % 8192) // 512 == np_


def test_pass_at_k_luts_match_comb():
    for k, lut in eval_queries._PAK_LUT.items():
        assert lut == [math.comb(10 - c, k) for c in range(11)]
        assert eval_queries._PAK_DENOM[k] == math.comb(10, k)


def test_new_queries_registered_with_oracles():
    new = [
        "media_wav_roundtrip",
        "span_corruption_manifest",
        "fleiss_kappa",
        "dpo_pair_manifest",
        "matryoshka_recall",
        "mixture_temperature_sweep",
        "unigram_lm_tokenizer",
        "shard_mixing_audit",
        "harmonic_centrality",
        "iv_wald_estimate",
        "moe_routing_audit",
        "pass_at_k_estimate",
        "seasonal_esd_outliers",
    ]
    for name in new:
        assert name in QR.QUERIES and name in QR.ORACLES
        # every oracle here is MATERIALIZED-safe plain SQL: must at
        # least mention its output ORDER or a SELECT
        assert "SELECT" in QR.ORACLES[name]


def test_harmonic_oracle_caps_expansion():
    """The scale contract: ring expansion must walk the capped
    adjacency (rk <= 16), and the cap hash must be the portable md5
    form — the uncapped exact rings DNF'd the sf10 rung."""
    sql = QR.ORACLES["harmonic_centrality"]
    assert "rk <= 16" in sql
    assert "hccap:" in sql
    # both expansion joins must read adjc, never raw d1
    assert sql.count("JOIN adjc") == 2
