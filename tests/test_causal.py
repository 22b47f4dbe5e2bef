"""Causal/experimentation battery invariants (queries/causal_queries.py).

Oracle equivalence is covered by tools/check_oracles.py; these assert
the STATISTICAL invariants a hash-match alone can't see."""

from __future__ import annotations

import math

# import via the registry: importing a query module directly can hit
# the circular dedup_queries<->registry chain depending on test order
from amorphous_mapreduce_spark.queries_registry import QUERIES


def test_srm_chi2_nonnegative_and_counts_sum(spark, sf_dir):
    rows = QUERIES["sample_ratio_mismatch"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["chi2"] >= 0.0
        arms = sum(x for x in (r["n0"], r["n1"], r["n2"], r["n3"]) if x)
        assert arms == r["n"]
        # hash assignment of a null A/A split should rarely trip 95%;
        # assert the monitor isn't flagging everything
    flagged = sum(1 for r in rows if r["srm_flag"])
    assert flagged <= max(2, len(rows) // 4)


def test_cem_matched_subset_of_total(spark, sf_dir):
    r = QUERIES["cem_matched_effect"](spark, sf_dir).collect()[0]
    assert 0 < r["n_strata_matched"] <= r["n_strata_total"]
    assert r["nt_matched"] > 0 and r["nc_matched"] > 0
    # ATT equals its integer numerator over treated mass
    assert math.isclose(
        r["att_cents"], r["att_num_cents"] / r["nt_matched"], rel_tol=1e-12
    )


def test_synthetic_control_identity(spark, sf_dir):
    r = QUERIES["synthetic_control_gap"](spark, sf_dir).collect()[0]
    assert r["donor"] is not None and r["donor"] != "BUILDING"
    assert r["gap_cents"] == r["treated_post_cents"] - r["synth_post_cents"]
    assert r["sse_pre"] >= 0
    # the 2^-20 affine scale should be near 1 for same-sized segments
    assert 0.1 < r["b_q"] / 1048576.0 < 10.0


def test_mde_formula_against_python(spark, sf_dir):
    rows = QUERIES["mde_segment_table"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        expect = (1.959963984540054 + 0.8416212335729143) * math.sqrt(
            2.0 * r["var_cents"] / (r["n"] / 2.0)
        )
        assert math.isclose(r["mde_cents"], expect, rel_tol=1e-12)
        assert r["mde_rel"] > 0


def test_fdr_pvalues_and_bh_cutoff(spark, sf_dir):
    rows = QUERIES["fdr_bh_discoveries"](spark, sf_dir).collect()
    assert rows and rows[0]["m"] == len(rows)
    # p within (0, 1.01] (the AS approximation can graze just above 1
    # for z ~ 0) and monotone non-increasing in z2 ordering by rank
    ps = [r["p"] for r in sorted(rows, key=lambda r: r["r"])]
    assert all(0.0 < p <= 1.01 for p in ps)
    assert ps == sorted(ps)
    # BH discovery set is a prefix of the p-ranking
    disc = [r["discovered"] for r in sorted(rows, key=lambda r: r["r"])]
    if any(disc):
        last_true = max(i for i, d in enumerate(disc) if d)
        assert all(disc[: last_true + 1])
    # A/A null at alpha=0.10 over 25 tests: expect few or no discoveries
    assert sum(disc) <= 5

    # cross-check one p-value against a scipy-free reference: the same
    # AS 7.1.26 formula in pure python (exp2 LUT truncation included)
    from amorphous_mapreduce_spark.functions.intexp import EXP2_LUT

    r0 = rows[0]
    z2 = r0["z2"]
    s_exp = max(-66060288, math.floor(-z2 / 1.3862943611198906 * 1048576))
    sp = s_exp + 64 * 1048576
    k, idx = sp // 1048576, (sp % 1048576) // 4096
    phi = EXP2_LUT[idx] * 2.0 ** (k - 84)
    tt = 1.0 / (1.0 + 0.2316419 * math.sqrt(z2))
    poly = (
        (((1.330274429 * tt - 1.821255978) * tt + 1.781477937) * tt
         - 0.356563782) * tt + 0.319381530
    ) * tt
    expect_p = 2.0 * (0.3989422804014327 * phi) * poly
    assert math.isclose(r0["p"], expect_p, rel_tol=1e-12)
