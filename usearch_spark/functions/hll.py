"""Portable HyperLogLog building blocks: md5-derived registers and an
estimator whose SQL text evaluates identically on Spark SQL and DuckDB.

Two consumers share these:
  * plans/graph_stats.hyperball_harmonic — HLL-counter BFS (ball sizes);
  * operators/sketch.hll_sketch — mergeable distinct-count sketches.

Why portable-by-construction (this is what makes the hash gate possible):
  * register index and rank derive from md5 hex text — no engine RNG, no
    platform hash;
  * the HLL sum Σ 2^(−M_j) is carried as the exact INTEGER Σ 2^(58−M_j)
    (empty registers contribute 2^58), so no float-summation-order
    dependence exists anywhere;
  * the estimate is ONE double division, and the linear-counting
    small-range branch uses PRECOMPUTED ln constants (V has only 15
    possible values) — no engine log() whose ulp behavior could differ.
"""

from __future__ import annotations

HLL_M = 16  # registers per counter (b = 4 index bits)
HLL_RHO_CAP = 57  # 14 hex chars = 56 rank bits; 57 = "all zero" sentinel
HLL_SHIFT = 58  # scaled S uses 2^(58 - rho): 16 * 2^58 = 2^62 < int64 max
# alpha_16 * m^2 * 2^58 — the whole estimator collapses to ONE double
# division alpha_c / S_scaled, with S_scaled an exact integer
HLL_ALPHA_C = 0.673 * (HLL_M * HLL_M) * float(1 << HLL_SHIFT)


def hll_estimate_sql() -> str:
    """Estimator SQL over an aggregated row exposing ``s_present``
    (Σ 2^(58−rho) of the present registers, exact integer) and ``nreg``
    (count of present registers): raw = alpha_c / S_scaled; when
    raw <= 2.5m and empty registers exist, the standard linear-counting
    small-range correction m·ln(m/V) applies — V only takes values
    1..15, so the ln() values are PRECOMPUTED Python doubles baked into
    a CASE lookup (no engine log() whose ulp behavior could differ).
    Identical text runs on Spark SQL and DuckDB."""
    import math

    full = 1 << HLL_SHIFT
    raw = (
        f"{HLL_ALPHA_C!r} / CAST(s_present + ({HLL_M} - nreg) * "
        f"CAST({full} AS BIGINT) AS DOUBLE)"
    )
    lut = " ".join(
        f"WHEN {v} THEN {HLL_M * math.log(HLL_M / v)!r}" for v in range(1, HLL_M)
    )
    return (
        f"CASE WHEN {raw} <= {2.5 * HLL_M!r} AND nreg < {HLL_M} "
        f"THEN (CASE ({HLL_M} - nreg) {lut} END) ELSE {raw} END"
    )


def hll_reg_sql(col: str) -> str:
    """Register index 0..15 from the first md5 hex digit — identical SQL
    text evaluates in Spark SQL and DuckDB (instr is 1-based in both)."""
    return f"instr('0123456789abcdef', substring(md5({col}), 1, 1)) - 1"


def hll_rho_sql(col: str) -> str:
    """HLL rank rho = leading zero BITS of the next 14 hex chars (56
    bits) + 1, capped at HLL_RHO_CAP: hex-char leading zeros count 4
    bits each, the first non-zero hex digit contributes its own leading
    zeros (1->3, 2-3->2, 4-7->1, 8-f->0).  Identical text runs on both
    engines (TRIM(LEADING...) is standard SQL)."""
    z = f"substring(md5({col}), 2, 14)"
    t = f"trim(LEADING '0' FROM {z})"
    c = f"substring({t}, 1, 1)"
    return (
        f"CASE WHEN {t} = '' THEN {HLL_RHO_CAP} ELSE "
        f"4 * (14 - length({t})) + "
        f"(CASE WHEN {c} = '1' THEN 3 WHEN {c} IN ('2','3') THEN 2 "
        f"WHEN {c} IN ('4','5','6','7') THEN 1 ELSE 0 END) + 1 END"
    )
