"""ADVICE r8 (medium): the k>2 money sums (disc_price k=4, charge k=6)
exceed 2^53 integer units already at sf0.1, so their half-up rounding
must happen in INTEGER space — never on a double that has lost cent
resolution.  Pins _exact_cents_sum on BOTH engines with group sums
>2^53 units, including exact half-way rounding boundaries, against a
pure-Python Decimal half-up reference, and asserts partitioning
invariance at the same magnitudes."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as em

# Two groups, each N identical rows pushing the unit sums past 2^53,
# plus one crafted row landing that group's sum EXACTLY on a half-way
# boundary (charge % 10000 == 5000 for group A, disc % 100 == 50 for
# group B) so a double-resolution shortcut in either engine flips the
# cent.
N = 9000
C0 = 99_999_999  # cents: $999,999.99
D0, T0 = 5, 7  # discount 0.05, tax 0.07


def _charge_units(c: int) -> int:
    return c * (100 - D0) * (100 + T0)


def _disc_units(c: int) -> int:
    return c * (100 - D0)


def _craft(total: int, per_cent, m: int) -> int:
    """Cents c1 with (total + per_cent(c1)) % m == m // 2."""
    for c1 in range(1, 200_000):
        if (total + per_cent(c1)) % m == m // 2:
            return c1
    raise AssertionError("no half-way cents found")


C1_CHARGE = _craft(N * _charge_units(C0), _charge_units, 10_000)
C1_DISC = _craft(N * _disc_units(C0), _disc_units, 100)


def _pdf() -> pd.DataFrame:
    rows = [("A", c) for c in [C0] * N + [C1_CHARGE]]
    rows += [("B", c) for c in [C0] * N + [C1_DISC]]
    return pd.DataFrame(
        {
            "l_returnflag": [g for g, _ in rows],
            "l_linestatus": ["F"] * len(rows),
            "l_quantity": [1.0] * len(rows),
            "l_extendedprice": [c / 100.0 for _, c in rows],
            "l_discount": [D0 / 100.0] * len(rows),
            "l_tax": [T0 / 100.0] * len(rows),
            "l_shipdate": [pd.Timestamp("1995-01-01")] * len(rows),
        }
    )


def _expected(extra_cents: int) -> tuple[float, float]:
    """Python-Decimal half-up ground truth (dollars, 2 decimals)."""
    tc = N * _charge_units(C0) + _charge_units(extra_cents)
    td = N * _disc_units(C0) + _disc_units(extra_cents)
    # charge (k=6) is the >2^53 witness; disc (k=4) crosses 2^53 only
    # near sf1-scale row counts but exercises the same integer-space
    # rounding path, pinned here at its exact half-way boundary
    assert tc > 2**53
    q = Decimal("0.01")
    charge = (Decimal(tc) / 1_000_000).quantize(q, rounding=ROUND_HALF_UP)
    disc = (Decimal(td) / 10_000).quantize(q, rounding=ROUND_HALF_UP)
    return float(disc), float(charge)


EXPECTED = {"A": _expected(C1_CHARGE), "B": _expected(C1_DISC)}


def _check(rows) -> None:
    assert len(rows) == 2
    for r in rows:
        disc, charge = EXPECTED[r["l_returnflag"]]
        assert r["sum_disc_price"] == disc, r
        assert r["sum_charge"] == charge, r


def test_duckdb_exact_above_2_53():
    con = duckdb.connect()
    con.register("lineitem", _pdf())
    res = con.sql(em._v6_tpch_q1_sql("duckdb"))
    cols = list(res.columns)
    _check([dict(zip(cols, row)) for row in res.fetchall()])


def test_spark_exact_above_2_53_and_partitioning_invariant(spark):
    sdf = spark.createDataFrame(_pdf())
    seen = set()
    for nparts in (1, 13, 32):
        sdf.repartition(nparts).createOrReplaceTempView("lineitem")
        rows = [r.asDict() for r in spark.sql(em._v6_tpch_q1_sql("spark")).collect()]
        _check(rows)
        seen.add(
            tuple(
                sorted(
                    (r["l_returnflag"], r["sum_disc_price"], r["sum_charge"])
                    for r in rows
                )
            )
        )
    assert len(seen) == 1  # bit-identical across partitionings


@pytest.mark.parametrize("engine", ["spark", "duckdb"])
def test_exact_cents_sum_k2_passthrough(engine):
    # k=2 is plain cents: shared text, no division token
    sql = em._exact_cents_sum("round(x * 100)", 2, engine)
    assert "div" not in sql and "//" not in sql and "%" not in sql


def test_exact_cents_sum_randomized_magnitudes(spark):
    """500 seeded-random unit sums per k in {4, 6}, magnitudes 10^2 ..
    10^18 with forced half-way/near-half boundaries, evaluated as 500
    GROUPS in one query on BOTH engines against Python-Decimal half-up.
    Catches any divergence the single crafted boundary above misses."""
    import random

    import duckdb

    rng = random.Random(90210)
    vals = []
    for _ in range(460):
        mag = rng.randint(2, 18)
        vals.append(rng.randint(10 ** (mag - 1), 10**mag))
    for m, half in ((10_000, 5_000), (100, 50)):
        for _ in range(10):
            base = rng.randint(1, 10**14) * m
            vals += [base + half, base + half - 1, base + half + 1, base]
    rows = [(i, v) for i, v in enumerate(vals)]

    for k, m in ((4, 10_000), (6, 1_000_000)):
        q = Decimal("0.01")
        sql = "SELECT g, {expr} AS d FROM t GROUP BY g"
        sdf = spark.createDataFrame(rows, "g int, units long")
        sdf.createOrReplaceTempView("t")
        got_s = dict(
            spark.sql(sql.format(expr=em._exact_cents_sum("units", k, "spark")))
            .collect()
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame(rows, columns=["g", "units"]))
        got_d = dict(
            con.execute(
                sql.format(expr=em._exact_cents_sum("units", k, "duckdb"))
            ).fetchall()
        )
        bad = []
        for i, v in rows:
            dec = (Decimal(v) / m).quantize(q, rounding=ROUND_HALF_UP)
            cents = int(dec * 100)
            if cents <= 2**53:
                # inside the exactness envelope: both engines must equal
                # the ideal half-up value exactly
                if got_s.get(i) != float(dec) or got_d.get(i) != float(dec):
                    bad.append((i, v, float(dec), got_s.get(i), got_d.get(i)))
            else:
                # past 2^53 CENTS (~$90T/group) the cast-then-divide is
                # double-rounded (within 1 ulp of ideal) — the contract
                # there is cross-engine bit-equality and determinism
                if got_s.get(i) != got_d.get(i) or abs(
                    got_s.get(i) - float(dec)
                ) > abs(float(dec)) * 1e-15:
                    bad.append((i, v, float(dec), got_s.get(i), got_d.get(i)))
        assert not bad, (k, bad[:5], f"{len(bad)} mismatches")


def test_decimal_to_double_cast_agrees_past_2_53(spark):
    """The k=2 path's residual scale dependence: above 2^53 cents
    (~$90T per group) the DOUBLE output is necessarily approximate, but
    it must stay DETERMINISTIC and CROSS-ENGINE BIT-IDENTICAL — both
    engines' DECIMAL(38,0)->DOUBLE casts are correctly rounded.  Pinned
    at odd values just past 2^53, 2^54, 2^59, and a 10^18 boundary."""
    import struct

    import duckdb

    vals = [
        9007199254740993,
        9007199254740995,
        18014398509481985,
        576460752303423493,
        999999999999999999,
    ]
    con = duckdb.connect()
    for v in vals:
        expr = f"SELECT CAST(CAST({v} AS DECIMAL(38,0)) AS DOUBLE) / 100.0e0"
        dd = con.execute(expr).fetchone()[0]
        sp = spark.sql(expr).collect()[0][0]
        assert struct.pack("d", dd) == struct.pack("d", sp), v
