"""Property-based oracle fuzzing (VERDICT r6 item 8).

Fixed registry queries pin the conventions they happen to use; this
fuzzer guards the CONVENTIONS THEMSELVES. A seeded generator emits
random filter / group / aggregate / join specs over the fixture
schema; each spec is compiled twice — once to a PySpark DataFrame
program, once to the equivalent DuckDB SQL — and the two results go
through the driver-strict comparator (sorted columns, canonical row
multiset, dtype-sensitive). Any drift in the shared determinism
conventions (DECIMAL accumulation before DOUBLE cast, round-6,
HUGEINT-vs-BIGINT widening, date literal semantics, join duplicate
handling) fails some generated spec even though no fixed query
exercises that exact combination.

The generator is deliberately self-contained and seeded: the same 50
specs run every time, so a red spec is reproducible by index; bump
SEED to re-roll the space after auditing a batch.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

import pytest
from pyspark.sql import DataFrame, functions as F

from bqfetch_spark.catalog import load_catalog
from tests.conftest import SF_CORRECT, compare_to_oracle

SEED = 20260815
N_SPECS = 50

# --- schema menus (base relation -> joinable dims, filterable and
# groupable columns with fixed literal pools) -------------------------------

JOINS = {
    "lineitem": [("orders", "l_orderkey", "o_orderkey"), ("part", "l_partkey", "p_partkey")],
    "orders": [("customer", "o_custkey", "c_custkey")],
}

# numeric filter columns -> (relation, literal pool); ops <, >=
NUM_FILTERS = {
    "l_quantity": ("lineitem", [10.0, 25.0, 40.0]),
    "l_discount": ("lineitem", [0.03, 0.05, 0.07]),
    "l_extendedprice": ("lineitem", [20000.0, 45000.0]),
    "o_totalprice": ("orders", [100000.0, 250000.0]),
    "p_size": ("part", [10, 25, 40]),
    "c_acctbal": ("customer", [0.0, 5000.0]),
    "value": ("events", [5.0, 50.0]),
}

# categorical filter columns -> (relation, value pool); ops =, IN
CAT_FILTERS = {
    "l_returnflag": ("lineitem", ["A", "N", "R"]),
    "l_linestatus": ("lineitem", ["F", "O"]),
    "o_orderstatus": ("orders", ["F", "O", "P"]),
    "o_orderpriority": ("orders", ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]),
    "c_mktsegment": ("customer", ["AUTOMOBILE", "BUILDING", "MACHINERY"]),
    "p_brand": ("part", ["Brand#10", "Brand#13", "Brand#21"]),
    "event_type": ("events", ["click", "purchase", "view", "error"]),
}

DATE_FILTERS = {
    "l_shipdate": ("lineitem", ["1996-01-01", "1997-06-01", "1998-06-01"]),
    "o_orderdate": ("orders", ["1996-01-01", "1997-06-01"]),
}

GROUP_COLS = {
    "lineitem": ["l_returnflag", "l_linestatus", "l_linenumber"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "customer": ["c_mktsegment", "c_nationkey"],
    "part": ["p_brand", "p_size"],
    "events": ["event_type"],
}

# derived group keys: alias -> (relation, spark builder, sql expr)
DERIVED_GROUPS = {
    "ship_year": ("lineitem", lambda: F.year("l_shipdate"), "CAST(year(l_shipdate) AS BIGINT)"),
    "order_month": ("orders", lambda: F.month("o_orderdate"), "CAST(month(o_orderdate) AS BIGINT)"),
}

DOUBLE_AGG_COLS = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount"],
    "orders": ["o_totalprice"],
    "customer": ["c_acctbal"],
    "part": ["p_retailprice"],
    "events": ["value"],
}

INT_AGG_COLS = {"part": ["p_size"], "lineitem": ["l_linenumber"]}


@dataclass(frozen=True)
class Spec:
    base: str
    join: tuple[str, str, str] | None  # (dim, left_key, right_key)
    num_filters: tuple[tuple[str, str, float], ...]  # (col, op, lit)
    cat_filters: tuple[tuple[str, tuple[str, ...]], ...]  # (col, in-values)
    date_filters: tuple[tuple[str, str, str], ...]  # (col, op, iso-date)
    group_cols: tuple[str, ...]  # plain column names
    derived_group: str | None  # DERIVED_GROUPS alias
    aggs: tuple[tuple[str, str], ...]  # (fn, col) — fn in sum/avg/min/max/isum
    # count(*) is always included so empty-group semantics are covered


def _relations(spec: Spec) -> list[str]:
    rels = [spec.base]
    if spec.join:
        rels.append(spec.join[0])
    return rels


def gen_spec(rng: random.Random) -> Spec:
    base = rng.choice(["lineitem", "orders", "events", "customer", "part"])
    join = None
    if base in JOINS and rng.random() < 0.5:
        dim, lk, rk = rng.choice(JOINS[base])
        join = (dim, lk, rk)
    rels = [base] + ([join[0]] if join else [])

    def in_scope(menu):
        return [c for c, (rel, _pool) in menu.items() if rel in rels]

    num_filters = []
    for col in in_scope(NUM_FILTERS):
        if rng.random() < 0.35:
            _rel, pool = NUM_FILTERS[col]
            num_filters.append((col, rng.choice(["<", ">="]), rng.choice(pool)))
    cat_filters = []
    for col in in_scope(CAT_FILTERS):
        if rng.random() < 0.3:
            _rel, pool = CAT_FILTERS[col]
            k = rng.randint(1, min(3, len(pool)))
            cat_filters.append((col, tuple(sorted(rng.sample(pool, k)))))
    date_filters = []
    for col in in_scope(DATE_FILTERS):
        if rng.random() < 0.3:
            _rel, pool = DATE_FILTERS[col]
            date_filters.append((col, rng.choice(["<", ">="]), rng.choice(pool)))

    group_pool = [c for rel in rels for c in GROUP_COLS.get(rel, [])]
    n_groups = rng.choice([0, 1, 1, 2])  # bias toward grouped shapes
    group_cols = tuple(sorted(rng.sample(group_pool, min(n_groups, len(group_pool)))))
    derived_pool = [a for a, (rel, _b, _s) in DERIVED_GROUPS.items() if rel in rels]
    derived = (
        rng.choice(derived_pool) if derived_pool and rng.random() < 0.25 else None
    )

    agg_pool = [
        ("d", c) for rel in rels for c in DOUBLE_AGG_COLS.get(rel, [])
    ] + [("i", c) for rel in rels for c in INT_AGG_COLS.get(rel, [])]
    aggs = []
    for kind, col in rng.sample(agg_pool, min(rng.randint(1, 3), len(agg_pool))):
        fn = rng.choice(["sum", "avg", "min", "max"] if kind == "d" else ["isum", "min", "max"])
        if (fn, col) not in aggs:
            aggs.append((fn, col))
    return Spec(
        base=base,
        join=join,
        num_filters=tuple(num_filters),
        cat_filters=tuple(cat_filters),
        date_filters=tuple(date_filters),
        group_cols=group_cols,
        derived_group=derived,
        aggs=tuple(aggs),
    )


# --- compile: spec -> Spark DataFrame --------------------------------------


def to_spark(spec: Spec, spark, sf_dir: str) -> DataFrame:
    cat = load_catalog(spark, sf_dir)
    df = cat.table(spec.base)
    if spec.join:
        dim, lk, rk = spec.join
        df = df.join(F.broadcast(cat.table(dim)), F.col(lk) == F.col(rk))
    for col, op, lit in spec.num_filters:
        df = df.filter(F.col(col) < lit if op == "<" else F.col(col) >= lit)
    for col, values in spec.cat_filters:
        df = df.filter(F.col(col).isin(*values))
    for col, op, lit in spec.date_filters:
        ts = F.lit(lit).cast("timestamp")
        df = df.filter(F.col(col) < ts if op == "<" else F.col(col) >= ts)

    keys = [F.col(c) for c in spec.group_cols]
    if spec.derived_group:
        _rel, builder, _sql = DERIVED_GROUPS[spec.derived_group]
        keys.append(builder().cast("long").alias(spec.derived_group))

    aggs = [F.count(F.lit(1)).alias("cnt")]
    for fn, col in spec.aggs:
        dec = F.sum(F.col(col).cast("decimal(38,6)"))
        if fn == "sum":
            aggs.append(F.round(dec.cast("double"), 6).alias(f"sum_{col}"))
        elif fn == "avg":
            aggs.append(
                F.round(dec.cast("double") / F.count(F.col(col)), 6).alias(f"avg_{col}")
            )
        elif fn == "isum":
            aggs.append(F.sum(F.col(col)).cast("long").alias(f"sum_{col}"))
        elif fn == "min":
            aggs.append(F.min(col).alias(f"min_{col}"))
        else:
            aggs.append(F.max(col).alias(f"max_{col}"))
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


# --- compile: spec -> DuckDB SQL -------------------------------------------


def to_sql(spec: Spec) -> str:
    from_clause = spec.base
    if spec.join:
        dim, lk, rk = spec.join
        from_clause = f"{spec.base} JOIN {dim} ON {lk} = {rk}"
    preds = []
    for col, op, lit in spec.num_filters:
        preds.append(f"{col} {op} {lit!r}" if isinstance(lit, str) else f"{col} {op} {lit}")
    for col, values in spec.cat_filters:
        inlist = ", ".join(f"'{v}'" for v in values)
        preds.append(f"{col} IN ({inlist})")
    for col, op, lit in spec.date_filters:
        preds.append(f"{col} {op} TIMESTAMP '{lit}'")
    where = f" WHERE {' AND '.join(preds)}" if preds else ""

    keys = list(spec.group_cols)
    key_exprs = list(spec.group_cols)
    if spec.derived_group:
        _rel, _b, sql_expr = DERIVED_GROUPS[spec.derived_group]
        keys.append(spec.derived_group)
        key_exprs.append(f"{sql_expr} AS {spec.derived_group}")

    sel = key_exprs + ["CAST(count(*) AS BIGINT) AS cnt"]
    for fn, col in spec.aggs:
        dec = f"sum(CAST({col} AS DECIMAL(38,6)))"
        if fn == "sum":
            sel.append(f"round(CAST({dec} AS DOUBLE), 6) AS sum_{col}")
        elif fn == "avg":
            sel.append(f"round(CAST({dec} AS DOUBLE) / count({col}), 6) AS avg_{col}")
        elif fn == "isum":
            sel.append(f"CAST(sum({col}) AS BIGINT) AS sum_{col}")
        elif fn == "min":
            sel.append(f"min({col}) AS min_{col}")
        else:
            sel.append(f"max({col}) AS max_{col}")
    sql = f"SELECT {', '.join(sel)} FROM {from_clause}{where}"
    if keys:
        # group by the positional key list so the derived expression
        # groups identically in both engines
        sql += f" GROUP BY {', '.join(str(i + 1) for i in range(len(keys)))}"
    return sql


RNG = random.Random(SEED)
SPECS = [gen_spec(RNG) for _ in range(N_SPECS)]


@pytest.mark.parametrize("idx", range(N_SPECS))
def test_fuzzed_spec_matches_oracle(spark, duck, idx):
    spec = SPECS[idx]
    df = to_spark(spec, spark, SF_CORRECT)
    compare_to_oracle(df, duck, to_sql(spec))


def test_fuzz_space_covers_shapes():
    """The seeded batch must actually exercise the interesting shapes —
    a degenerate generator (all no-filter global counts) would pass
    parity vacuously."""
    assert sum(1 for s in SPECS if s.join) >= 5
    assert sum(1 for s in SPECS if s.group_cols or s.derived_group) >= 20
    assert sum(1 for s in SPECS if s.num_filters or s.cat_filters or s.date_filters) >= 25
    assert sum(1 for s in SPECS if s.derived_group) >= 3
    assert sum(1 for s in SPECS if any(fn == "avg" for fn, _ in s.aggs)) >= 8
