"""functions/detmath.py — the cross-engine deterministic eigensolver
under the PCA-family oracles. These tests pin the module's central
contract DIRECTLY (no Spark session needed): the Python spelling and
the DuckDB WITH-RECURSIVE spelling produce BIT-IDENTICAL results, and
the decomposition is numerically a real eigendecomposition."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from bqfetch_spark.functions.detmath import (
    jacobi_eigh_flat,
    jacobi_sql_ctes,
    pin_sign,
    rr_schedule,
    top_components,
    whitening_flat,
)

DIM = 64


def _spd_matrix(seed: int) -> list[float]:
    b = np.random.RandomState(seed).randn(DIM, DIM)
    c = (b @ b.T) / DIM
    return [float(c[i, j]) for i in range(DIM) for j in range(DIM)]


def _sql_eigh(a_flat):
    alit = "[" + ",".join(f"'{x!r}'::DOUBLE" for x in a_flat) + "]"
    q = (
        "WITH RECURSIVE a0(a) AS MATERIALIZED (SELECT "
        + alit
        + "),\n"
        + jacobi_sql_ctes("a0", DIM)
        + "\nSELECT lam, vm FROM jfin"
    )
    lam, vm = duckdb.connect().execute(q).fetchone()
    return [float(x) for x in lam], [float(x) for x in vm]


def test_python_and_sql_spellings_are_bit_identical():
    a = _spd_matrix(7)
    lam_py, v_py = jacobi_eigh_flat(a, DIM)
    lam_db, v_db = _sql_eigh(a)
    assert all(x == y for x, y in zip(lam_py, lam_db))  # exact, not approx
    assert all(x == y for x, y in zip(v_py, v_db))


def test_jacobi_is_a_real_eigendecomposition():
    a = _spd_matrix(11)
    lam, v = jacobi_eigh_flat(a, DIM)
    A = np.array(a).reshape(DIM, DIM)
    V = np.array(v).reshape(DIM, DIM)
    # eigenvalues match LAPACK to machine precision, gap-independent
    assert np.max(np.abs(np.sort(lam) - np.sort(np.linalg.eigvalsh(A)))) < 1e-12
    # V orthonormal, and V^T A V diagonal with diag = lam
    assert np.max(np.abs(V.T @ V - np.eye(DIM))) < 1e-12
    assert np.max(np.abs(V.T @ A @ V - np.diag(lam))) < 1e-12


def test_schedule_covers_every_pair_exactly_once():
    n = DIM
    sched = rr_schedule(n)
    assert len(sched) == n - 1
    seen = set()
    for rnd in sched:
        # a perfect matching: involution with no fixed point
        assert all(rnd[rnd[i]] == i and rnd[i] != i for i in range(n))
        for i in range(n):
            if i < rnd[i]:
                seen.add((i, rnd[i]))
    assert len(seen) == n * (n - 1) // 2


def test_sign_pin_and_ordering_rules():
    assert pin_sign([0.1, -0.9, 0.3]) == [-0.1, 0.9, -0.3]
    assert pin_sign([0.1, 0.9, -0.9]) == [0.1, 0.9, -0.9]  # tie → first index
    a = _spd_matrix(3)
    lam, v = jacobi_eigh_flat(a, DIM)
    comps = top_components(lam, v, DIM, 8)
    # descending eigenvalue order, each comp sign-pinned and unit-norm
    lams_sorted = sorted(lam, reverse=True)[:8]
    for k, c in enumerate(comps):
        m = max(abs(x) for x in c)
        assert c[[abs(x) for x in c].index(m)] > 0
        assert abs(math.fsum(x * x for x in c) - 1.0) < 1e-10
        Ac = np.array(a).reshape(DIM, DIM) @ np.array(c)
        assert abs(float(np.array(c) @ Ac) - lams_sorted[k]) < 1e-10


def test_whitening_flat_inverts_the_covariance():
    a = _spd_matrix(5)
    eps = 1e-5
    lam, v = jacobi_eigh_flat(a, DIM)
    w = np.array(whitening_flat(lam, v, DIM, eps)).reshape(DIM, DIM)
    A = np.array(a).reshape(DIM, DIM)
    # W (A + eps I) W ≈ I — the ZCA contract (W = (A+epsI)^{-1/2})
    assert np.max(np.abs(w @ (A + eps * np.eye(DIM)) @ w - np.eye(DIM))) < 1e-6
    # symmetric (ZCA, not an arbitrary whitener)
    assert np.max(np.abs(w - w.T)) < 1e-12


def test_python_pow_is_not_sqrt():
    """Regression guard for the pitfall that broke the first prototype:
    x ** 0.5 (libm pow) is allowed 1-ulp error while math.sqrt is
    correctly rounded — detmath must never use **."""
    import ast
    import inspect

    import bqfetch_spark.functions.detmath as dm

    tree = ast.parse(inspect.getsource(dm))
    pows = [n for n in ast.walk(tree) if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Pow)]
    assert not pows, "detmath must use math.sqrt, never ** (pow is 1-ulp sloppy)"
    # and the concrete value that diverged in the prototype
    x = 12.901044497287847
    assert math.sqrt(x) == duckdb.connect().execute(
        f"SELECT sqrt('{x!r}'::DOUBLE)"
    ).fetchone()[0]
