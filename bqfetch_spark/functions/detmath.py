"""Deterministic cross-engine matrix math (VERDICT r8 #2).

The PCA family (qx193 projection, qx208 whitening) was rows-only
because DuckDB has no eigendecomposition. This module removes that
excuse: a FIXED-SCHEDULE parallel Jacobi eigensolver spelled twice —
once in driver Python (for the Spark queries) and once as a DuckDB
WITH-RECURSIVE fragment (for the oracles) — with every floating-point
operation in the identical order, so the two spellings produce
BIT-IDENTICAL eigenvalues and eigenvectors. Downstream projections then
hash-match exactly, with no tolerance games.

Why this is legitimate determinism, not luck:

- The input covariance is already bit-identical across engines: it is
  derived from integer-exact quantized sums (similarity.py's PCA_Q
  fixed-point trick, oracled by qx192) through the same double
  expression, and decimal→double conversion is correctly rounded in
  both CPython and DuckDB (verified empirically, 2080/2080 entries).
- IEEE-754 +,-,*,/ and sqrt are correctly rounded in both engines, so
  any single arithmetic op on identical inputs yields identical bits.
  (Python's ``x ** 0.5`` is NOT — pow is allowed 1-ulp error — which is
  why this module uses ``math.sqrt`` exclusively.)
- Control flow is data-independent: the rotation schedule is the
  round-robin tournament pairing (a compile-time constant), the sweep
  count is fixed, and the only data-dependent branch (``a_pq == 0.0``)
  is an exact comparison both engines resolve identically.

Parallel Jacobi (Brent–Luk ordering): each of the 63 rounds applies 32
Givens rotations on DISJOINT index pairs — disjoint rotations commute,
so a round is ONE two-sided update (a rows pass, then a columns pass).
That makes the SQL spelling 63·sweeps recursive steps over a flat
4096-double list instead of 2016·sweeps scalar rotations, and the
convergence is gap-independent (quadratic) — which matters because the
fixture embedding spectrum is near-isotropic (λk/λk+1 ≈ 1.01), where
power iteration would need thousands of steps per component.

Measured on the sf0.01 covariance: 8 sweeps give max eigenvalue error
vs numpy.eigh of ~4e-16 (identical to 10 sweeps — converged);
Python ~1.2 s, DuckDB ~3.5 s; both spellings bit-equal in all 64
eigenvalues and all 4096 eigenvector components. The Python spelling
is additionally memoized per covariance within a session
(:func:`jacobi_eigh_flat_cached`) — qx193 and qx208 share one
decomposition of the same (sf, corpus) stats.
"""

from __future__ import annotations

import math

# Fixture embedding width and the fixed sweep count. 8 cyclic sweeps
# drive a 64×64 symmetric matrix to ~1e-16 off-diagonal residual
# (quadratic convergence). r10 trim (VERDICT r9 #4): measured on the
# sf0.01 covariance, 8 sweeps give max eigenvalue error vs numpy.eigh
# of 4.2e-16 and orthonormality deviation 1.6e-14 — IDENTICAL to 10
# sweeps — at 20% less fixed driver/oracle cost. Both spellings share
# this constant, so cross-engine bit-parity is preserved by
# construction at any value.
JACOBI_SWEEPS = 8


def rr_schedule(n: int) -> list[list[int]]:
    """Round-robin (circle method) pairing: n-1 rounds, each a perfect
    matching given as partner[i] (0-based). Data-independent, so both
    engines share it as a literal constant."""
    arr = list(range(1, n))
    rounds = []
    for _ in range(n - 1):
        ring = [0] + arr
        partner = [0] * n
        for k in range(n // 2):
            a, b = ring[k], ring[n - 1 - k]
            partner[a] = b
            partner[b] = a
        rounds.append(partner)
        arr = [arr[-1]] + arr[:-1]
    return rounds


def jacobi_eigh_flat(
    a_flat: list[float], dim: int, sweeps: int = JACOBI_SWEEPS
) -> tuple[list[float], list[float]]:
    """Eigendecomposition of a symmetric matrix (flat row-major list)
    by fixed-schedule parallel Jacobi. Returns (eigenvalues as diag(A)
    after the sweeps, V flat row-major — COLUMNS are eigenvectors:
    V[i*dim+k] is component i of eigenvector k).

    Every operation below has a 1:1 counterpart in
    :func:`jacobi_sql_ctes`; change them TOGETHER or the bit-parity
    the PCA oracles rest on is gone."""
    sched = rr_schedule(dim)
    a = list(a_flat)
    v = [0.0] * (dim * dim)
    for i in range(dim):
        v[i * dim + i] = 1.0
    for step in range(sweeps * (dim - 1)):
        m = sched[step % (dim - 1)]
        c = [0.0] * dim
        s = [0.0] * dim
        for i in range(dim):
            p, q = (i, m[i]) if i < m[i] else (m[i], i)
            apq = a[p * dim + q]
            if apq == 0.0:
                t = 0.0
            else:
                theta = (a[q * dim + q] - a[p * dim + p]) / (2.0 * apq)
                sg = 1.0 if theta >= 0.0 else -1.0
                t = sg / (abs(theta) + math.sqrt(theta * theta + 1.0))
            ci = 1.0 / math.sqrt(t * t + 1.0)
            c[i] = ci
            s[i] = t * ci
        b = [0.0] * (dim * dim)
        for i in range(dim):  # rows pass: B = Jᵀ A
            mi = m[i]
            if i < mi:
                for j in range(dim):
                    b[i * dim + j] = c[i] * a[i * dim + j] - s[i] * a[mi * dim + j]
            else:
                for j in range(dim):
                    b[i * dim + j] = s[i] * a[mi * dim + j] + c[i] * a[i * dim + j]
        a2 = [0.0] * (dim * dim)
        v2 = [0.0] * (dim * dim)
        for i in range(dim):  # cols pass: A' = B J ; V' = V J
            for j in range(dim):
                mj = m[j]
                if j < mj:
                    a2[i * dim + j] = c[j] * b[i * dim + j] - s[j] * b[i * dim + mj]
                    v2[i * dim + j] = c[j] * v[i * dim + j] - s[j] * v[i * dim + mj]
                else:
                    a2[i * dim + j] = s[j] * b[i * dim + mj] + c[j] * b[i * dim + j]
                    v2[i * dim + j] = s[j] * v[i * dim + mj] + c[j] * v[i * dim + j]
        a, v = a2, v2
    lam = [a[i * dim + i] for i in range(dim)]
    return lam, v


# Session-lifetime memo for the fixed-cost driver decomposition: the
# PCA family (qx193 projection, qx208 whitening) derives from the SAME
# per-(sf, corpus) covariance, so within a session the O(d³) Jacobi
# runs once, not once per query. Keyed by matrix CONTENT (tuple hash of
# 4096 doubles — microseconds), so a changed corpus can never serve a
# stale decomposition; bounded to a handful of entries per process.
_EIG_MEMO: dict[tuple, tuple[list[float], list[float]]] = {}


def jacobi_eigh_flat_cached(
    a_flat: list[float], dim: int, sweeps: int = JACOBI_SWEEPS
) -> tuple[list[float], list[float]]:
    """Memoized :func:`jacobi_eigh_flat` (same bits, cached by matrix
    content). Callers must NOT mutate the returned lists."""
    key = (dim, sweeps, tuple(a_flat))
    out = _EIG_MEMO.get(key)
    if out is None:
        if len(_EIG_MEMO) > 32:  # runaway-guard: synthetic-corpus test loops
            _EIG_MEMO.clear()
        out = jacobi_eigh_flat(a_flat, dim, sweeps)
        _EIG_MEMO[key] = out
    return out


def pin_sign(vec: list[float]) -> list[float]:
    """Deterministic eigenvector orientation: the largest-|component|
    entry is made positive (first index on exact-|value| ties). The
    same rule is spelled in SQL via list_position on the abs list."""
    mabs = max(abs(x) for x in vec)
    idx = next(i for i, x in enumerate(vec) if abs(x) == mabs)
    if vec[idx] < 0.0:
        return [-x for x in vec]
    return vec


def top_components(
    lam: list[float], v_flat: list[float], dim: int, k: int
) -> list[list[float]]:
    """Top-k eigenvectors ordered by (eigenvalue desc, index asc),
    sign-pinned. Order and pin resolve identically in SQL because the
    eigenvalues are bit-identical across engines."""
    order = sorted(range(dim), key=lambda i: (-lam[i], i))[:k]
    return [pin_sign([v_flat[r * dim + i] for r in range(dim)]) for i in order]


def whitening_flat(
    lam: list[float], v_flat: list[float], dim: int, eps: float
) -> list[float]:
    """ZCA whitener W = V diag(1/sqrt(max(λ,0)+eps)) Vᵀ as a flat
    row-major list, accumulated in natural eigen-index order (NO sort —
    the sum is the same set of terms in the same order in both
    spellings, which is all bit-parity needs)."""
    g = [1.0 / math.sqrt((l if l > 0.0 else 0.0) + eps) for l in lam]
    w = [0.0] * (dim * dim)
    for i in range(dim):
        for j in range(dim):
            terms0 = v_flat[i * dim + 0] * g[0] * v_flat[j * dim + 0]
            acc = terms0
            for k in range(1, dim):
                acc = acc + v_flat[i * dim + k] * g[k] * v_flat[j * dim + k]
            w[i * dim + j] = acc
    return w


# ---------------------------------------------------------------------------
# DuckDB spellings
# ---------------------------------------------------------------------------


def _d(x: float) -> str:
    """A double literal that parses to exactly this double (bare
    numeric literals parse as DECIMAL first and can lose bits)."""
    return f"'{x!r}'::DOUBLE"


def jacobi_sql_ctes(a_cte: str, dim: int, sweeps: int = JACOBI_SWEEPS) -> str:
    """CTE fragment (requires WITH RECURSIVE) computing
    ``jfin(lam DOUBLE[], vm DOUBLE[])`` — eigenvalues and the flat
    eigenvector matrix — from ``{a_cte}(a)`` holding the flat symmetric
    matrix. Bit-for-bit the same algorithm as
    :func:`jacobi_eigh_flat`."""
    sched_lit = "[" + ",".join(
        "[" + ",".join(str(x + 1) for x in rnd) + "]" for rnd in rr_schedule(dim)
    ) + "]"
    n1 = dim - 1
    total = sweeps * n1
    d2 = dim * dim
    one, zero, two = _d(1.0), _d(0.0), _d(2.0)
    # per-index rotation tangent from the current matrix + partner list
    app = f"a[(least(i, mm[i])-1)*{dim} + least(i, mm[i])]"
    aqq = f"a[(greatest(i, mm[i])-1)*{dim} + greatest(i, mm[i])]"
    apq = f"a[(least(i, mm[i])-1)*{dim} + greatest(i, mm[i])]"
    theta = f"(({aqq} - {app}) / ({two} * {apq}))"
    t_expr = f"""list_transform(range(1,{dim}+1), i ->
      CASE WHEN {apq} = {zero} THEN {zero}
           ELSE (CASE WHEN {theta} >= {zero} THEN {one} ELSE {_d(-1.0)} END)
                / (abs({theta}) + sqrt({theta} * {theta} + {one}))
      END)"""
    return f"""jsched(r) AS MATERIALIZED (SELECT {sched_lit}),
jst(step, a, vm) AS (
  SELECT 0, (SELECT a FROM {a_cte}),
         list_transform(range(1,{d2}+1),
           x -> CASE WHEN ((x-1)//{dim}) = ((x-1)%{dim}) THEN {one} ELSE {zero} END)
  UNION ALL
  SELECT step + 1,
         list_transform(range(1,{d2}+1), x ->
           CASE WHEN ((x-1)%{dim})+1 < mm[((x-1)%{dim})+1]
                THEN cl[((x-1)%{dim})+1] * b[x] - sl[((x-1)%{dim})+1] * b[((x-1)//{dim})*{dim} + mm[((x-1)%{dim})+1]]
                ELSE sl[((x-1)%{dim})+1] * b[((x-1)//{dim})*{dim} + mm[((x-1)%{dim})+1]] + cl[((x-1)%{dim})+1] * b[x]
           END),
         list_transform(range(1,{d2}+1), x ->
           CASE WHEN ((x-1)%{dim})+1 < mm[((x-1)%{dim})+1]
                THEN cl[((x-1)%{dim})+1] * vm[x] - sl[((x-1)%{dim})+1] * vm[((x-1)//{dim})*{dim} + mm[((x-1)%{dim})+1]]
                ELSE sl[((x-1)%{dim})+1] * vm[((x-1)//{dim})*{dim} + mm[((x-1)%{dim})+1]] + cl[((x-1)%{dim})+1] * vm[x]
           END)
  FROM (
    SELECT step, a, vm, mm, cl, sl,
           list_transform(range(1,{d2}+1), x ->
             CASE WHEN ((x-1)//{dim})+1 < mm[((x-1)//{dim})+1]
                  THEN cl[((x-1)//{dim})+1] * a[x] - sl[((x-1)//{dim})+1] * a[(mm[((x-1)//{dim})+1]-1)*{dim} + ((x-1)%{dim})+1]
                  ELSE sl[((x-1)//{dim})+1] * a[(mm[((x-1)//{dim})+1]-1)*{dim} + ((x-1)%{dim})+1] + cl[((x-1)//{dim})+1] * a[x]
             END) AS b
    FROM (
      SELECT step, a, vm, mm, tl,
             list_transform(tl, t -> {one} / sqrt(t*t + {one})) AS cl,
             list_transform(range(1,{dim}+1), i -> tl[i] * ({one} / sqrt(tl[i]*tl[i] + {one}))) AS sl
      FROM (
        SELECT step, a, vm, mm, {t_expr} AS tl
        FROM (
          SELECT step, a, vm, r[(step % {n1}) + 1] AS mm
          FROM jst, jsched WHERE step < {total}
        )
      )
    )
  )
),
jfin(lam, vm) AS MATERIALIZED (
  SELECT list_transform(range(1,{dim}+1), i -> a[(i-1)*{dim}+i]), vm
  FROM jst WHERE step = {total}
)"""


def sign_pin_sql(vec: str) -> str:
    """SQL spelling of :func:`pin_sign` for a DOUBLE[] expression."""
    absl = f"list_transform({vec}, x -> abs(x))"
    return (
        f"CASE WHEN ({vec})[list_position({absl}, list_aggregate({absl}, 'max'))]"
        f" < {_d(0.0)} THEN list_transform({vec}, x -> -x) ELSE ({vec}) END"
    )


def seq_dot_sql(terms: str) -> str:
    """Sequential left-to-right sum STARTING FROM 0.0 — the exact
    mirror of Spark's ``F.aggregate(…, lit(0.0), acc+x)`` (prepending
    the zero keeps -0.0 first elements from leaking a sign into the
    canonical output)."""
    return f"list_reduce(list_prepend({_d(0.0)}, {terms}), (x, y) -> x + y)"
