"""EFP basis proof (VERDICT r1 item 4).

Independently verifies the prime-multigraph enumeration in
``mpgan_tpu.evaluation.efp`` against (a) a brute-force generator written
directly from the EFP definition (arXiv:1712.07124: prime EFPs <-> connected
multigraphs without self-loops, counted 1/2/5/12/33... by edge count —
OEIS A076864) using a *different* algorithm and canonical form (adjacency
matrices, permutation-minimized upper triangle), and (b) the exact
hard-coded canonical edge lists of all 20 primes of degree <= 4, so the FPD
and W1-EFP feature bases are auditable line by line vs energyflow
``("d<=", 4)``.

Composites: products of >= 2 primes with total degree <= 4 — 15 of them,
giving the 35-column ``"d<=4-all"`` basis (energyflow's d<=4 set minus the
trivial degree-0 constant). Column order differs from energyflow's, which
is immaterial for FPD (Frechet distance) and per-column W1 as both sides
use the same order.
"""

from itertools import combinations, permutations

import numpy as np
import pytest

from mpgan_tpu.evaluation.efp import (
    efp_composites,
    efp_multigraphs,
    efps,
)

# The 20 prime EFP multigraphs of degree <= 4, canonical edge lists
# (degree-major order; vertex 0.. relabeled canonically). Structures, in
# order: d1 edge | d2 double-edge, path_3 | d3 triple-edge,
# double+pendant, star_3, triangle, path_4 | d4 quadruple-edge,
# triple+pendant, double-double (shared vertex), double+2 pendants,
# double+triangle, path_4 doubled-middle, path_4 doubled-end, star_4,
# triangle+pendant, spider (T-tree), cycle_4, path_5.
EXPECTED_PRIMES = (
    ((0, 1),),
    ((0, 1), (0, 1)),
    ((0, 1), (0, 2)),
    ((0, 1), (0, 1), (0, 1)),
    ((0, 1), (0, 1), (0, 2)),
    ((0, 1), (0, 2), (0, 3)),
    ((0, 1), (0, 2), (1, 2)),
    ((0, 1), (0, 2), (1, 3)),
    ((0, 1), (0, 1), (0, 1), (0, 1)),
    ((0, 1), (0, 1), (0, 1), (0, 2)),
    ((0, 1), (0, 1), (0, 2), (0, 2)),
    ((0, 1), (0, 1), (0, 2), (0, 3)),
    ((0, 1), (0, 1), (0, 2), (1, 2)),
    ((0, 1), (0, 1), (0, 2), (1, 3)),
    ((0, 1), (0, 1), (0, 2), (2, 3)),
    ((0, 1), (0, 2), (0, 3), (0, 4)),
    ((0, 1), (0, 2), (0, 3), (1, 2)),
    ((0, 1), (0, 2), (0, 3), (1, 4)),
    ((0, 1), (0, 2), (1, 3), (2, 3)),
    ((0, 1), (0, 2), (1, 3), (2, 4)),
)


# --- independent brute force: adjacency-matrix enumeration ----------------


def _matrix_canon(adj: np.ndarray) -> tuple:
    """Canonical form = lexicographically smallest upper triangle over all
    vertex permutations (independent of efp.py's sorted-edge-list form)."""
    n = len(adj)
    best = None
    for perm in permutations(range(n)):
        p = adj[np.ix_(perm, perm)]
        flat = tuple(p[i][j] for i in range(n) for j in range(i + 1, n))
        if best is None or flat < best:
            best = flat
    return (n,) + best


def _is_connected_matrix(adj: np.ndarray) -> bool:
    n = len(adj)
    seen = {0}
    stack = [0]
    while stack:
        v = stack.pop()
        for u in range(n):
            if adj[v][u] and u not in seen:
                seen.add(u)
                stack.append(u)
    return len(seen) == n


def _brute_force_primes(d: int) -> set[tuple]:
    """All connected multigraphs with exactly d edges, no self-loops, no
    isolated vertices, as matrix-canonical forms. Enumerates every way to
    distribute d edge-units over the vertex pairs of 2..d+1 vertices."""
    found: set[tuple] = set()
    for n in range(2, d + 2):
        pairs = list(combinations(range(n), 2))
        # compositions of d over len(pairs) slots
        def rec(slot: int, remaining: int, counts: list[int]):
            if slot == len(pairs):
                if remaining:
                    return
                adj = np.zeros((n, n), dtype=int)
                for (a, b), c in zip(pairs, counts):
                    adj[a][b] = adj[b][a] = c
                if (adj.sum(axis=0) == 0).any():  # isolated vertex
                    return
                if _is_connected_matrix(adj):
                    found.add(_matrix_canon(adj))
                return
            for c in range(remaining + 1):
                rec(slot + 1, remaining - c, counts + [c])

        rec(0, d, [])
    return found


def _edges_to_matrix_canon(edges) -> tuple:
    n = max(v for e in edges for v in e) + 1
    adj = np.zeros((n, n), dtype=int)
    for a, b in edges:
        adj[a][b] += 1
        adj[b][a] += 1
    return _matrix_canon(adj)


def test_prime_enumeration_matches_brute_force():
    gs = efp_multigraphs(4)
    by_d = {}
    for g in gs:
        by_d.setdefault(len(g), []).append(g)
    assert {d: len(v) for d, v in by_d.items()} == {1: 1, 2: 2, 3: 5, 4: 12}
    for d in (1, 2, 3, 4):
        ours = {_edges_to_matrix_canon(g) for g in by_d[d]}
        brute = _brute_force_primes(d)
        assert ours == brute, f"degree-{d} prime set mismatch"


def test_prime_canonical_edge_lists_exact():
    assert efp_multigraphs(4) == EXPECTED_PRIMES


def test_n4d4_subset_is_the_five_w1efp_graphs():
    from mpgan_tpu.evaluation.efp import _select_graphs

    n4d4 = _select_graphs("n4d4")
    assert len(n4d4) == 5
    # 4 vertices, 4 edges each; exactly: cycle_4, triangle+pendant,
    # double+2-pendants, path_4 doubled-middle, path_4 doubled-end
    expected = {
        ((0, 1), (0, 2), (1, 3), (2, 3)),  # cycle
        ((0, 1), (0, 2), (0, 3), (1, 2)),  # triangle + pendant
        ((0, 1), (0, 1), (0, 2), (0, 3)),  # double edge + 2 pendants
        ((0, 1), (0, 1), (0, 2), (1, 3)),  # path, middle edge doubled
        ((0, 1), (0, 1), (0, 2), (2, 3)),  # path, end edge doubled
    }
    assert set(n4d4) == expected


def test_composites_count_and_total_basis():
    comps = efp_composites(4)
    assert len(comps) == 15  # (1,1) 1 + (1,2) 2 + (1,3) 5 + (2,2) 3
    #                          + (1,1,1) 1 + (1,1,2) 2 + (1,1,1,1) 1
    primes = efp_multigraphs(4)
    for c in comps:
        assert len(c) >= 2
        assert sum(len(primes[i]) for i in c) <= 4
    # total d<=4 basis (constant dropped) = 35, energyflow's count
    assert len(primes) + len(comps) == 35


def test_composite_values_are_products():
    rng = np.random.default_rng(0)
    jets = rng.normal(scale=0.2, size=(8, 12, 3)).astype(np.float64)
    jets[..., 2] = np.abs(jets[..., 2])
    prime_vals = efps(jets, select="d<=4", use_jax=False)
    all_vals = efps(jets, select="d<=4-all", use_jax=False)
    assert all_vals.shape == (8, 35)
    np.testing.assert_allclose(all_vals[:, :20], prime_vals, rtol=1e-12)
    for ci, c in enumerate(efp_composites(4)):
        np.testing.assert_allclose(
            all_vals[:, 20 + ci],
            np.prod(prime_vals[:, list(c)], axis=1),
            rtol=1e-10,
        )


def test_single_edge_efp_analytic():
    """EFP of the single-edge graph has a closed form: sum_ij z_i z_j
    theta_ij — checked against a hand-computed 3-particle jet."""
    jets = np.zeros((1, 3, 3))
    jets[0] = [[0.0, 0.0, 2.0], [0.3, 0.4, 1.0], [0.0, 0.0, 1.0]]
    z = np.array([2.0, 1.0, 1.0]) / 4.0
    theta01 = 0.5  # sqrt(0.3^2+0.4^2)
    expected = 2 * (z[0] * z[1] * theta01 + z[1] * z[2] * theta01)
    val = efps(jets, select="d<=4", use_jax=False)[0, 0]
    np.testing.assert_allclose(val, expected, rtol=1e-12)
