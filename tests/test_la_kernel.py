"""Direct equivalence tests for the three coal_LA accumulation twins
(ops/la_kernel.py: device / NumPy / native C++) on adversarial inputs
the mode-level goldens don't reach: unsorted block ids, zero ages, ages
exactly at epoch edges, and items spanning many blocks."""

import numpy as np
import pytest

from colate_tpu.ops.la_kernel import (
    la_accumulate_device,
    la_accumulate_host,
    la_accumulate_native,
    pair_keys,
)


def _random_items(g, S, N, G, nb):
    """Random valid forests: node j's parent is a random internal node
    with a larger index (ascending-pass invariant), ages sorted upward
    so children are never older than parents."""
    M = 2 * N - 1
    K = N - 1
    parent = np.full((S, M), -1, np.int32)
    c1 = np.zeros((S, K), np.int32)
    c2 = np.zeros((S, K), np.int32)
    for s in range(S):
        # random binary coalescent topology: merge two open roots at a time
        open_nodes = list(range(N))
        g.shuffle(open_nodes)
        for u in range(N, M):
            a = open_nodes.pop()
            b = open_nodes.pop()
            parent[s, a] = u
            parent[s, b] = u
            c1[s, u - N] = min(a, b)
            c2[s, u - N] = max(a, b)
            open_nodes.insert(g.integers(0, len(open_nodes) + 1), u)
    ages = np.sort(g.uniform(0.0, 120.0, (S, K)), axis=1)
    ages[:, 0] = 0.0  # zero-age coalescence (epoch-0 boundary)
    lab = g.integers(0, G, (S, N)).astype(np.int32)
    w = g.uniform(0.1, 2.0, S)
    blocks = g.integers(0, nb, S).astype(np.int32)  # deliberately unsorted
    return parent, ages, lab, c1, c2, w, blocks


@pytest.mark.parametrize("G,nb", [(2, 1), (3, 5)])
def test_three_twins_agree(G, nb):
    pytest.importorskip("jax")
    g = np.random.default_rng(11)
    S, N = 40, 7
    parent, ages, lab, c1, c2, w, blocks = _random_items(g, S, N, G, nb)
    # pin some ages exactly onto epoch edges (lower-epoch semantics)
    epochs = np.array([0.0, 1.0, 10.0, 50.0, 100.0])
    ages[5, 2] = 10.0
    ages[7, 3] = 100.0
    args = (parent, ages, lab, c1, c2, w, blocks, epochs, G, nb)
    n_np, d_np = la_accumulate_host(*args)
    n_dev, d_dev = la_accumulate_device(*args)
    np.testing.assert_allclose(n_dev, n_np, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(d_dev, d_np, rtol=1e-12, atol=1e-12)
    out = la_accumulate_native(*args)
    if out is None:
        pytest.skip("native kernel unavailable")
    n_nat, d_nat = out
    np.testing.assert_allclose(n_nat, n_np, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(d_nat, d_np, rtol=1e-12, atol=1e-12)
    # conservation: every coalescence lands in exactly one epoch
    tot_pairs = np.array(
        [[(lab[s] == p).sum() * (lab[s] == q).sum() if p != q else
          (lab[s] == p).sum() * ((lab[s] == p).sum() - 1) / 2
          for (p, q) in pair_keys(G)] for s in range(S)]
    )
    np.testing.assert_allclose(
        n_np.sum(axis=(0, 1)), (tot_pairs * w[:, None]).sum(axis=0), rtol=1e-9
    )


def test_oracle_brute_force():
    """The NumPy twin against a per-pair brute-force oracle (the
    reference's nested loops, coal_tree.cpp:447-527 modern case)."""
    g = np.random.default_rng(3)
    S, N, G, nb = 12, 6, 3, 2
    parent, ages, lab, c1, c2, w, blocks = _random_items(g, S, N, G, nb)
    epochs = np.array([0.0, 5.0, 30.0, 90.0])
    E = epochs.shape[0]
    keys = pair_keys(G)
    num = np.zeros((nb, E, len(keys)))
    den = np.zeros((nb, E, len(keys)))
    M = 2 * N - 1
    for s in range(S):
        # leaves under each node
        desc = [[j] if j < N else [] for j in range(M)]
        for j in range(M - 1):
            p = parent[s, j]
            if p >= 0:
                desc[p].extend(desc[j])
        for u in range(N, M):
            a = ages[s, u - N]
            ep = int(np.clip(np.searchsorted(epochs[1:], a, side="left"), 0, E - 1))
            l1 = desc[c1[s, u - N]]
            l2 = desc[c2[s, u - N]]
            for m1 in l1:
                for m2 in l2:
                    p_, q_ = max(lab[s, m1], lab[s, m2]), min(lab[s, m1], lab[s, m2])
                    ki = keys.index((p_, q_))
                    num[blocks[s], ep, ki] += w[s]
                    for e in range(E - 1):
                        ov = min(a, epochs[e + 1]) - epochs[e]
                        if ov > 0:
                            den[blocks[s], e, ki] += w[s] * ov
    n_np, d_np = la_accumulate_host(
        parent, ages, lab, c1, c2, w, blocks, epochs, G, nb
    )
    np.testing.assert_allclose(n_np, num, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(d_np, den, rtol=1e-9, atol=1e-12)


def test_single_epoch_grid():
    """E=1 (one open epoch, reachable from a one-epoch --coal file):
    every event lands in the single epoch, no exposure accrues.  The
    general-E concatenation used to build a zero-width middle term and
    raise on reshape (round-3 advisory)."""
    pytest.importorskip("jax")
    g = np.random.default_rng(3)
    S, N, G, nb = 12, 5, 2, 3
    parent, ages, lab, c1, c2, w, blocks = _random_items(g, S, N, G, nb)
    epochs = np.array([0.0])
    args = (parent, ages, lab, c1, c2, w, blocks, epochs, G, nb)
    n_np, d_np = la_accumulate_host(*args)
    n_dev, d_dev = la_accumulate_device(*args)
    np.testing.assert_allclose(n_dev, n_np, rtol=1e-12, atol=1e-12)
    assert np.all(d_np == 0.0) and np.all(np.asarray(d_dev) == 0.0)
    out = la_accumulate_native(*args)
    if out is not None:
        n_nat, d_nat = out
        np.testing.assert_allclose(n_nat, n_np, rtol=1e-12, atol=1e-12)
        assert np.all(d_nat == 0.0)
    # every pair's event mass is conserved into the one epoch
    assert n_np.sum() > 0


def test_host_chunking_invariant():
    """The bounded-memory chunk loop must not change results (per-chunk
    partial sums add exactly for disjoint item ranges)."""
    pytest.importorskip("jax")
    import colate_tpu.ops.la_kernel as lk

    g = np.random.default_rng(5)
    S, N, G, nb = 37, 6, 3, 4
    parent, ages, lab, c1, c2, w, blocks = _random_items(g, S, N, G, nb)
    epochs = np.array([0.0, 2.0, 20.0, 80.0])
    args = (parent, ages, lab, c1, c2, w, blocks, epochs, G, nb)
    n_all, d_all = la_accumulate_host(*args)
    # force tiny chunks by accumulating manually over item slices
    n_c = np.zeros_like(n_all)
    d_c = np.zeros_like(d_all)
    for i in range(0, S, 7):
        sl = slice(i, min(i + 7, S))
        n_i, d_i = la_accumulate_host(
            parent[sl], ages[sl], lab[sl], c1[sl], c2[sl], w[sl],
            blocks[sl], epochs, G, nb,
        )
        n_c += n_i
        d_c += d_i
    np.testing.assert_allclose(n_c, n_all, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(d_c, d_all, rtol=1e-12, atol=1e-12)


def test_native_thread_override(monkeypatch):
    """COLATE_LA_THREADS pins the reduction order: repeated runs with
    the same count are byte-identical, and a single thread matches the
    NumPy twin's event masses to f64 noise."""
    g = np.random.default_rng(9)
    S, N, G, nb = 64, 6, 2, 3
    parent, ages, lab, c1, c2, w, blocks = _random_items(g, S, N, G, nb)
    epochs = np.array([0.0, 1.0, 10.0, 60.0])
    args = (parent, ages, lab, c1, c2, w, blocks, epochs, G, nb)
    monkeypatch.setenv("COLATE_LA_THREADS", "1")
    out1 = la_accumulate_native(*args)
    if out1 is None:
        pytest.skip("native kernel unavailable")
    out1b = la_accumulate_native(*args)
    np.testing.assert_array_equal(out1[0], out1b[0])
    np.testing.assert_array_equal(out1[1], out1b[1])
    monkeypatch.setenv("COLATE_LA_THREADS", "3")
    out3 = la_accumulate_native(*args)
    out3b = la_accumulate_native(*args)
    np.testing.assert_array_equal(out3[0], out3b[0])
    np.testing.assert_array_equal(out3[1], out3b[1])
    n_np, d_np = la_accumulate_host(*args)
    np.testing.assert_allclose(out1[0], n_np, rtol=1e-12)
    np.testing.assert_allclose(out1[1], d_np, rtol=1e-12)
