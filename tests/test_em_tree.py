"""Legacy tree-conditioned EM E-step (ops/em_tree.py vs two oracles).

1. With num_lins==1 and grid-aligned epochs the inhomogeneous model
   degenerates to the unconditioned coal_EM point-age E-step — compare
   against ops.em._e_step_all_bins.
2. General case (random lineage counts and DAF): Monte-Carlo oracle
   that samples the inhomogeneous coalescence time on the bin grid and
   reweights by the reference's per-regime weights.
"""

import numpy as np
import pytest

from colate_tpu.config import AGE_BIN_C, NUM_AGE_BINS
from colate_tpu.ops.em_tree import (
    em_tree_notshared,
    em_tree_shared,
    grid_and_epoch_index,
)


def _grid_edges():
    t = np.zeros(NUM_AGE_BINS)
    t[1:] = np.exp((np.arange(1, NUM_AGE_BINS) - 1.0) / AGE_BIN_C) / 10.0
    return t


def test_shared_reduces_to_unconditioned_point_age():
    import jax.numpy as jnp

    from colate_tpu.ops.em import _e_step_all_bins

    t = _grid_edges()
    # epochs exactly on grid edges so the per-bin epoch quantisation is exact
    epochs = np.array([0.0, t[40], t[80], t[120], t[160]])
    rates = np.array([1e-3, 3e-4, 1e-4, 5e-5, 1e-4])
    E = epochs.shape[0]
    ones = np.ones(NUM_AGE_BINS, np.float32)
    a = t[100]  # grid-aligned point age
    num, den, logz = em_tree_shared(epochs, rates, ones, ones, a, a)

    k = np.clip(np.searchsorted(epochs, np.array([a]), side="right") - 1, 0, E - 1)
    ns, ds, ls, nn, dn, ln = _e_step_all_bins(
        jnp.asarray(epochs), jnp.asarray(rates), jnp.asarray([a]),
        jnp.asarray(k, dtype=jnp.int32),
    )
    np.testing.assert_allclose(num, np.asarray(ns)[0], rtol=2e-3, atol=1e-9)
    np.testing.assert_allclose(den, np.asarray(ds)[0], rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(logz, float(np.asarray(ls)[0]), rtol=1e-3)


def test_notshared_unconditional_mass_when_daf_zero():
    """DAF==0 everywhere: the not-shared E-step sees the unconditional
    coalescence density (truncated at the grid end)."""
    t = _grid_edges()
    epochs = np.array([0.0, t[60], t[120]])
    rates = np.array([5e-3, 1e-3, 1e-4])
    ones = np.ones(NUM_AGE_BINS, np.float32)
    zeros = np.zeros(NUM_AGE_BINS, np.float32)
    num, den, logz = em_tree_notshared(epochs, rates, ones, zeros, 0.0, 0.0)
    # hand-computed unconditional epoch masses
    H1 = 5e-3 * t[60]
    H2 = H1 + 1e-3 * (t[120] - t[60])
    expect = np.array(
        [1 - np.exp(-H1), np.exp(-H1) - np.exp(-H2), np.exp(-H2)]
    )
    # grid truncation loses the tail beyond ~9.7e6 gens (negligible here)
    np.testing.assert_allclose(num, expect, rtol=1e-3, atol=1e-7)
    assert abs(logz) < 1e-3  # total mass ~1


@pytest.mark.parametrize("interval", [False, True])
def test_tree_e_step_against_mc_oracle(interval):
    g = np.random.default_rng(11)
    t = _grid_edges()
    epochs = np.array([0.0, t[50], t[90], t[130]])
    rates = np.array([2e-3, 5e-4, 2e-4, 1e-4])
    E = epochs.shape[0]
    _, ep = grid_and_epoch_index(epochs)
    # lineage counts decay with age like a real marginal tree
    k = np.maximum(1.0, 20.0 * np.exp(-np.arange(NUM_AGE_BINS) / 40.0)).astype(
        np.float32
    )
    a_bin, b_bin = 70, 110
    a, b = t[a_bin], (t[b_bin] if interval else t[a_bin])
    daf = np.zeros(NUM_AGE_BINS, np.float32)
    daf[:b_bin] = g.uniform(0.3, 0.9, b_bin).astype(np.float32)

    num_s, den_s, _ = em_tree_shared(epochs, rates, k, daf, a, b)
    num_n, den_n, _ = em_tree_notshared(epochs, rates, k, daf, a, b)

    # ---- Monte-Carlo oracle ----
    n_mc = 400_000
    dt = t[1:] - t[:-1]
    h = rates[ep[:-1]] * k[:-1]
    dH = h * dt
    Hc = np.concatenate([[0.0], np.cumsum(dH)])
    u = g.uniform(0, 1, n_mc)
    target = -np.log1p(-u * (1 - np.exp(-Hc[-1])))  # truncate to the grid
    i_bin = np.searchsorted(Hc, target, side="right") - 1
    i_bin = np.clip(i_bin, 0, len(dt) - 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        T = t[:-1][i_bin] + (target - Hc[i_bin]) / h[i_bin]
    e_of = ep[i_bin]

    # per-reference regime weights at bin granularity (a, b grid-aligned)
    t1 = t[1:][i_bin]
    t0 = t[:-1][i_bin]
    d = daf[i_bin].astype(np.float64)
    below = t1 <= a
    inside = (t0 >= a) & (t1 <= b) & interval
    w_s = np.where(below, d, 0.0)
    if interval:
        w_s = np.where(inside, d * (b - T) / (b - a), w_s)
    w_n = np.where(below & (d < 1.0), 1.0 - d, 0.0)
    if interval:
        w_n = np.where(inside, d * (T - a) / (b - a) + (1.0 - d), w_n)
    w_n = np.where(~below & ~inside & (d == 0.0), 1.0, w_n)

    # lineage-weighted exposure of epoch e before T
    cum_bl = np.concatenate([[0.0], np.cumsum(dt * k[:-1])])
    expo = np.zeros((n_mc, E))
    for e in range(E):
        in_e = ep[:-1] == e
        full = float(np.sum(dt[in_e] * k[:-1][in_e]))
        # exposure accumulated within e strictly before T's bin
        sel = in_e[i_bin]
        start_bl = np.where(
            sel,
            cum_bl[i_bin] - np.concatenate([[0.0], np.cumsum(np.where(in_e, 0.0, dt * k[:-1]))])[i_bin],
            0.0,
        )
        partial = np.where(sel, start_bl + (T - t0) * k[:-1][i_bin], 0.0)
        expo[:, e] = np.where(e_of > e, full, partial)

    for (num, den, w) in ((num_s, den_s, w_s), (num_n, den_n, w_n)):
        Z = w.mean()
        hits = np.array([np.sum((w > 0) & (e_of == e)) for e in range(E)])
        mc_num = np.array([(w * (e_of == e)).mean() for e in range(E)]) / Z
        mc_den = (w[:, None] * expo).mean(axis=0) / Z
        # only epochs with enough MC support carry a tight bound; the
        # tail epochs get a couple dozen hits out of 400k samples
        ok = hits >= 3000
        assert ok.sum() >= 2
        np.testing.assert_allclose(num[ok], mc_num[ok], rtol=0.08, atol=5e-4)
        np.testing.assert_allclose(den[ok], mc_den[ok], rtol=0.08, atol=5e-2)
        # undersampled epochs: same order of magnitude
        for e in np.nonzero(~ok & (hits > 5))[0]:
            assert 0.2 * mc_den[e] <= den[e] <= 5.0 * mc_den[e]
