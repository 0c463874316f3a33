"""Block-bootstrap weighting and the empirical-F redistribution.

The reference draws, per bootstrap replicate, num_blocks block indices
with replacement and sums block histograms with those multiplicities
(coal/coal.cpp:3350-3390); replicate 0 of a single-replicate run uses
weight 1 for every block.  Here the weights form a [B, num_blocks]
matrix and the weighted sums are a single matmul.

The redistribution step (coal.cpp:3392-3451) moves the *shared* mass of
age_begin==0 mutations (banked in the emp matrices keyed by age_end bin)
into the shared histogram, spread proportionally to
F(bin) = shared_emp/(shared_emp+notshared_emp) times the bin width —
with the reference's exact off-by-one: the width scaling multiplies
F[bin-1] for bin in [bin_start, num_bins), so the last bin keeps its
unscaled ratio and the (zero) entry at bin_start-1 is scaled in vain.
"""

from __future__ import annotations

import numpy as np

from colate_tpu.config import NUM_AGE_BINS, age_bin_centers
from colate_tpu.hostrng import MT19937


def bootstrap_weights(
    num_bootstrap: int,
    num_blocks: int,
    rng: MT19937 | None = None,
    seed: int | None = None,
) -> np.ndarray:
    """[B, num_blocks] float64 multiplicity weights.

    With a parity `rng` (libstdc++-compatible), draws match the reference
    order: for each replicate, num_blocks uniform_int draws.  Otherwise a
    numpy Generator is used.
    """
    w = np.zeros((num_bootstrap, num_blocks), np.float64)
    if num_bootstrap == 1:
        w[0] = 1.0
        return w
    if rng is not None:
        for i in range(num_bootstrap):
            idx = rng.uniform_int(0, num_blocks - 1, num_blocks)
            np.add.at(w[i], idx, 1.0)
    else:
        g = np.random.default_rng(seed)
        for i in range(num_bootstrap):
            idx = g.integers(0, num_blocks, num_blocks)
            np.add.at(w[i], idx, 1.0)
    return w


def weighted_counts(
    weights: np.ndarray,
    shared_blocks: np.ndarray,
    notshared_blocks: np.ndarray,
    shared_emp_blocks: np.ndarray,
    notshared_emp_blocks: np.ndarray,
):
    """Weighted block sums: returns per-replicate [B, bins] arrays."""
    shared = weights @ shared_blocks
    notshared = weights @ notshared_blocks
    shared_emp = weights @ shared_emp_blocks
    notshared_emp = weights @ notshared_emp_blocks
    return shared, notshared, shared_emp, notshared_emp


def redistribute_emp(
    shared: np.ndarray,
    shared_emp: np.ndarray,
    notshared_emp: np.ndarray,
    age: float = 0.0,
) -> np.ndarray:
    """Add redistributed emp mass to `shared` (per replicate, coal.cpp:3392-3451).

    shared: [B, bins] (modified copy returned); *_emp: [B, bins].
    """
    nbins = NUM_AGE_BINS
    age_bin = age_bin_centers()
    out = shared.copy()
    bin_start = 0
    while age_bin[bin_start] <= age:
        bin_start += 1
    for i in range(shared.shape[0]):
        F = np.zeros(nbins, np.float64)
        fcount = float(np.sum(shared_emp[i, bin_start:]))
        se = shared_emp[i]
        ne = notshared_emp[i]
        nz = se[bin_start:] > 0
        denom = se[bin_start:] + ne[bin_start:]
        with np.errstate(invalid="ignore", divide="ignore"):
            F[bin_start:] = np.where(nz, se[bin_start:] / denom, 0.0)
        # Width scaling with the reference's index shift (coal.cpp:
        # 3420-3426): the loop runs `F[bin-1] *= age_bin[bin]-lower_age`
        # for bin in [bin_start, nbins).  Observable effect:
        # F[b] *= age_bin[b+1]-age_bin[b] for b in [bin_start-1, nbins-2]
        # and F[nbins-1] KEEPS ITS UNSCALED RATIO.  For modern samples
        # (bin_start==0) the first write targets F[-1], which in the
        # binary is an out-of-bounds store landing outside F (genuine UB
        # at coal.cpp:3399/3423) — no element of F is modified by it, so
        # we simply skip it (do NOT emulate with Python wrap-around,
        # which would scale and sign-flip the last bin).
        lo = max(bin_start - 1, 0)
        F[lo : nbins - 1] *= age_bin[lo + 1 : nbins] - age_bin[lo : nbins - 1]
        normf = float(np.sum(F))
        if normf != 0.0:
            F = F / normf * fcount
        else:
            # 0/0 -> nan propagation in the reference; with fcount==0 the
            # added mass is 0/0*0 = nan... but max(0.0, nan) = nan in C++
            # std::max? std::max(0.0, nan) returns 0.0 (nan comparison false).
            F = np.zeros(nbins, np.float64)
        out[i] += np.maximum(F, 0.0)
    return out
