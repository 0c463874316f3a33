"""Reader/writer for the ``.colate_mat`` sufficient-statistic cache.

Layout (reference coal/coal.cpp:3437-3470, text, space-separated):
row 0: the 185 age-bin representative ages; then per bootstrap two rows,
age_shared_count and age_notshared_count (each already divided by
norm=1e3).  The reference reloads this to skip the parse stage
(coal.cpp:3471-3499); we honour the same cache.
"""

from __future__ import annotations

import numpy as np


def write_colate_mat(
    path: str,
    age_bins: np.ndarray,
    shared: np.ndarray,
    notshared: np.ndarray,
) -> None:
    """shared/notshared: [num_bootstrap, num_age_bins], already normalised."""

    def fmt(x: float) -> str:
        return f"{x:g}"

    with open(path, "w") as fh:
        fh.write(" ".join(fmt(a) for a in age_bins) + " \n")
        for i in range(shared.shape[0]):
            fh.write(" ".join(fmt(v) for v in shared[i]) + " \n")
            fh.write(" ".join(fmt(v) for v in notshared[i]) + " \n")


def read_colate_mat(path: str, num_bootstrap: int):
    """Returns (age_bins, shared [B,bins], notshared [B,bins])."""
    vals = np.loadtxt(path, dtype=np.float64, ndmin=2)
    age_bins = vals[0]
    nb = vals.shape[1]
    shared = np.zeros((num_bootstrap, nb), np.float64)
    notshared = np.zeros((num_bootstrap, nb), np.float64)
    for i in range(num_bootstrap):
        if 1 + 2 * i + 1 < vals.shape[0]:
            shared[i] = vals[1 + 2 * i]
            notshared[i] = vals[2 + 2 * i]
    return age_bins, shared, notshared
