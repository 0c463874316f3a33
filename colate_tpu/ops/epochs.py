"""Epoch-grid construction for mode mut (reference coal/coal.cpp:3503-3646).

Two sources:
- ``--bins x,y,step``: log10-year boundaries 10^x..10^y step `step`,
  divided by years_per_gen, prefixed with epoch 0, suffixed with a
  max(1e8, 10*last)/years_per_gen cap epoch.  For ancient samples
  (age>0) the sample age is spliced into the grid and `ep_null` counts
  the boundaries below it (those epochs are zeroed in the output).
- ``--coal file``: epoch row of an existing .coal file, with the same
  age-splicing, plus its first rate row as the initial rates.

The reference parses bounds with std::stof (float32) — replicated.
"""

from __future__ import annotations

import numpy as np

from colate_tpu.config import INITIAL_COAL_RATE


def epochs_from_bins(bins: str, years_per_gen: float, age: float):
    """Returns (epochs f64 [E], ep_null int). `age` in generations."""
    parts = bins.split(",")
    if len(parts) < 3:
        raise ValueError("epochs format is wrong. Specify x,y,stepsize.")
    epoch_lower = float(np.float32(parts[0]))
    epoch_upper = float(np.float32(parts[1]))
    epoch_step = float(np.float32(parts[2]))
    log_10 = np.log(10.0)

    # log(0) = -inf for modern samples; the loop below then inserts age(=0)
    # at the first boundary — the reference's grid really does start
    # "0 0 10^(lower+step) ..." for modern samples (verified against the
    # binary; the first boundary is consumed by the insertion).
    log_age = np.log(age * years_per_gen) / log_10 if age > 0 else -np.inf

    ep_null = 0
    epochs = [0.0]
    if log_age < epoch_lower and age != 0.0:
        epochs.append(age)
        log_age = -1.0  # sentinel: age already inserted (coal.cpp:3600)
    boundary = epoch_lower
    while boundary < epoch_upper:
        if boundary > log_age and log_age != -1.0:
            epochs.append(age)
            if boundary - log_age < 0.25 * epoch_step:
                boundary += epoch_step
            log_age = -1.0
        else:
            if log_age != -1.0:
                ep_null += 1
            epochs.append(np.exp(log_10 * boundary) / years_per_gen)
        boundary += epoch_step
    epochs.append(np.exp(log_10 * epoch_upper) / years_per_gen)
    epochs.append(max(1e8, 10.0 * epochs[-1]) / years_per_gen)
    return np.array(epochs, dtype=np.float64), ep_null


def epochs_from_coal_file(path: str, age: float):
    """Epoch row of a .coal file with age spliced in (coal.cpp:3508-3562),
    plus the file's initial rates mapped onto the new grid.

    Returns (epochs, init_rates, ep_null=0).  The reference reads exactly
    num_epochs rates from the third line (after two dummies) — when the age
    was spliced in, the LAST file rate is dropped and rates shift by one
    from the splice point (is >> reads sequentially); replicated.
    """
    with open(path) as fh:
        lines = fh.read().splitlines()
    file_epochs = [float(np.float32(x)) for x in lines[1].split()]
    epochs: list[float] = []
    ep = 0
    for v in file_epochs:
        if ep == 1 and age < v and age != 0.0:
            epochs.append(age)
            ep += 1
        if ep != 1 or age == 0.0:
            epochs.append(v)
            ep += 1
    num_epochs = len(epochs)
    rate_fields = lines[2].split()
    # first two fields are dummies (group, bootstrap id)
    rates = [float(x) for x in rate_fields[2 : 2 + num_epochs]]
    while len(rates) < num_epochs:
        rates.append(INITIAL_COAL_RATE)
    return (
        np.array(epochs, dtype=np.float64),
        np.array(rates, dtype=np.float64),
        0,
    )
