"""Reader/writer for ``.coal`` output files.

Layout written by mode mut (reference coal/coal.cpp:3660-3846)::

    0
    <epoch_0> <epoch_1> ... <epoch_{E-1}>
    0 0 <rate_0> ... <rate_{E-1}>
    0 1 <rate_0> ... <rate_{E-1}>        # one row per bootstrap
    ...

For ancient samples (is_ancient) the epoch row is ``0 <epochs[ep_null+1:]>``
and rate rows print from index ep_null with rates[0..ep_null] zeroed.
The tree estimator's Dump (coal_tree.cpp:265-293) uses the same shape with
a group row first.  Values use C++ default formatting (6 significant digits).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _fmt(x: float) -> str:
    return f"{x:g}"


@dataclasses.dataclass
class CoalFile:
    groups: list[str]
    epochs: np.ndarray  # float64 [E']
    rates: np.ndarray  # float64 [num_rows, E']
    row_labels: list[tuple[int, int]]  # (group, bootstrap/iteration) per row

    @classmethod
    def read(cls, path: str) -> "CoalFile":
        with open(path) as fh:
            lines = [ln.rstrip("\n") for ln in fh]
        groups = lines[0].split()
        epochs = np.array([float(x) for x in lines[1].split()], dtype=np.float64)
        rates = []
        labels = []
        for ln in lines[2:]:
            if not ln.strip():
                continue
            parts = ln.split()
            labels.append((int(parts[0]), int(parts[1])))
            rates.append([float(x) for x in parts[2:]])
        return cls(
            groups=groups,
            epochs=epochs,
            rates=np.array(rates, dtype=np.float64),
            row_labels=labels,
        )

    def write(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write(" ".join(self.groups) + "\n")
            fh.write(" ".join(_fmt(e) for e in self.epochs) + " \n")
            for (g, i), row in zip(self.row_labels, self.rates):
                fh.write(f"{g} {i} " + " ".join(_fmt(r) for r in row) + " \n")


def write_mut_coal(
    path: str,
    epochs: np.ndarray,
    rates: np.ndarray,
    is_ancient: bool = False,
    ep_null: int = 0,
) -> None:
    """Write mode-mut output byte-compatibly with coal.cpp:3660-3672/3830-3846.

    rates: [num_bootstrap, E].
    """
    with open(path, "w") as fh:
        fh.write("0\n")
        if is_ancient:
            fh.write("0 ")
            fh.write(" ".join(_fmt(e) for e in epochs[ep_null + 1 :]))
            fh.write(" ")
        else:
            fh.write(" ".join(_fmt(e) for e in epochs))
            fh.write(" ")
        fh.write("\n")
        for i in range(rates.shape[0]):
            row = rates[i].copy()
            fh.write(f"0 {i} ")
            if is_ancient:
                row[: ep_null + 1] = 0.0
                fh.write(" ".join(_fmt(r) for r in row[ep_null:]))
            else:
                fh.write(" ".join(_fmt(r) for r in row))
            fh.write(" \n")
