"""(gzipped) FASTA reader — sequences and P/N accessibility masks.

Mirrors the reference's ``fasta::Read`` (src/data.cpp:213-235): all
sequence lines are concatenated and uppercased into one string; only the
first record of a file is used (the reference appends across '>' headers
after the first, but Colate inputs are single-record per chromosome).
"""

from __future__ import annotations

import gzip
import os

import numpy as np


def read_fasta(path: str) -> str:
    """Return the concatenated uppercase sequence."""
    if not os.path.exists(path) and os.path.exists(path + ".gz"):
        path = path + ".gz"
    try:
        with gzip.open(path, "rt") as fh:
            data = fh.read()
    except (OSError, gzip.BadGzipFile):
        with open(path, "rt") as fh:
            data = fh.read()
    seq_parts: list[str] = []
    for line in data.splitlines():
        if line.startswith(">"):
            continue
        seq_parts.append(line.strip())
    return "".join(seq_parts).upper()


def read_mask(path: str) -> np.ndarray:
    """Mask as a uint8 array of ASCII codes ('P' = pass)."""
    return np.frombuffer(read_fasta(path).encode("ascii"), dtype=np.uint8)


def write_fasta(path: str, name: str, seq: str, width: int = 80) -> None:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as fh:
        fh.write(f">{name}\n")
        for i in range(0, len(seq), width):
            fh.write(seq[i : i + width] + "\n")
