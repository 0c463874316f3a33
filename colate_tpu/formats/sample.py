"""Relate poplabels reader (reference src/sample.cpp:4-112).

4-column format ``ID POP GROUP SEX`` with one header line; POP (column 2)
defines the groups.  Groups are collected in first-appearance order then
sorted; each diploid sample contributes two haplotypes (SEX column "1"
marks haploid samples; mixing ploidies is an error).
"""

from __future__ import annotations

import dataclasses
import gzip

import numpy as np


@dataclasses.dataclass
class Sample:
    groups: list[str]
    group_of_haplotype: np.ndarray  # int32 per haplotype
    group_sizes: np.ndarray

    @classmethod
    def read(cls, path: str) -> "Sample":
        try:
            with gzip.open(path, "rt") as fh:
                lines = fh.read().splitlines()
        except (OSError, gzip.BadGzipFile):
            with open(path) as fh:
                lines = fh.read().splitlines()
        rows = [ln.split() for ln in lines[1:] if ln.strip()]
        diploid = True
        for r in rows:
            if len(r) >= 4 and r[3] != "NA":
                if r[3] == "1":
                    diploid = False
                elif not diploid:
                    raise ValueError("Detected both haploid and diploid samples.")
        groups = sorted({r[1] for r in rows})
        gidx = {g: i for i, g in enumerate(groups)}
        goh: list[int] = []
        for r in rows:
            i = gidx[r[1]]
            goh.append(i)
            if diploid:
                goh.append(i)
        goh_arr = np.array(goh, np.int32)
        sizes = np.bincount(goh_arr, minlength=len(groups))
        return cls(groups=groups, group_of_haplotype=goh_arr, group_sizes=sizes)
