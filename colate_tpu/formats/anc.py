"""Columnar reader/writer for Relate ``.anc`` marginal-tree files.

Format (reference src/mutations.cpp:342-397, src/anc.cpp:6-47, 494-546)::

    NUM_HAPLOTYPES <N> [sample_age x N]
    NUM_TREES <M>
    <start_snp>: <parent>:(<branch_length> <num_events> <SNP_begin> <SNP_end>) ... x (2N-1)

Each tree line holds 2N-1 node records in node-index order (leaves
0..N-1, internal N..2N-2); ``parent`` is -1 for the root.  All trees of
a file share N, so the whole file loads into dense [num_trees, 2N-1]
arrays — the natural layout for batched (TPU) tree kernels.
"""

from __future__ import annotations

import dataclasses
import gzip
import os
import re

import numpy as np


@dataclasses.dataclass
class AncFile:
    n_hap: int  # N (number of haplotypes/tips)
    sample_ages: np.ndarray | None  # [N] float64 or None
    start_pos: np.ndarray  # [T] int64: SNP index at which each tree starts
    parent: np.ndarray  # [T, 2N-1] int32 (-1 for root)
    branch_length: np.ndarray  # [T, 2N-1] float64
    num_events: np.ndarray  # [T, 2N-1] float32
    snp_begin: np.ndarray  # [T, 2N-1] int32
    snp_end: np.ndarray  # [T, 2N-1] int32

    @property
    def num_trees(self) -> int:
        return int(self.start_pos.shape[0])

    @classmethod
    def read(cls, path: str) -> "AncFile":
        if not os.path.exists(path) and os.path.exists(path + ".gz"):
            path = path + ".gz"
        try:
            with gzip.open(path, "rt") as fh:
                data = fh.read()
        except (OSError, gzip.BadGzipFile):
            with open(path, "rt") as fh:
                data = fh.read()
        lines = data.splitlines()
        h1 = lines[0].split()
        n_hap = int(h1[1])
        ages = None
        if len(h1) >= 2 + n_hap:
            try:
                ages = np.array([float(x) for x in h1[2 : 2 + n_hap]], np.float64)
            except ValueError:
                ages = None
        num_trees = int(lines[1].split()[1])
        tree_lines = [ln for ln in lines[2:] if ln.strip()]
        if len(tree_lines) < num_trees:
            raise ValueError(
                f"{path}: header claims {num_trees} trees, found {len(tree_lines)}"
            )
        tree_lines = tree_lines[:num_trees]
        n_nodes = 2 * n_hap - 1
        start_pos = np.empty(num_trees, np.int64)
        parent = np.empty((num_trees, n_nodes), np.int32)
        blen = np.empty((num_trees, n_nodes), np.float64)
        nev = np.empty((num_trees, n_nodes), np.float32)
        sb = np.empty((num_trees, n_nodes), np.int32)
        se = np.empty((num_trees, n_nodes), np.int32)
        # "<pos>: p:(bl ev sb se) p:(...) ..." — one regex pass per line
        rec_re = re.compile(
            r"(-?\d+):\(([-+0-9.eE]+)\s+([-+0-9.eE]+)\s+(\d+)\s+(\d+)\)"
        )
        for t, ln in enumerate(tree_lines):
            colon = ln.index(":")
            start_pos[t] = int(ln[:colon])
            recs = rec_re.findall(ln, colon + 1)
            if len(recs) != n_nodes:
                raise ValueError(
                    f"{path}: tree {t} has {len(recs)} node records, expected {n_nodes}"
                )
            for j, (p, b, e, s1, s2) in enumerate(recs):
                parent[t, j] = int(p)
                blen[t, j] = float(b)
                nev[t, j] = float(e)
                sb[t, j] = int(s1)
                se[t, j] = int(s2)
        return cls(
            n_hap=n_hap,
            sample_ages=ages,
            start_pos=start_pos,
            parent=parent,
            branch_length=blen,
            num_events=nev,
            snp_begin=sb,
            snp_end=se,
        )

    def write(self, path: str) -> None:
        """Dump in the reference layout (anc.cpp:523-540 record format)."""
        with open(path, "w") as fh:
            fh.write(f"NUM_HAPLOTYPES {self.n_hap}")
            if self.sample_ages is not None:
                for a in self.sample_ages:
                    fh.write(f" {a:g}")
            fh.write("\n")
            fh.write(f"NUM_TREES {self.num_trees}\n")
            for t in range(self.num_trees):
                parts = [f"{self.start_pos[t]}:"]
                for j in range(self.parent.shape[1]):
                    parts.append(
                        f"{self.parent[t, j]}:({self.branch_length[t, j]:.5f} "
                        f"{self.num_events[t, j]:.3f} {self.snp_begin[t, j]} "
                        f"{self.snp_end[t, j]})"
                    )
                fh.write(" ".join(parts) + " \n")


def node_ages(anc: AncFile) -> np.ndarray:
    """[T, 2N-1] float32 node ages (coordinates).

    Matches Tree::GetCoordinates (anc.cpp:280-334): age(node) = max over
    children of (age(child) + branch_length(child)), leaves at 0 or their
    sample age; each node's value is rounded to float32 like the
    reference's ``std::vector<float> coordinates``.
    """
    T, M = anc.parent.shape
    N = anc.n_hap
    coords = np.zeros((T, M), np.float32)
    if anc.sample_ages is not None and anc.sample_ages.size:
        coords[:, :N] = anc.sample_ages[None, :].astype(np.float32)

    ordered = bool(
        np.all((anc.parent > np.arange(M)[None, :]) | (anc.parent < 0))
    )
    if ordered:
        # Relate numbers parents after children: one ascending pass,
        # vectorised across trees; each node f32-rounds once like the
        # reference's float coordinates array.
        acc = np.full((T, M), -np.inf)
        rows = np.arange(T)
        for j in range(M):
            if j >= N:
                coords[:, j] = acc[:, j].astype(np.float32)
            p = anc.parent[:, j]
            valid = p >= 0
            vals = coords[:, j].astype(np.float64) + anc.branch_length[:, j]
            np.maximum.at(acc, (rows[valid], p[valid]), vals[valid])
        return coords

    # fallback: per-tree post-order (arbitrary node numbering)
    for t in range(T):
        par = anc.parent[t]
        kids: dict[int, list[int]] = {}
        for j in range(M):
            if par[j] >= 0:
                kids.setdefault(int(par[j]), []).append(j)
        root = int(np.nonzero(par < 0)[0][0])
        post: list[int] = []
        dfs = [root]
        while dfs:
            u = dfs.pop()
            post.append(u)
            dfs.extend(kids.get(u, []))
        for u in reversed(post):
            cs = kids.get(u, [])
            if cs:
                coords[t, u] = np.float32(
                    max(float(coords[t, c]) + anc.branch_length[t, c] for c in cs)
                )
    return coords
