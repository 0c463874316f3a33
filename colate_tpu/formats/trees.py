"""Relate anc/mut ↔ tree-sequence table conversion.

The reference carries a 1,868-line header (src/tree_sequence.hpp:29-1868)
converting between Relate's marginal-tree format and tskit ``.trees``
files (DumpAsTreeSequence / ConvertFromTreeSequence); it is compiled into
relate_lib but not called by any Colate/CoalRate mode.  This module is
the TPU-framework counterpart: the conversion itself is pure columnar
array shuffling (no tskit C library needed), emitting the standard
node/edge/site/mutation tables.  When the optional ``tskit`` Python
package is importable the tables can be materialised as a real
``tskit.TreeSequence``; otherwise they can be written in tskit's text
format (``tskit load_text`` compatible).

Like the reference conversion, marginal trees do not share internal
nodes: each tree contributes 2N-1 fresh internal node rows; sample nodes
0..N-1 are shared across trees.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from colate_tpu.formats.anc import AncFile, node_ages
from colate_tpu.formats.mut import MutTable


@dataclasses.dataclass
class TreeSequenceTables:
    """Columnar node/edge/site/mutation tables (tskit semantics)."""

    # nodes
    node_time: np.ndarray  # [num_nodes] float64
    node_is_sample: np.ndarray  # [num_nodes] bool
    # edges (sorted by left, then parent time — tskit requirement)
    edge_left: np.ndarray  # [num_edges] float64 (bp, 0-based half-open)
    edge_right: np.ndarray  # [num_edges] float64
    edge_parent: np.ndarray  # [num_edges] int64
    edge_child: np.ndarray  # [num_edges] int64
    # sites + mutations (one mutation per site, like Relate)
    site_pos: np.ndarray  # [num_sites] float64
    site_ancestral: np.ndarray  # [num_sites] object (str)
    mut_site: np.ndarray  # [num_sites] int64
    mut_node: np.ndarray  # [num_sites] int64
    mut_derived: np.ndarray  # [num_sites] object (str)
    sequence_length: float

    def to_tskit(self):
        """Materialise as a tskit.TreeSequence (requires tskit)."""
        import tskit

        tables = tskit.TableCollection(sequence_length=self.sequence_length)
        for i in range(self.node_time.shape[0]):
            tables.nodes.add_row(
                flags=tskit.NODE_IS_SAMPLE if self.node_is_sample[i] else 0,
                time=float(self.node_time[i]),
            )
        for i in range(self.edge_left.shape[0]):
            tables.edges.add_row(
                left=float(self.edge_left[i]),
                right=float(self.edge_right[i]),
                parent=int(self.edge_parent[i]),
                child=int(self.edge_child[i]),
            )
        for i in range(self.site_pos.shape[0]):
            s = tables.sites.add_row(
                position=float(self.site_pos[i]),
                ancestral_state=str(self.site_ancestral[i]),
            )
            tables.mutations.add_row(
                site=s, node=int(self.mut_node[i]),
                derived_state=str(self.mut_derived[i]),
            )
        tables.sort()
        return tables.tree_sequence()

    def write_text(self, prefix: str) -> None:
        """tskit ``load_text``-compatible node/edge/site/mutation files."""
        with open(prefix + ".nodes.txt", "w") as fh:
            fh.write("id\tis_sample\ttime\n")
            for i in range(self.node_time.shape[0]):
                fh.write(
                    f"{i}\t{int(self.node_is_sample[i])}\t{self.node_time[i]:.17g}\n"
                )
        with open(prefix + ".edges.txt", "w") as fh:
            fh.write("left\tright\tparent\tchild\n")
            for i in range(self.edge_left.shape[0]):
                fh.write(
                    f"{self.edge_left[i]:.17g}\t{self.edge_right[i]:.17g}\t"
                    f"{self.edge_parent[i]}\t{self.edge_child[i]}\n"
                )
        with open(prefix + ".sites.txt", "w") as fh:
            fh.write("position\tancestral_state\n")
            for i in range(self.site_pos.shape[0]):
                fh.write(f"{self.site_pos[i]:.17g}\t{self.site_ancestral[i]}\n")
        with open(prefix + ".mutations.txt", "w") as fh:
            fh.write("site\tnode\tderived_state\n")
            for i in range(self.mut_site.shape[0]):
                fh.write(
                    f"{self.mut_site[i]}\t{self.mut_node[i]}\t{self.mut_derived[i]}\n"
                )


def anc_to_tables(anc: AncFile, mut: MutTable) -> TreeSequenceTables:
    """DumpAsTreeSequence equivalent (tree_sequence.hpp:281-560 semantics):
    tree t spans bp [pos(start_snp_t), pos(start_snp_{t+1})); internal
    nodes are fresh per tree; mutations with exactly one mapped branch
    become (site, mutation) rows on that branch's per-tree node id."""
    T = anc.num_trees
    N = anc.n_hap
    M = 2 * N - 1
    ages = node_ages(anc).astype(np.float64)

    mut_pos = mut.pos.astype(np.float64)
    # genomic span of each tree: bp of its first SNP .. bp of next tree's
    left_bp = mut_pos[np.clip(anc.start_pos, 0, len(mut) - 1)]
    right_bp = np.append(left_bp[1:], mut_pos[-1] + 1.0)
    seq_len = float(mut_pos[-1] + 1.0)
    left_bp[0] = 0.0  # first tree starts at the origin (tree_sequence.hpp:418)

    # nodes: samples 0..N-1 then T blocks of M-N internal nodes
    n_internal = M - N
    node_time = np.concatenate(
        [
            (anc.sample_ages if anc.sample_ages is not None else np.zeros(N)),
            (ages[:, N:]).reshape(-1),
        ]
    ).astype(np.float64)
    node_is_sample = np.zeros(node_time.shape[0], bool)
    node_is_sample[:N] = True

    def gid(t: int, node: np.ndarray) -> np.ndarray:
        """global node id for per-tree node index."""
        node = np.asarray(node)
        return np.where(node < N, node, N + t * n_internal + (node - N))

    # edges: every non-root node contributes one edge per tree
    e_left, e_right, e_parent, e_child = [], [], [], []
    for t in range(T):
        par = anc.parent[t]
        child = np.nonzero(par >= 0)[0]
        e_left.append(np.full(child.shape[0], left_bp[t]))
        e_right.append(np.full(child.shape[0], right_bp[t]))
        e_parent.append(gid(t, par[child]))
        e_child.append(gid(t, child))
    edge_left = np.concatenate(e_left)
    edge_right = np.concatenate(e_right)
    edge_parent = np.concatenate(e_parent).astype(np.int64)
    edge_child = np.concatenate(e_child).astype(np.int64)

    # sites/mutations: rows with exactly one mapped branch
    rows = [i for i in range(len(mut)) if mut.num_branches[i] == 1]
    site_pos, site_anc, mut_node, mut_der = [], [], [], []
    for i in rows:
        t = int(mut.tree[i])
        if not (0 <= t < T):
            continue
        b = int(mut.branch[i][0])
        if not (0 <= b < M) or anc.parent[t][b] < 0:
            continue
        mt = mut.mutation_type[i]
        a, d = (mt.split("/", 1) + [""])[:2] if "/" in mt else (mt, "")
        site_pos.append(float(mut.pos[i]))
        site_anc.append(a)
        mut_node.append(int(gid(t, np.array([b]))[0]))
        mut_der.append(d)

    ns = len(site_pos)
    return TreeSequenceTables(
        node_time=node_time,
        node_is_sample=node_is_sample,
        edge_left=edge_left,
        edge_right=edge_right,
        edge_parent=edge_parent,
        edge_child=edge_child,
        site_pos=np.array(site_pos, np.float64),
        site_ancestral=np.array(site_anc, object),
        mut_site=np.arange(ns, dtype=np.int64),
        mut_node=np.array(mut_node, np.int64),
        mut_derived=np.array(mut_der, object),
        sequence_length=seq_len,
    )


def tables_to_anc(tables: TreeSequenceTables, n_hap: int) -> AncFile:
    """ConvertFromTreeSequence equivalent (tree_sequence.hpp:563-900
    semantics, restricted to Relate-shaped inputs: binary trees, no
    shared internal nodes): rebuild per-tree parent/branch arrays from
    the edge intervals."""
    # breakpoints = unique edge lefts
    lefts = np.unique(tables.edge_left)
    T = lefts.shape[0]
    M = 2 * n_hap - 1
    parent = np.full((T, M), -1, np.int32)
    blen = np.zeros((T, M), np.float64)
    start_pos = np.zeros(T, np.int64)
    site_pos = tables.site_pos
    for t, lo in enumerate(lefts):
        sel = np.nonzero(
            (tables.edge_left <= lo)
            & (tables.edge_right > lo)
        )[0]
        # map global ids back to per-tree: samples keep ids, internal
        # ids are densified by time order
        gids = np.unique(
            np.concatenate([tables.edge_parent[sel], tables.edge_child[sel]])
        )
        internal = gids[gids >= n_hap]
        order = internal[np.argsort(tables.node_time[internal], kind="stable")]
        lid = {int(g): n_hap + k for k, g in enumerate(order)}
        for g in range(n_hap):
            lid[g] = g
        for e in sel:
            c = lid[int(tables.edge_child[e])]
            p = lid[int(tables.edge_parent[e])]
            parent[t, c] = p
            blen[t, c] = (
                tables.node_time[tables.edge_parent[e]]
                - tables.node_time[tables.edge_child[e]]
            )
        start_pos[t] = np.searchsorted(site_pos, lo, side="left") if site_pos.size else 0
    return AncFile(
        n_hap=n_hap,
        sample_ages=(
            tables.node_time[:n_hap].copy()
            if np.any(tables.node_time[:n_hap] != 0)
            else None
        ),
        start_pos=start_pos,
        parent=parent,
        branch_length=blen,
        num_events=np.zeros((T, M), np.float32),
        snp_begin=np.zeros((T, M), np.int32),
        snp_end=np.zeros((T, M), np.int32),
    )
