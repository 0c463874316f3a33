"""anc/mut ↔ tree-sequence table conversion round-trip."""

import numpy as np

from colate_tpu.formats.anc import AncFile, node_ages
from colate_tpu.formats.mut import MutTable
from colate_tpu.formats.trees import anc_to_tables, tables_to_anc
from helpers.synth_anc import make_anc_mut


def _fixture(tmp_path, n_hap=6, n_trees=5):
    prefix = str(tmp_path / "t")
    make_anc_mut(prefix, "1", N=n_hap, num_trees=n_trees, snps_per_tree=8,
                 seed=11)
    return (
        AncFile.read(prefix + "_chr1.anc"),
        MutTable.read(prefix + "_chr1.mut", fast=False),
    )


def test_tables_shapes_and_times(tmp_path):
    anc, mut = _fixture(tmp_path)
    tb = anc_to_tables(anc, mut)
    N, T = anc.n_hap, anc.num_trees
    M = 2 * N - 1
    assert tb.node_time.shape[0] == N + T * (M - N)
    assert tb.edge_left.shape[0] == T * (M - 1)
    assert np.all(tb.node_time[: N] == 0)
    # edge intervals tile [0, seq_len)
    assert tb.edge_left.min() == 0.0
    assert tb.edge_right.max() == tb.sequence_length
    # parents are strictly older than children
    assert np.all(
        tb.node_time[tb.edge_parent] > tb.node_time[tb.edge_child] - 1e-9
    )


def test_mutations_land_on_their_branch(tmp_path):
    anc, mut = _fixture(tmp_path)
    tb = anc_to_tables(anc, mut)
    rows = [i for i in range(len(mut)) if mut.num_branches[i] == 1
            and 0 <= int(mut.tree[i]) < anc.num_trees]
    assert tb.site_pos.shape[0] > 0
    assert tb.site_pos.shape[0] <= len(rows)
    # every mutation node exists and is not a root at its site's tree
    assert np.all(tb.mut_node < tb.node_time.shape[0])


def test_round_trip_parents(tmp_path):
    anc, mut = _fixture(tmp_path)
    tb = anc_to_tables(anc, mut)
    anc2 = tables_to_anc(tb, anc.n_hap)
    assert anc2.num_trees == anc.num_trees
    # node ages are reconstructed exactly (internal relabelling may
    # permute same-age nodes; compare age multisets and topology via
    # child-age -> parent-age maps)
    a1 = node_ages(anc)
    a2 = node_ages(anc2)
    for t in range(anc.num_trees):
        np.testing.assert_allclose(
            np.sort(a1[t]), np.sort(a2[t]), rtol=1e-6, atol=1e-6
        )
        # leaf parent ages match exactly per leaf
        p1 = anc.parent[t][: anc.n_hap]
        p2 = anc2.parent[t][: anc.n_hap]
        np.testing.assert_allclose(a1[t][p1], a2[t][p2], rtol=1e-6, atol=1e-6)


def test_text_dump(tmp_path):
    anc, mut = _fixture(tmp_path)
    tb = anc_to_tables(anc, mut)
    tb.write_text(str(tmp_path / "ts"))
    nodes = open(tmp_path / "ts.nodes.txt").read().splitlines()
    edges = open(tmp_path / "ts.edges.txt").read().splitlines()
    assert nodes[0] == "id\tis_sample\ttime"
    assert len(nodes) == 1 + tb.node_time.shape[0]
    assert len(edges) == 1 + tb.edge_left.shape[0]
