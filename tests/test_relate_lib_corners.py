"""relate_lib surface corners: the AncMutIterators .dist-file span
constructor (mutations.cpp:399-465) and the AncesTree cross-tree branch
association (anc.cpp:1231-1492).  Neither is reachable from any
reference *mode*, so the oracles are brute-force twins."""

import numpy as np
import pytest

from colate_tpu.formats.anc import AncFile
from colate_tpu.formats.mut import MutTable
from helpers.synth_anc import make_anc_mut


# ---------------------------------------------------------------- .dist ----

def _brute_spans_dist(mut, fpos, fdist, T):
    """Literal cursor replay of NextTree with a .dist file
    (mutations.cpp:637-668)."""
    spans = np.zeros(T)
    j = 0
    row = 0
    n = len(mut)
    for t in range(T):
        if row >= n or mut.tree[row] != t:
            continue  # tree without mutations: 0.0
        while j < fpos.size and fpos[j] < mut.pos[row]:
            j += 1
        s = fdist[j - 1] / 2.0 if j > 0 else 0.0
        while row < n and mut.tree[row] == t:
            assert fpos[j] == mut.pos[row]
            s += fdist[j]
            j += 1
            row += 1
        if j < fpos.size:
            s -= fdist[j - 1] / 2.0
        spans[t] = s
    return spans


def test_tree_spans_dist_matches_cursor(tmp_path):
    from colate_tpu.models.tree_coal import tree_spans_dist

    prefix = str(tmp_path / "d")
    make_anc_mut(prefix, "1", N=6, num_trees=23, seed=7, skip_trees=(4, 11))
    anc = AncFile.read(prefix + "_chr1.anc")
    mut = MutTable.read(prefix + "_chr1.mut")
    g = np.random.default_rng(2)
    # .dist file: every mut position plus interleaved extra positions
    # (the cursor skips those before a tree's first row)
    extra = np.setdiff1d(
        g.integers(1, int(mut.pos[-1]) + 50, 40), mut.pos
    )
    fpos = np.sort(np.concatenate([mut.pos, extra]))
    # extras must not fall strictly inside a tree's row run (the
    # reference asserts position alignment there): keep only extras
    # below the first or above the last row of each tree... simplest:
    # extras below the first mut position or above the last
    ok = (extra < mut.pos.min()) | (extra > mut.pos.max())
    fpos = np.sort(np.concatenate([mut.pos, extra[ok]]))
    fdist = g.integers(1, 500, fpos.size).astype(np.float64)
    path = str(tmp_path / "c.dist")
    with open(path, "w") as fh:
        fh.write("pos dist\n")
        for p, d in zip(fpos, fdist):
            fh.write(f"{p} {d:.0f}\n")
    got = tree_spans_dist(anc, mut, path)
    want = _brute_spans_dist(mut, fpos, fdist, anc.num_trees)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_tree_spans_dist_rejects_missing_positions(tmp_path):
    from colate_tpu.models.tree_coal import tree_spans_dist

    prefix = str(tmp_path / "d2")
    make_anc_mut(prefix, "1", N=6, num_trees=5, seed=9)
    anc = AncFile.read(prefix + "_chr1.anc")
    mut = MutTable.read(prefix + "_chr1.mut")
    path = str(tmp_path / "bad.dist")
    with open(path, "w") as fh:
        fh.write("pos dist\n1 10\n")
    with pytest.raises(ValueError):
        tree_spans_dist(anc, mut, path)


def test_tree_mode_dist_flag(tmp_path):
    """--dist spans flow into the estimator: a doubled .dist doubles
    every span, so num/denom double and the rates are unchanged."""
    from colate_tpu.models.tree_coal import (
        accumulate_tree_stats, epochs_from_bins_tree,
    )

    prefix = str(tmp_path / "d3")
    make_anc_mut(prefix, "1", N=6, num_trees=9, seed=5)
    anc = AncFile.read(prefix + "_chr1.anc")
    mut = MutTable.read(prefix + "_chr1.mut")
    path = str(tmp_path / "c.dist")
    with open(path, "w") as fh:
        fh.write("pos dist\n")
        for p, d in zip(mut.pos, mut.dist):
            fh.write(f"{p} {2 * int(d)}\n")
    epochs = epochs_from_bins_tree("1,6,0.5", 28.0)
    E = epochs.shape[0]
    a = np.zeros((4, E)); b = np.zeros((4, E))
    accumulate_tree_stats(anc, mut, epochs, 0, a, b, backend="numpy")
    a2 = np.zeros((4, E)); b2 = np.zeros((4, E))
    accumulate_tree_stats(anc, mut, epochs, 0, a2, b2, backend="numpy",
                          dist_file=path)
    np.testing.assert_allclose(a2, 2 * a, rtol=1e-6)
    np.testing.assert_allclose(b2, 2 * b, rtol=1e-6)


# ------------------------------------------------- branch association ----

def _anc_with_parents(parents, N):
    T = len(parents)
    M = 2 * N - 1
    par = np.array(parents, np.int32)
    return AncFile(
        n_hap=N, sample_ages=None, start_pos=np.arange(T, dtype=np.int64),
        parent=par, branch_length=np.ones((T, M)),
        num_events=np.ones((T, M), np.float32),
        snp_begin=np.tile(np.arange(T, dtype=np.int32)[:, None], (1, M)),
        snp_end=np.tile(np.arange(T, dtype=np.int32)[:, None] + 1, (1, M)),
    )


def test_branch_association_identity():
    """Identical adjacent trees pair every branch with itself, and the
    forward pass accumulates num_events along the chain."""
    from colate_tpu.formats.branch_assoc import (
        associate_equivalent_branches, branch_association,
    )

    N = 4
    # caterpillar: (((0,1),2),3)  -> parents
    p = [4, 4, 5, 6, 5, 6, -1]
    eq = branch_association(np.array(p), np.array(p), N)
    np.testing.assert_array_equal(eq[:-1], np.arange(len(p) - 1))
    assert eq[-1] == -1  # root never pairs

    anc = _anc_with_parents([p, p, p], N)
    maps = associate_equivalent_branches(anc)
    assert len(maps) == 2
    # forward pass accumulated 1+1+1 events on every non-root branch of
    # the last tree, then the backward pass copied totals to all trees
    np.testing.assert_array_equal(anc.num_events[0, :-1], 3.0)
    np.testing.assert_array_equal(anc.num_events[2, :-1], 3.0)
    # SNP ranges span the whole chain
    np.testing.assert_array_equal(anc.snp_begin[2, :-1], 0)
    np.testing.assert_array_equal(anc.snp_end[0, :-1], 3)


def test_branch_association_disjoint_topologies():
    """A topology change breaks equivalence for the branches whose leaf
    sets changed, while untouched cherries stay paired."""
    from colate_tpu.formats.branch_assoc import branch_association

    N = 4
    pa = [4, 4, 5, 6, 5, 6, -1]  # ((0,1),2),3
    pb = [4, 4, 6, 5, 5, 6, -1]  # ((0,1),3),2
    eq = branch_association(np.array(pa), np.array(pb), N)
    # cherry LEAVES pair on sibling identity alone (anc.cpp:1274-1327)
    assert eq[0] == 0 and eq[1] == 1
    # the cherry's own branch does NOT pair: its parent's leaf set
    # changed {0,1,2}->{0,1,3} and the reference demands the parent
    # correlation too (Pearson = 0 here at N=4)
    assert eq[4] == -1
    assert eq[5] == -1  # {0,1,3} vs {0,1,2}: self-correlation 0
    assert eq[6] == -1  # root


def test_branch_association_permuted_internal_labels():
    """The same topology with internal nodes renumbered still pairs via
    the leaf-count-sorted exact scan."""
    from colate_tpu.formats.branch_assoc import branch_association

    N = 4
    pa = [4, 4, 5, 6, 5, 6, -1]           # cherry parent = 4, then 5, 6
    # same topology, internal labels 4<->5 swapped (children may sit
    # ABOVE their parent label — importer numbering)
    pb = [5, 5, 4, 6, 6, 4, -1]
    eq = branch_association(np.array(pa), np.array(pb), N)
    assert eq[5] == 4   # tree-b node 5 (cherry {0,1}) == tree-a node 4
    assert eq[4] == 5   # tree-b node 4 ({0,1,2}) == tree-a node 5
