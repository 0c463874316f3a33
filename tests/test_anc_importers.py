"""Genealogy importers: plain newick, RENT+, ARGweaver SMC → AncFile."""

import numpy as np

from colate_tpu.formats.anc import (
    node_ages,
    read_argweaver_smc,
    read_newick_trees,
    read_rent,
)

# the 4-leaf tree used throughout:
#       6
#      / \
#     4   5
#    /|   |\
#   0 1   2 3
# branch lengths: 0,1 -> 1.0, 2 -> 2.0, 3 -> 2.5, 4 -> 3.0, 5 -> 1.5


def test_read_newick_trees(tmp_path):
    p = str(tmp_path / "t.newick")
    with open(p, "w") as fh:
        fh.write("100 ((0:1.0,1:1.0):3.0,(2:2.0,3:2.5):1.5);\n")
        fh.write("200 ((0:1.0,2:1.0):3.0,(1:2.0,3:2.5):1.5);\n")
    anc = read_newick_trees(p, ne=1.0)
    assert anc.n_hap == 4 and anc.num_trees == 2
    assert list(anc.start_pos) == [100, 200]
    # reduction order: (0,1) -> node 4, (2,3) -> node 5, (4,5) -> node 6
    np.testing.assert_array_equal(anc.parent[0], [4, 4, 5, 5, 6, 6, -1])
    np.testing.assert_allclose(
        anc.branch_length[0], [1.0, 1.0, 2.0, 2.5, 3.0, 1.5, 0.0]
    )
    ages = node_ages(anc)
    assert ages[0, 6] == np.float32(4.0)  # max(1+3, 2.5+1.5)


def test_read_newick_ne_scaling_and_drop(tmp_path):
    p = str(tmp_path / "t.newick")
    with open(p, "w") as fh:
        fh.write("1 ((0:0.5,1:0.5):1.0,(2:1.0,3:1.0):0.5);\n")
        fh.write("2 ((0:0.5,1:0.5,2:1.0):1.0,3:1.0);\n")  # non-binary: dropped
    anc = read_newick_trees(p, ne=100.0)
    assert anc.num_trees == 1
    np.testing.assert_allclose(anc.branch_length[0][:4], [50, 50, 100, 100])


def test_read_rent(tmp_path):
    p = str(tmp_path / "t.rent")
    with open(p, "w") as fh:
        # 1-based leaves, coalescent-unit branch lengths
        fh.write("10 ((1:0.1,2:0.1):0.3,(3:0.2,4:0.25):0.15)\n")
    anc = read_rent(p, ne=10.0)
    assert anc.n_hap == 4 and anc.num_trees == 1
    np.testing.assert_array_equal(anc.parent[0], [4, 4, 5, 5, 6, 6, -1])
    np.testing.assert_allclose(
        anc.branch_length[0],
        np.float32([1.0, 1.0, 2.0, 2.5, 3.0, 1.5, 0.0]),
        rtol=1e-6,
    )


def test_read_argweaver_smc(tmp_path):
    p = str(tmp_path / "t.smc")
    with open(p, "w") as fh:
        # NAMES maps newick leaf id i -> haplotype NAMES[i]-1
        fh.write("NAMES\t1\t2\t3\t4\n")
        fh.write("REGION\tchr\t1\t1000\n")
        # explicit internal labels after ')', NHX annotations, root last
        fh.write(
            "TREE\t55\t500\t"
            "((0:1.0[&&NHX:age=0],1:1.0[&&NHX:age=0])4:3.0[&&NHX:age=1],"
            "(2:2.0[&&NHX:age=0],3:2.5[&&NHX:age=0])5:1.5[&&NHX:age=1])"
            "6[&&NHX:age=4.5];\n"
        )
    anc = read_argweaver_smc(p)
    assert anc.n_hap == 4 and anc.num_trees == 1
    assert anc.start_pos[0] == 55
    np.testing.assert_array_equal(anc.parent[0], [4, 4, 5, 5, 6, 6, -1])
    np.testing.assert_allclose(
        anc.branch_length[0], [1.0, 1.0, 2.0, 2.5, 3.0, 1.5, 0.0]
    )


def test_argweaver_root_relabel(tmp_path):
    """Root label not 2N-2: importer swaps it into the last slot
    (anc.cpp:869-930)."""
    p = str(tmp_path / "t.smc")
    with open(p, "w") as fh:
        fh.write("NAMES\t1\t2\t3\t4\n")
        fh.write(
            "TREE\t7\t99\t"
            "((0:1.0,1:1.0)6:3.0,(2:2.0,3:2.5)5:1.5)4;\n"
        )
    anc = read_argweaver_smc(p)
    par = anc.parent[0]
    assert par[2 * 4 - 2] == -1  # root in last slot
    ages = node_ages(anc)
    assert ages[0, 6] == np.float32(4.0)
