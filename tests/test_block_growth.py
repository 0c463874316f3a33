"""Block accumulators must grow past any fixed cap (VERDICT r2 weak #7).

The reference caps block arrays at 500 entries (coal.cpp:3139-3153) and
would silently misbehave beyond; the engine instead grows its
accumulators on demand — these tests pin that for all three holders:
GrowableBlockHists (split-mode parity replay), CoalLA, and
run_tree_mode's inline growth.
"""

import numpy as np
import pytest

from colate_tpu.pipeline.binning import GrowableBlockHists


def test_growable_hists_preserves_content():
    h = GrowableBlockHists(nbins=8, initial_blocks=2)
    shared, *_ = h
    shared[1, 3] = 7.0
    h.ensure(5)
    arrs = list(h)
    assert arrs[0].shape[0] >= 5
    assert arrs[0][1, 3] == 7.0
    assert all(a.shape == arrs[0].shape for a in arrs)
    # idempotent / never shrinks
    h.ensure(3)
    assert list(h)[0].shape[0] >= 5


def test_coal_la_ensure_blocks_growth():
    from colate_tpu.models.local_ancestry import CoalLA

    est = CoalLA(np.array([0.0, 1.0, 10.0]), num_groups=2, max_blocks=1)
    est.num[0, 1, 0, 1] = 3.0
    est._ensure_blocks(9)
    assert est.num.shape[0] >= 9
    assert est.denom.shape == est.num.shape
    assert est.num[0, 1, 0, 1] == 3.0
    assert est.denom.sum() == 0.0


def test_tree_mode_grows_past_initial(tmp_path, monkeypatch):
    """run_tree_mode with a 1-block initial allocation must still produce
    the same .coal as with the default allocation."""
    import argparse
    import os

    from colate_tpu.models import tree_coal
    from helpers.synth_anc import make_anc_mut

    prefix = str(tmp_path / "fix" / "synth")
    os.makedirs(str(tmp_path / "fix"))
    chroms = ["1", "2", "3"]
    for i, c in enumerate(chroms):
        make_anc_mut(prefix, c, N=6, num_trees=30, seed=3 + i)
    chrfile = str(tmp_path / "fix" / "chr.txt")
    with open(chrfile, "w") as fh:
        fh.write("\n".join(chroms) + "\n")

    def run(out):
        args = argparse.Namespace(
            input=prefix,
            output=out,
            bins="2,6,0.5",
            years_per_gen=None,
            num_bootstraps=2,
            chr_file=chrfile,
            coal=None,
        )
        assert tree_coal.run_tree_mode(args) == 0
        with open(out + ".coal") as fh:
            return fh.read()

    base = run(str(tmp_path / "a"))
    monkeypatch.setattr(tree_coal, "_INITIAL_BLOCKS", 1)
    grown = run(str(tmp_path / "b"))
    assert base == grown
