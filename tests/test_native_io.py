"""Native C++ decoders must agree exactly with the pure-Python readers."""

import numpy as np
import pytest

from colate_tpu import native
from colate_tpu.formats.colate_in import _read_colate_in_py, write_colate_in
from colate_tpu.formats.mut import MutTable
from helpers.synth import make_mut

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable"
)


def test_mut_native_matches_python(tmp_path):
    path = str(tmp_path / "t.mut")
    make_mut(path, 500, seed=3, chrom_span=50_000, dirty=True)
    a = MutTable._read_native(path)
    b = MutTable.read(path, fast=False)  # reference-grammar line parser
    assert a is not None
    assert len(a) == len(b)
    assert a.header == b.header
    for c in ("snp_id", "pos", "dist", "tree", "flipped", "num_branches",
              "age_begin", "age_end"):
        np.testing.assert_array_equal(getattr(a, c), getattr(b, c), err_msg=c)
    for i in range(len(a)):
        assert a.mutation_type[i] == b.mutation_type[i]
        assert a.rs_id[i] == b.rs_id[i]
        assert a.branch[i] == b.branch[i]
        assert a.rest[i] == b.rest[i]
    from colate_tpu.pipeline.join import _allele_codes

    anc_p, der_p, val_p = _allele_codes(b.mutation_type)
    np.testing.assert_array_equal(a.anc_code, anc_p)
    np.testing.assert_array_equal(a.der_code, der_p)
    np.testing.assert_array_equal(a.allele_valid, val_p)


def test_mut_native_gz_fallback(tmp_path):
    import gzip

    path = str(tmp_path / "t.mut")
    make_mut(path, 50, seed=4, chrom_span=5_000)
    with open(path, "rb") as fh:
        data = fh.read()
    with gzip.open(path + ".gz", "wb") as fh:
        fh.write(data)
    import os

    os.remove(path)
    a = MutTable._read_native(path)  # resolves t.mut.gz like the reference
    assert a is not None and len(a) == 50


def test_colate_in_native_matches_python(tmp_path):
    g = np.random.default_rng(9)
    n = 2000
    chrom = np.concatenate(
        [np.full(800, "1", object), np.full(700, "X", object),
         np.full(500, "22", object)]
    )
    bp = np.sort(g.integers(1, 1_000_000, n)).astype(np.int32)
    anc = g.choice(np.frombuffer(b"ACGT", np.uint8), n)
    der = g.choice(np.frombuffer(b"ACGT", np.uint8), n)
    aaf = g.integers(0, 30, n).astype(np.int32)
    daf = g.integers(0, 30, n).astype(np.int32)
    path = str(tmp_path / "x.colate.in")
    write_colate_in(path, chrom, bp, anc, der, aaf, daf)
    from colate_tpu.formats.colate_in import _read_colate_in_native

    a = _read_colate_in_native(path)
    b = _read_colate_in_py(path)
    assert a is not None
    np.testing.assert_array_equal(a.bp, b.bp)
    np.testing.assert_array_equal(a.anc, b.anc)
    np.testing.assert_array_equal(a.der, b.der)
    np.testing.assert_array_equal(a.aaf, b.aaf)
    np.testing.assert_array_equal(a.daf, b.daf)
    assert list(a.chrom) == list(b.chrom)


def test_join_tmptmp_native_matches_python(tmp_path):
    from colate_tpu.formats.colate_in import read_colate_in
    from colate_tpu.formats.mut import MutTable as MT
    from colate_tpu.pipeline.join import join_tmptmp
    from helpers.synth import make_fixture

    fix = make_fixture(str(tmp_path / "fix"), n_per_chrom=3000, seed=55)
    mts = [MT.read(f) for f in
           [f"{fix['mut_prefix']}_chr{c}.mut" for c in fix["chroms"]]]
    tgt = read_colate_in(fix["target"])
    ref = read_colate_in(fix["reference"])
    a = join_tmptmp(fix["chroms"], mts, tgt, ref, use_native=True)
    b = join_tmptmp(fix["chroms"], mts, tgt, ref, use_native=False)
    assert len(a) == len(b)
    assert a.num_blocks == b.num_blocks
    np.testing.assert_array_equal(a.block_id, b.block_id)
    np.testing.assert_array_equal(a.age_begin, b.age_begin)
    np.testing.assert_array_equal(a.age_end, b.age_end)
    np.testing.assert_array_equal(a.w_shared, b.w_shared)
    np.testing.assert_array_equal(a.w_notshared, b.w_notshared)
    np.testing.assert_array_equal(a.w_shared_mc, b.w_shared_mc)
    np.testing.assert_array_equal(a.w_notshared_mc, b.w_notshared_mc)


def _staged_hists(fix, tmasks=None, rmasks=None):
    from colate_tpu.formats.colate_in import read_colate_in
    from colate_tpu.formats.mut import MutTable as MT
    from colate_tpu.pipeline.binning import bin_sites_analytic_native
    from colate_tpu.pipeline.join import join_tmptmp

    mts = [MT.read(f) for f in
           [f"{fix['mut_prefix']}_chr{c}.mut" for c in fix["chroms"]]]
    tgt = read_colate_in(fix["target"])
    ref = read_colate_in(fix["reference"])
    sites = join_tmptmp(fix["chroms"], mts, tgt, ref, tmasks, rmasks)
    hists = bin_sites_analytic_native(sites, age=0.0)
    return hists, len(sites), sites.num_blocks, tgt, ref


def _fused_hists(fix, tgt, ref, tmasks=None, rmasks=None):
    from colate_tpu.pipeline.join import fused_tmptmp_hists

    files = [f"{fix['mut_prefix']}_chr{c}.mut" for c in fix["chroms"]]
    return fused_tmptmp_hists(
        fix["chroms"], files, tgt, ref, tmasks, rmasks, 0.0, 0.0
    )


def test_fused_tmptmp_matches_staged(tmp_path):
    from helpers.synth import make_fixture

    fix = make_fixture(str(tmp_path / "fix"), n_per_chrom=2500, seed=91)
    (hs, ns, nb, tgt, ref) = _staged_hists(fix)
    fused = _fused_hists(fix, tgt, ref)
    assert fused is not None
    hf, ns_f, nb_f = fused
    assert (ns_f, nb_f) == (ns, nb)
    for a, b in zip(hf, hs):
        np.testing.assert_array_equal(a, b)


def _stream_hists(fix, tmasks=None, rmasks=None):
    from colate_tpu.pipeline.join import fused_tmptmp_stream, mut_prefilter_native

    files = [f"{fix['mut_prefix']}_chr{c}.mut" for c in fix["chroms"]]
    pf = mut_prefilter_native(files, tmasks, rmasks, 0.0)
    if pf is None:
        return None
    return fused_tmptmp_stream(
        pf, fix["chroms"], fix["target"], fix["reference"], 0.0, 0.0
    )


def test_stream_tmptmp_matches_staged(tmp_path):
    """The chromosome-run streaming join (bounded memory) must be
    bit-equal to the staged whole-file path."""
    from helpers.synth import make_fixture

    fix = make_fixture(str(tmp_path / "fix"), n_per_chrom=2500, seed=91)
    (hs, ns, nb, _, _) = _staged_hists(fix)
    out = _stream_hists(fix)
    assert out is not None
    hf, ns_f, nb_f = out
    assert (ns_f, nb_f) == (ns, nb)
    for a, b in zip(hf, hs):
        np.testing.assert_array_equal(a, b)


def test_stream_tmptmp_masks_and_missing_chrom(tmp_path):
    """Streaming variant of the mask/missing-chromosome semantics: a
    chromosome absent from the streams exhausts the run reader for all
    later chromosomes (the _static_segments overshoot rule)."""
    from helpers.synth import make_fixture

    fix = make_fixture(
        str(tmp_path / "fix"), chroms=("1", "2", "3"), n_per_chrom=1200, seed=77
    )
    g = np.random.default_rng(5)
    tmasks = [
        g.choice(np.frombuffer(b"PN", np.uint8), 2_000_000) for _ in range(3)
    ]
    rmasks = [None, g.choice(np.frombuffer(b"PN", np.uint8), 1_000_000), None]
    (hs, ns, nb, _, _) = _staged_hists(fix, tmasks, rmasks)
    out = _stream_hists(fix, tmasks, rmasks)
    assert out is not None
    hf, ns_f, nb_f = out
    assert (ns_f, nb_f) == (ns, nb)
    for a, b in zip(hf, hs):
        np.testing.assert_array_equal(a, b)

    # request a chromosome the streams don't have, in the middle: later
    # chromosomes must come out empty on both paths
    from colate_tpu.formats.colate_in import read_colate_in
    from colate_tpu.formats.mut import MutTable as MT
    from colate_tpu.pipeline.binning import bin_sites_analytic_native
    from colate_tpu.pipeline.join import (
        fused_tmptmp_stream,
        join_tmptmp,
        mut_prefilter_native,
    )
    import shutil

    chroms2 = ["1", "99", "2"]
    shutil.copy(
        f"{fix['mut_prefix']}_chr1.mut", f"{fix['mut_prefix']}_chr99.mut"
    )
    files2 = [f"{fix['mut_prefix']}_chr{c}.mut" for c in chroms2]
    pf = mut_prefilter_native(files2, None, None, 0.0)
    hf2, ns2, nb2 = fused_tmptmp_stream(
        pf, chroms2, fix["target"], fix["reference"], 0.0, 0.0
    )
    mts = [MT.read(f) for f in files2]
    tgt = read_colate_in(fix["target"])
    ref = read_colate_in(fix["reference"])
    sites = join_tmptmp(chroms2, mts, tgt, ref, None, None)
    hs2 = bin_sites_analytic_native(sites, age=0.0)
    assert (ns2, nb2) == (len(sites), sites.num_blocks)
    for a, b in zip(hf2, hs2):
        np.testing.assert_array_equal(a, b)


def test_fused_tmptmp_with_masks_and_missing_chrom(tmp_path):
    """Masks filter rows; a chromosome absent from the streams exhausts
    the cursor for all later chromosomes (reference EOF behaviour)."""
    from helpers.synth import make_fixture

    fix = make_fixture(
        str(tmp_path / "fix"), chroms=("1", "2", "3"), n_per_chrom=1500, seed=13
    )
    g = np.random.default_rng(5)
    tmasks = [
        g.choice(np.frombuffer(b"PN", np.uint8), 2_000_000) for _ in range(3)
    ]
    rmasks = [None, g.choice(np.frombuffer(b"PN", np.uint8), 1_000_000), None]
    (hs, ns, nb, tgt, ref) = _staged_hists(fix, tmasks, rmasks)
    fused = _fused_hists(fix, tgt, ref, tmasks, rmasks)
    assert fused is not None
    hf, ns_f, nb_f = fused
    assert (ns_f, nb_f) == (ns, nb)
    for a, b in zip(hf, hs):
        np.testing.assert_array_equal(a, b)

    # ask for a chromosome the streams don't have, in the middle
    chroms2 = ["1", "0", "2", "3"]
    from colate_tpu.pipeline.join import fused_tmptmp_hists

    files = [f"{fix['mut_prefix']}_chr{c}.mut" for c in ("1", "2", "3")]
    files.insert(1, files[0])  # reuse chr1's .mut for the phantom "0"
    fused2 = fused_tmptmp_hists(chroms2, files, tgt, ref, None, None)
    # staged path needs the same phantom table list
    from colate_tpu.formats.mut import MutTable as MT
    from colate_tpu.pipeline.binning import bin_sites_analytic_native
    from colate_tpu.pipeline.join import join_tmptmp

    mts = [MT.read(f) for f in files]
    sites2 = join_tmptmp(chroms2, mts, tgt, ref)
    hs2 = bin_sites_analytic_native(sites2, age=0.0)
    assert fused2 is not None
    hf2, ns2_f, nb2_f = fused2
    assert (ns2_f, nb2_f) == (len(sites2), sites2.num_blocks)
    for a, b in zip(hf2, hs2):
        np.testing.assert_array_equal(a, b)


def test_fused_tmptmp_nonzero_age_matches_staged(tmp_path):
    """tmp inputs force age=ref_age=0 in the reference (parse_tmptmp,
    coal.cpp:2073-2074); the fused native path must ignore nonzero
    caller ages exactly like the staged join_tmptmp path does."""
    from helpers.synth import make_fixture

    from colate_tpu.pipeline.join import fused_tmptmp_hists

    fix = make_fixture(str(tmp_path / "fix"), n_per_chrom=2500, seed=91)
    (hs, ns, nb, tgt, ref) = _staged_hists(fix)
    files = [f"{fix['mut_prefix']}_chr{c}.mut" for c in fix["chroms"]]
    fused = fused_tmptmp_hists(
        fix["chroms"], files, tgt, ref, None, None, 0.5, 0.3
    )
    assert fused is not None
    hf, ns_f, nb_f = fused
    assert (ns_f, nb_f) == (ns, nb)
    for a, b in zip(hf, hs):
        np.testing.assert_array_equal(a, b)


def test_run_mut_nonzero_age_fused_matches_staged(tmp_path):
    """End-to-end: mode mut on tmp inputs with nonzero --target_age /
    --reference_age must produce identical rates through the fused
    native path and the staged fallback."""
    from helpers.synth import make_fixture

    from colate_tpu.config import MutRunConfig
    from colate_tpu.models.mut_em import run_mut

    fix = make_fixture(str(tmp_path / "fix"), n_per_chrom=1500, seed=17)

    def cfg(**kw):
        return MutRunConfig(
            mut=fix["mut_prefix"],
            output=str(tmp_path / "out"),
            chr_list=list(fix["chroms"]),
            target_tmp=fix["target"],
            reference_tmp=fix["reference"],
            bins="3,7,0.2",
            seed=5,
            target_age=14000.0,
            reference_age=8000.0,
            **kw,
        )

    res_fused = run_mut(cfg())
    import colate_tpu.pipeline.join as join_mod

    real_pf = join_mod.mut_prefilter_native
    join_mod.mut_prefilter_native = lambda *a, **k: None  # force staged path
    try:
        res_staged = run_mut(cfg())
    finally:
        join_mod.mut_prefilter_native = real_pf
    assert res_fused.num_sites == res_staged.num_sites
    assert res_fused.num_blocks == res_staged.num_blocks
    np.testing.assert_array_equal(res_fused.rates, res_staged.rates)


def test_fused_tmptmp_duplicate_chroms_falls_back(tmp_path):
    from helpers.synth import make_fixture

    fix = make_fixture(str(tmp_path / "fix"), n_per_chrom=200, seed=3)
    from colate_tpu.formats.colate_in import read_colate_in
    from colate_tpu.pipeline.join import fused_tmptmp_hists

    tgt = read_colate_in(fix["target"])
    ref = read_colate_in(fix["reference"])
    files = [f"{fix['mut_prefix']}_chr1.mut"] * 2
    assert fused_tmptmp_hists(["1", "1"], files, tgt, ref, None, None) is None


def test_binning_block_axis_past_512(tmp_path):
    """The device kernel's block axis buckets up to MAX_BLOCKS=65536
    (the reference silently overruns its fixed 500 blocks,
    coal.cpp:3141); 600 blocks must agree between the host-native and
    device paths, and exceeding MAX_BLOCKS must fail loudly."""
    from colate_tpu.pipeline.binning import (
        MAX_BLOCKS,
        bin_sites_analytic,
        bin_sites_analytic_native,
    )
    from colate_tpu.pipeline.join import JoinedSites

    g = np.random.default_rng(11)
    n = 20000
    nb = 600
    ab = g.uniform(0.0, 1e4, n)
    ab[g.uniform(size=n) < 0.2] = 0.0
    ae = ab + g.uniform(1.0, 1e5, n)
    sites = JoinedSites(
        age_begin=ab,
        age_end=ae,
        w_shared=g.uniform(0.0, 2.0, n),
        w_notshared=g.uniform(0.0, 2.0, n),
        block_id=np.sort(g.integers(0, nb, n)).astype(np.int32),
        num_blocks=nb,
    )
    host = bin_sites_analytic_native(sites)
    dev = bin_sites_analytic(sites)
    assert host is not None
    for a, b in zip(dev, host):
        assert a.shape == (nb, 185)
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=1e-7)

    too_many = JoinedSites(
        age_begin=ab, age_end=ae, w_shared=sites.w_shared,
        w_notshared=sites.w_notshared, block_id=sites.block_id,
        num_blocks=MAX_BLOCKS + 1,
    )
    with pytest.raises(ValueError, match="MAX_BLOCKS"):
        bin_sites_analytic(too_many)


def test_anc_native_matches_python(tmp_path):
    """cn_anc_read vs the pure-Python .anc parser: identical columns,
    including sample ages and f64 branch lengths (strtod parity)."""
    from colate_tpu.formats.anc import AncFile
    from helpers.synth_anc import make_anc_mut

    if native.load() is None:
        pytest.skip("native library unavailable")
    prefix = str(tmp_path / "t")
    make_anc_mut(prefix, "1", N=7, num_trees=23, seed=3,
                 sample_ages=[0.0, 0.0, 12.5, 0.0, 3.25, 0.0, 0.0])
    path = prefix + "_chr1.anc"
    nat = AncFile._read_native(path)
    py = AncFile._read_python(path)
    assert nat is not None
    assert nat.n_hap == py.n_hap
    np.testing.assert_array_equal(nat.start_pos, py.start_pos)
    np.testing.assert_array_equal(nat.parent, py.parent)
    np.testing.assert_array_equal(nat.branch_length, py.branch_length)
    np.testing.assert_array_equal(nat.num_events, py.num_events)
    np.testing.assert_array_equal(nat.snp_begin, py.snp_begin)
    np.testing.assert_array_equal(nat.snp_end, py.snp_end)
    np.testing.assert_array_equal(nat.sample_ages, py.sample_ages)


def test_anc_native_gz_and_no_ages(tmp_path):
    import gzip
    import os

    from colate_tpu.formats.anc import AncFile
    from helpers.synth_anc import make_anc_mut

    if native.load() is None:
        pytest.skip("native library unavailable")
    prefix = str(tmp_path / "t")
    make_anc_mut(prefix, "1", N=5, num_trees=9, seed=8)
    path = prefix + "_chr1.anc"
    with open(path, "rb") as fh:
        raw = fh.read()
    with gzip.open(path + ".gz", "wb") as fh:
        fh.write(raw)
    os.remove(path)
    nat = AncFile._read_native(path)  # resolves the .gz fallback natively
    py = AncFile._read_python(path)
    assert nat.sample_ages is None and py.sample_ages is None
    np.testing.assert_array_equal(nat.branch_length, py.branch_length)
    np.testing.assert_array_equal(nat.parent, py.parent)


def test_tree_coords_native_matches_numpy(tmp_path):
    """cn_tree_coords vs the numpy ascending pass (and the post-order
    fallback), including ancient sample ages and f32 rounding."""
    from colate_tpu.formats.anc import AncFile, node_ages
    from helpers.synth_anc import make_anc_mut

    lib = native.load()
    if lib is None:
        pytest.skip("native library unavailable")
    import ctypes

    prefix = str(tmp_path / "t")
    ages = [0.0, 31.5, 0.0, 0.25, 0.0, 0.0]
    make_anc_mut(prefix, "1", N=6, num_trees=17, seed=5, sample_ages=ages)
    anc = AncFile.read(prefix + "_chr1.anc")
    T, M = anc.parent.shape
    got = node_ages(anc)  # takes the native path

    # numpy ordered pass (bypass native by direct re-implementation)
    coords = np.zeros((T, M), np.float32)
    coords[:, :6] = np.asarray(ages, np.float32)[None, :]
    acc = np.full((T, M), -np.inf)
    rows = np.arange(T)
    for j in range(M):
        if j >= 6:
            coords[:, j] = acc[:, j].astype(np.float32)
        p = anc.parent[:, j]
        valid = p >= 0
        vals = coords[:, j].astype(np.float64) + anc.branch_length[:, j]
        rv, pv = rows[valid], p[valid]
        acc[rv, pv] = np.maximum(acc[rv, pv], vals[valid])
    np.testing.assert_array_equal(got, coords)

    # unordered numbering must be rejected (caller falls back)
    par = np.zeros((1, 3), np.int32)  # parent 0 for node 1,2: not > j
    par[0] = [2, 2, -1]
    bad = np.ascontiguousarray(np.array([[1, 0, -1]], np.int32))
    bl = np.zeros((1, 3), np.float64)
    out = np.empty((1, 3), np.float32)
    pp = lambda a: ctypes.c_void_p(a.ctypes.data)
    assert lib.cn_tree_coords(1, 3, 2, pp(bad), pp(bl), None, pp(out)) == 0
