"""Golden tests for CoalRate mode local_ancestry (coal_LA)."""

import os
import subprocess

import numpy as np
import pytest

from colate_tpu.formats.coal import CoalFile
from helpers.synth_anc import REF_COALRATE, make_anc_mut


@pytest.fixture(scope="module")
def la_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lafix"))
    prefix = os.path.join(root, "trees")
    muts = {}
    for i, c in enumerate(["1", "2"]):
        _, tbl = make_anc_mut(prefix, c, N=12, num_trees=23, seed=31 + i)
        muts[c] = tbl
    chrfile = os.path.join(root, "chr.txt")
    with open(chrfile, "w") as fh:
        fh.write("1\n2\n")
    # 4-column poplabels: 6 diploid samples -> 12 haplotypes, 2 pops
    pop4 = os.path.join(root, "pop4.poplabels")
    with open(pop4, "w") as fh:
        fh.write("sample population group sex\n")
        for i in range(6):
            fh.write(f"S{i} {'POPA' if i < 3 else 'POPB'} G1 NA\n")
    # segment-format poplabels: 2 labels, segments switching mid-chromosome
    la = os.path.join(root, "seg.poplabels")
    g = np.random.default_rng(3)
    with open(la, "w") as fh:
        fh.write("ANC1 ANC2\n")
        for c in ["1", "2"]:
            maxpos = int(muts[c].pos[-1])
            cuts = [0, maxpos // 3, 2 * maxpos // 3]
            for bp in cuts:
                labels = " ".join(str(int(x)) for x in g.integers(0, 2, 12))
                fh.write(f"{c} {bp} {labels}\n")
    return dict(prefix=prefix, chrfile=chrfile, pop4=pop4, seg=la)


def _run_ref(fix, poplabels, out):
    subprocess.run(
        [
            REF_COALRATE, "--mode", "local_ancestry",
            "-i", fix["prefix"],
            "--chr", fix["chrfile"],
            "--poplabels", poplabels,
            "--bins", "2,6,0.5",
            "-o", out,
        ],
        check=True, capture_output=True, timeout=300,
    )


def _run_ours(fix, poplabels, out):
    from colate_tpu.models.local_ancestry import run_local_ancestry

    class Args:
        input = fix["prefix"]
        bins = "2,6,0.5"
        chr_file = fix["chrfile"]
        years_per_gen = None
        num_bootstraps = 1
        coal = None
        output = out

    Args.poplabels = poplabels
    run_local_ancestry(Args())


def _compare(ref_path, our_path):
    with open(ref_path) as fh:
        ref_lines = fh.read().splitlines()
    with open(our_path) as fh:
        our_lines = fh.read().splitlines()
    assert ref_lines[0].split() == our_lines[0].split()
    assert len(ref_lines) == len(our_lines)
    np.testing.assert_allclose(
        [float(x) for x in our_lines[1].split()],
        [float(x) for x in ref_lines[1].split()],
        rtol=1e-6,
    )
    for r, o in zip(ref_lines[2:], our_lines[2:]):
        rp, op = r.split(), o.split()
        assert rp[:2] == op[:2]
        rv = np.array([float(x) for x in rp[2:]])
        ov = np.array([float(x) for x in op[2:]])
        m = np.isfinite(rv)
        np.testing.assert_array_equal(np.isfinite(ov), m)
        np.testing.assert_allclose(ov[m], rv[m], rtol=1e-5)


@pytest.mark.oracle
def test_local_ancestry_4col_golden(la_fixture, tmp_path):
    if not os.path.exists(REF_COALRATE):
        pytest.skip("CoalRate oracle not built")
    _run_ref(la_fixture, la_fixture["pop4"], str(tmp_path / "ref4"))
    _run_ours(la_fixture, la_fixture["pop4"], str(tmp_path / "our4"))
    _compare(str(tmp_path / "ref4.coal"), str(tmp_path / "our4.coal"))


@pytest.mark.oracle
def test_local_ancestry_segments_golden(la_fixture, tmp_path):
    if not os.path.exists(REF_COALRATE):
        pytest.skip("CoalRate oracle not built")
    _run_ref(la_fixture, la_fixture["seg"], str(tmp_path / "refs"))
    _run_ours(la_fixture, la_fixture["seg"], str(tmp_path / "ours"))
    _compare(str(tmp_path / "refs.coal"), str(tmp_path / "ours.coal"))


@pytest.mark.oracle
def test_local_ancestry_ancient_samples_golden(tmp_path):
    """Nonzero sample ages in the .anc header: the per-pair age
    truncation of the denominator (coal_tree.cpp:505-517) must match the
    reference."""
    if not os.path.exists(REF_COALRATE):
        pytest.skip("CoalRate oracle not built")
    root = str(tmp_path)
    prefix = os.path.join(root, "trees")
    g = np.random.default_rng(8)
    N = 12
    # two ancient ages + moderns, interleaved across pops
    ages = np.zeros(N)
    ages[[1, 2, 6, 7]] = 300.0
    ages[[3, 8]] = 1500.0
    for i, c in enumerate(["1"]):
        make_anc_mut(
            prefix, c, N=N, num_trees=23, seed=61 + i, sample_ages=ages
        )
    chrfile = os.path.join(root, "chr.txt")
    with open(chrfile, "w") as fh:
        fh.write("1\n")
    pop4 = os.path.join(root, "pop4.poplabels")
    with open(pop4, "w") as fh:
        fh.write("sample population group sex\n")
        for i in range(6):
            fh.write(f"S{i} {'POPA' if i < 3 else 'POPB'} G1 NA\n")
    fix = dict(prefix=prefix, chrfile=chrfile)
    _run_ref(fix, pop4, str(tmp_path / "refa"))
    _run_ours(fix, pop4, str(tmp_path / "oura"))
    _compare(str(tmp_path / "refa.coal"), str(tmp_path / "oura.coal"))


@pytest.mark.oracle
def test_local_ancestry_scale_identical(tmp_path):
    """8k trees / 200 segments with bootstrap: the batched item pass
    (bulk segment runs + one group-count sweep) must keep the output
    line-identical to the binary (f64 accumulators both sides)."""
    if not os.path.exists(REF_COALRATE):
        pytest.skip("CoalRate oracle not built")
    import subprocess

    from colate_tpu.formats.mut import MutTable

    root = str(tmp_path)
    prefix = os.path.join(root, "trees")
    make_anc_mut(prefix, "1", N=10, num_trees=8000, snps_per_tree=3, seed=41)
    chrfile = os.path.join(root, "chr.txt")
    with open(chrfile, "w") as fh:
        fh.write("1\n")
    tbl = MutTable.read(prefix + "_chr1.mut")
    g = np.random.default_rng(6)
    maxpos = int(tbl.pos[-1])
    cuts = np.concatenate(
        [[0], np.sort(g.choice(np.arange(1, maxpos), 199, replace=False))]
    )
    seg = os.path.join(root, "seg.poplabels")
    with open(seg, "w") as fh:
        fh.write("ANC1 ANC2\n")
        for bp in cuts:
            fh.write(
                f"1 {bp} " + " ".join(str(int(x)) for x in g.integers(0, 2, 10))
                + "\n"
            )
    subprocess.run(
        [REF_COALRATE, "--mode", "local_ancestry", "-i", prefix,
         "--chr", chrfile, "--poplabels", seg, "--bins", "2,6,0.5",
         "--num_bootstraps", "5", "-o", str(tmp_path / "ref")],
        check=True, capture_output=True, timeout=300,
    )
    from colate_tpu.models.local_ancestry import run_local_ancestry

    class Args:
        input = prefix
        chr_file = chrfile
        poplabels = seg
        bins = "2,6,0.5"
        years_per_gen = None
        num_bootstraps = 5
        coal = None
        output = str(tmp_path / "our")

    run_local_ancestry(Args())
    with open(str(tmp_path / "ref.coal")) as fh:
        ref = fh.read()
    with open(str(tmp_path / "our.coal")) as fh:
        ours = fh.read()
    assert ref == ours


def test_la_kernel_device_matches_host(la_fixture, tmp_path):
    """The jitted LA kernel (ops/la_kernel.py), its NumPy twin, and the
    native C++ twin (native/la.cpp) must agree to f64 noise, segment
    format and 4-column alike."""
    pytest.importorskip("jax")
    from colate_tpu import native as _native

    backends = ["numpy", "device"]
    # without the native library the 'native' leg silently re-runs the
    # NumPy twin and the comparison would pass vacuously — drop it
    # (mirrors test_la_kernel.py's explicit skip)
    if _native.load() is not None:
        backends.append("native")
    for pop in ("seg", "pop4"):
        outs = {}
        for backend in backends:

            class Args:
                input = la_fixture["prefix"]
                chr_file = la_fixture["chrfile"]
                poplabels = la_fixture[pop]
                bins = "2,6,0.5"
                years_per_gen = None
                num_bootstraps = 3
                coal = None

            Args.backend = backend
            Args.output = str(tmp_path / f"la_{pop}_{backend}")
            from colate_tpu.models.local_ancestry import run_local_ancestry

            run_local_ancestry(Args)
            with open(Args.output + ".coal") as fh:
                outs[backend] = fh.read().splitlines()
        for other in backends[1:]:
            assert len(outs["numpy"]) == len(outs[other])
            for a, b in zip(outs["numpy"][2:], outs[other][2:]):
                av = np.array([float(x) for x in a.split()[2:]])
                bv = np.array([float(x) for x in b.split()[2:]])
                m = np.isfinite(av)
                np.testing.assert_array_equal(np.isfinite(bv), m)
                np.testing.assert_allclose(bv[m], av[m], rtol=1e-12)


@pytest.mark.oracle
def test_local_ancestry_device_golden(la_fixture, tmp_path, monkeypatch):
    """Full local_ancestry with the device kernel forced on stays within
    golden tolerance of the reference CoalRate binary."""
    pytest.importorskip("jax")
    if not os.path.exists(REF_COALRATE):
        pytest.skip("CoalRate oracle not built")
    import colate_tpu.models.local_ancestry as la

    monkeypatch.setattr(la, "_DEVICE_MIN_NODES", 0)  # force device dispatch
    _run_ref(la_fixture, la_fixture["seg"], str(tmp_path / "ref_dev"))
    _run_ours(la_fixture, la_fixture["seg"], str(tmp_path / "our_dev"))
    _compare(str(tmp_path / "ref_dev.coal"), str(tmp_path / "our_dev.coal"))
