"""CondCoalRates + local_ancestry bench at VERDICT scale vs the reference.

Workload: one chromosome, 50,000 marginal trees, 20 haplotypes
(CondCoalRates: reference walks each focal haplotype to the root per
tree, coal.cpp:4785-4999; ours runs the native replay kernel,
colate_tpu/native/cond.cpp).  local_ancestry: the same trees against a
1,000-segment ancestry annotation (reference splits tree spans across
segment boundaries and recomputes group counts per segment,
coal.cpp:206-590 + coal_tree.cpp:302-654; ours precomputes per-tree
group-count tensors once and masks per segment,
colate_tpu/models/local_ancestry.py).

Prints one JSON line: walls for ours/reference and the output parity.
Usage: python tools/bench_aux.py [num_trees] (default 50000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

BENCH_DIR = "/tmp/colate_bench_aux"
REF_COLATE = "/tmp/refbin/Colate"
REF_COALRATE = "/tmp/refbin/CoalRate"
N_HAP = 20
N_SEGMENTS = 1000
BINS = "2,6,0.5"


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def ensure_fixture(num_trees: int) -> dict:
    from helpers.synth_anc import make_anc_mut

    os.makedirs(BENCH_DIR, exist_ok=True)
    prefix = os.path.join(BENCH_DIR, f"trees{num_trees}")
    marker = prefix + ".ready"
    chrfile = os.path.join(BENCH_DIR, f"chr{num_trees}.txt")
    pop = os.path.join(BENCH_DIR, "pop.poplabels")
    seg = os.path.join(BENCH_DIR, f"seg{num_trees}.poplabels")
    if not os.path.exists(marker):
        log(f"generating {num_trees} trees x {N_HAP} haps...")
        t0 = time.time()
        _, tbl = make_anc_mut(
            prefix, "1", N=N_HAP, num_trees=num_trees,
            snps_per_tree=3, seed=17,
        )
        with open(chrfile, "w") as fh:
            fh.write("1\n")
        with open(pop, "w") as fh:
            fh.write("sample population group sex\n")
            for i in range(N_HAP // 2):
                grp = "FOC" if i < 3 else "CON" if i < 6 else "OTH"
                fh.write(f"S{i} {grp} G1 NA\n")
        # segment-format ancestry labels: N_SEGMENTS cuts over the chromosome
        g = np.random.default_rng(5)
        maxpos = int(tbl.pos[-1])
        cuts = np.unique(
            np.concatenate([[0], np.sort(g.integers(1, maxpos, N_SEGMENTS - 1))])
        )
        with open(seg, "w") as fh:
            fh.write("ANC1 ANC2\n")
            for bp in cuts:
                labels = " ".join(str(int(x)) for x in g.integers(0, 2, N_HAP))
                fh.write(f"1 {bp} {labels}\n")
        with open(marker, "w") as fh:
            fh.write("ok\n")
        log(f"fixture generated in {time.time() - t0:.1f}s")
    return dict(prefix=prefix, chrfile=chrfile, pop=pop, seg=seg)


def bench_cond(fix: dict) -> dict:
    ref_out = os.path.join(BENCH_DIR, "cond_ref.txt")
    t0 = time.time()
    subprocess.run(
        [REF_COLATE, "--mode", "CondCoalRates", "-i", fix["prefix"],
         "--chr", fix["chrfile"], "--poplabels", fix["pop"],
         "--groups", "FOC,CON", "--bins", BINS, "--seed", "7",
         "--num_bootstraps", "4", "-o", ref_out],
        check=True, capture_output=True, timeout=3600,
    )
    ref_s = time.time() - t0

    from colate_tpu.models.cond_coal import run_cond_coal

    out = os.path.join(BENCH_DIR, "cond_ours.txt")

    class Args:
        input = fix["prefix"]
        chr_file = fix["chrfile"]
        poplabels = fix["pop"]
        groups = "FOC,CON"
        bins = BINS
        years_per_gen = None
        lineage_bin = None
        num_bootstraps = 4
        seed = 7
        mask = None
        mask_cutoff = None
        map = None
        coal = None
        output = out
        sampling = "analytic"

    # default mode: analytic f64 kernel (best-of-2)
    ours_s = None
    for _ in range(2):
        t0 = time.time()
        run_cond_coal(Args())
        dt = time.time() - t0
        ours_s = dt if ours_s is None else min(ours_s, dt)
    with open(ref_out) as fh:
        ref = fh.read()
    with open(out) as fh:
        ours = fh.read()
    # analytic parity vs the reference's f32 output (rates as printed)
    max_rel = 0.0
    ok = len(ref.splitlines()) == len(ours.splitlines())
    if ok:
        for r, o in zip(ref.splitlines()[1:], ours.splitlines()[1:]):
            rp, op = r.split(), o.split()
            if rp[:4] != op[:4]:
                ok = False
                break
            if rp[4] not in ("nan", "-nan", "inf", "-inf"):
                rv = float(rp[4])
                if rv != 0:
                    max_rel = max(max_rel, abs(float(op[4]) / rv - 1.0))
        # the deviation is the reference's own f32 accumulation drift
        # vs our f64 (the byte-identical replay below isolates it)
        ok = ok and max_rel < 1e-3

    # parity mode (--sampling mc_parity): byte-identical replay, timed
    out_p = os.path.join(BENCH_DIR, "cond_ours_parity.txt")
    Args.sampling = "mc_parity"
    Args.output = out_p
    t0 = time.time()
    run_cond_coal(Args())
    parity_s = time.time() - t0
    with open(out_p) as fh:
        ours_p = fh.read()
    return {
        "ours_wall_s": round(ours_s, 2),
        "reference_wall_s": round(ref_s, 2),
        "speedup": round(ref_s / ours_s, 2),
        "analytic_rates_match_rtol1e-3": ok,
        "analytic_max_relerr": float(f"{max_rel:.3g}"),
        "parity_wall_s": round(parity_s, 2),
        "parity_speedup": round(ref_s / parity_s, 2),
        "output_byte_identical": ref == ours_p,
    }


def bench_la(fix: dict) -> dict:
    ref_out = os.path.join(BENCH_DIR, "la_ref")
    t0 = time.time()
    subprocess.run(
        [REF_COALRATE, "--mode", "local_ancestry", "-i", fix["prefix"],
         "--chr", fix["chrfile"], "--poplabels", fix["seg"],
         "--bins", BINS, "-o", ref_out],
        check=True, capture_output=True, timeout=3600,
    )
    ref_s = time.time() - t0

    from colate_tpu.models.local_ancestry import run_local_ancestry

    out = os.path.join(BENCH_DIR, "la_ours")

    class Args:
        input = fix["prefix"]
        chr_file = fix["chrfile"]
        poplabels = fix["seg"]
        bins = BINS
        years_per_gen = None
        num_bootstraps = 1
        coal = None
        output = out

    ours_s = None
    for _ in range(2):
        t0 = time.time()
        run_local_ancestry(Args())
        dt = time.time() - t0
        ours_s = dt if ours_s is None else min(ours_s, dt)

    # value parity: rates per group pair within rtol (float text roundtrip)
    max_rel = 0.0
    with open(ref_out + ".coal") as fh:
        ref_lines = fh.read().splitlines()
    with open(out + ".coal") as fh:
        our_lines = fh.read().splitlines()
    ok = len(ref_lines) == len(our_lines)
    if ok:
        for r, o in zip(ref_lines[2:], our_lines[2:]):
            rv = np.array([float(x) for x in r.split()[2:]])
            ov = np.array([float(x) for x in o.split()[2:]])
            m = np.isfinite(rv) & (rv != 0)
            if not np.array_equal(np.isfinite(rv), np.isfinite(ov)):
                ok = False
                break
            if m.any():
                max_rel = max(
                    max_rel, float(np.abs(ov[m] / rv[m] - 1.0).max())
                )
        ok = ok and max_rel < 1e-5
    return {
        "ours_wall_s": round(ours_s, 2),
        "reference_wall_s": round(ref_s, 2),
        "speedup": round(ref_s / ours_s, 2),
        "num_segments": N_SEGMENTS,
        "rates_match_rtol1e-5": ok,
        "max_relerr": float(f"{max_rel:.3g}"),
    }


def main() -> None:
    num_trees = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    if not (os.path.exists(REF_COLATE) and os.path.exists(REF_COALRATE)):
        log("reference oracle not built; run tools/build_reference_oracle.sh")
        raise SystemExit(2)
    fix = ensure_fixture(num_trees)
    out = {"metric": "aux_modes", "num_trees": num_trees}
    log("CondCoalRates...")
    out["cond_coal"] = bench_cond(fix)
    log(f"cond: {out['cond_coal']}")
    log("local_ancestry...")
    out["local_ancestry"] = bench_la(fix)
    log(f"la: {out['local_ancestry']}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
