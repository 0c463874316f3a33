"""Multi-host mode mut: 2-process CPU run vs single-process, byte parity.

Each subprocess initialises jax.distributed (Gloo-backed CPU
collectives), takes its chromosome partition, and merges per-host block
histograms with the psum in parallel/multihost.py.  Because block
ranges are disjoint across processes, the merged sufficient statistics
— and therefore the bootstrap + EM and the written .coal — must equal
the single-process run bit-for-bit.
"""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from helpers.synth import make_fixture

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, nproc, port, fixdir, out = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
    )
    from colate_tpu.parallel.multihost import init_distributed, run_mut_multihost
    init_distributed(f"127.0.0.1:{port}", nproc, pid)
    from colate_tpu.config import MutRunConfig
    cfg = MutRunConfig(
        mut=os.path.join(fixdir, "synth"),
        output=out,
        chr_list=[c for c in open(os.path.join(fixdir, "chr.txt")).read().split()],
        target_tmp=os.path.join(fixdir, "target.colate.in"),
        reference_tmp=os.path.join(fixdir, "ref.colate.in"),
        bins="3,7,0.25",
        seed=7,
        num_bootstrap=3,
        sampling="analytic",
    )
    res = run_mut_multihost(cfg)
    print(json.dumps({
        "pid": pid,
        "sites": res.num_sites,
        "blocks": res.num_blocks,
        "rates0": float(res.rates.ravel()[res.rates.size // 2]),
    }))
    """
)


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mh"))
    return make_fixture(root, chroms=("1", "2", "3"), n_per_chrom=2000, seed=42)


def _single_process(fix, out):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    code = textwrap.dedent(
        f"""
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        from colate_tpu.config import MutRunConfig
        from colate_tpu.models.mut_em import run_mut_and_write
        cfg = MutRunConfig(
            mut={fix['mut_prefix']!r}, output={out!r},
            chr_list=["1", "2", "3"],
            target_tmp={fix['target']!r}, reference_tmp={fix['reference']!r},
            bins="3,7,0.25", seed=7, num_bootstrap=3, sampling="analytic",
        )
        run_mut_and_write(cfg)
        """
    )
    subprocess.run(
        [sys.executable, "-c", code], env=env, check=True, capture_output=True,
        timeout=600,
    )


def test_multihost_two_process_bit_parity(fix, tmp_path):
    out1 = str(tmp_path / "single")
    _single_process(fix, out1)

    out2 = str(tmp_path / "multi")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    port = "29881"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), "2", port,
             fix["root"], out2],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=600)
        assert p.returncode == 0, se.decode()[-2000:]
        outs.append(json.loads(so.decode().strip().splitlines()[-1]))

    # both ranks report identical global statistics
    assert outs[0]["sites"] == outs[1]["sites"] > 0
    assert outs[0]["blocks"] == outs[1]["blocks"] > 1
    assert outs[0]["rates0"] == outs[1]["rates0"]

    with open(out1 + ".coal", "rb") as fh:
        single = fh.read()
    with open(out2 + ".coal", "rb") as fh:
        multi = fh.read()
    assert single == multi  # byte-for-byte


def test_partition_chromosomes():
    from colate_tpu.parallel.multihost import partition_chromosomes

    chroms = list("abcde")
    got = [partition_chromosomes(chroms, 3, p) for p in range(3)]
    # contiguous, covering, ordered
    assert got[0][0] == 0 and got[-1][1] == 5
    for (lo1, hi1), (lo2, hi2) in zip(got, got[1:]):
        assert hi1 == lo2
    # more processes than chromosomes: empty shards allowed
    lo, hi = partition_chromosomes(["1"], 4, 3)
    assert lo >= hi or (lo, hi) == (0, 1)
