"""Engine-level checkpoint/resume of the sufficient-statistic pipeline."""

import numpy as np

from colate_tpu.config import MutRunConfig
from colate_tpu.models.mut_em import run_mut_and_write
from colate_tpu.utils.checkpoint import (
    input_fingerprint,
    load_suffstats,
    save_suffstats,
)
from helpers.synth import make_fixture


def test_suffstats_roundtrip(tmp_path):
    g = np.random.default_rng(0)
    arrs = [g.random((7, 185)) for _ in range(4)]
    path = str(tmp_path / "s.suffstats.npz")
    fp = input_fingerprint(["/etc/hostname", None], extra={"age": 0.0})
    save_suffstats(path, fp, *arrs, num_sites=123)
    hit = load_suffstats(path, fp)
    assert hit is not None
    for a, b in zip(hit[:4], arrs):
        np.testing.assert_array_equal(a, b)
    assert hit[4] == 123
    # stale fingerprint -> miss
    assert load_suffstats(path, "deadbeef" * 4) is None


def test_mut_checkpoint_resume(tmp_path):
    fix = make_fixture(str(tmp_path / "fix"), n_per_chrom=800, seed=21)

    def cfg(out):
        return MutRunConfig(
            mut=fix["mut_prefix"],
            output=out,
            chr_list=fix["chroms"],
            target_tmp=fix["target"],
            reference_tmp=fix["reference"],
            bins="3,7,0.2",
            seed=7,
            sampling="analytic",
            checkpoint=True,
        )

    r1 = run_mut_and_write(cfg(str(tmp_path / "a")))
    import os

    assert os.path.exists(str(tmp_path / "a") + ".suffstats.npz")
    r2 = run_mut_and_write(cfg(str(tmp_path / "a")))
    np.testing.assert_array_equal(r1.rates, r2.rates)
    assert r2.timings["binning"] == 0.0  # resumed from checkpoint
    assert r2.num_sites == r1.num_sites


def test_em_kill_and_resume_identical_coal(tmp_path):
    """A run killed mid-EM (after the first checkpointed chunk) must,
    when re-run, resume from the saved loop state and write a .coal
    byte-identical to an uninterrupted run."""
    import os
    import subprocess
    import sys
    import textwrap

    from helpers.synth import make_fixture

    fix = make_fixture(str(tmp_path / "fx"), chroms=("1",), n_per_chrom=2500,
                       seed=3)
    code = textwrap.dedent(
        """
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        from colate_tpu.config import MutRunConfig
        from colate_tpu.models.mut_em import run_mut_and_write
        cfg = MutRunConfig(
            mut=sys.argv[1], output=sys.argv[2], chr_list=["1"],
            target_tmp=sys.argv[3], reference_tmp=sys.argv[4],
            bins="3,7,0.25", seed=5, num_bootstrap=3,
            sampling="analytic", checkpoint=True,
        )
        run_mut_and_write(cfg)
        """
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    args = [sys.executable, "-c", code, fix["mut_prefix"],
            "", fix["target"], fix["reference"]]

    # uninterrupted reference run
    args_ref = list(args)
    args_ref[4] = str(tmp_path / "ref")
    r = subprocess.run(args_ref, env=env, capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    # killed run: small chunks + die after the first checkpoint write
    args_kill = list(args)
    args_kill[4] = str(tmp_path / "resumed")
    env_kill = dict(env, COLATE_EM_DIE_AFTER_CHUNKS="1",
                    COLATE_EM_CKPT_CHUNK="128")
    r = subprocess.run(args_kill, env=env_kill, capture_output=True,
                       timeout=600)
    assert r.returncode == 17, (r.returncode, r.stderr.decode()[-500:])
    assert os.path.exists(str(tmp_path / "resumed") + ".emstate.npz")

    # resume (fresh process, no kill hook): must complete from the state
    env_res = dict(env, COLATE_EM_CKPT_CHUNK="128")
    r = subprocess.run(args_kill, env=env_res, capture_output=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert not os.path.exists(str(tmp_path / "resumed") + ".emstate.npz")

    with open(str(tmp_path / "ref") + ".coal", "rb") as fh:
        a = fh.read()
    with open(str(tmp_path / "resumed") + ".coal", "rb") as fh:
        b = fh.read()
    assert a == b
