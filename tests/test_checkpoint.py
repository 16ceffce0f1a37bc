"""Checkpoint/resume: a run interrupted at a checkpoint boundary must
resume to *bitwise* the same posterior moments as the uninterrupted run
(driver docstring contract)."""

import shutil

import jax
import numpy as np

from instruct_tpu.config import ModelSpec, Schedule
from instruct_tpu.data.synthetic import synthetic_panel
from instruct_tpu.mcmc.driver import run_mcmc

SCHED = Schedule(n_iter=60, burnin=20, thinning=2, n_chains=2, ckrep=5,
                 nstep_check_empty_cluster=5)


def test_checkpoint_resume_bitwise(tmp_path):
    panel = synthetic_panel(n_indv=10, n_loci=8, n_pops=2, seed=3)
    spec = ModelSpec(mode=2, n_pops=2)
    key = jax.random.key(12)

    straight = run_mcmc(panel.data, spec, SCHED, key)

    # checkpointed run, all segments in one process
    d1 = tmp_path / "ck1"
    ck = run_mcmc(panel.data, spec, SCHED, key, checkpoint_dir=str(d1),
                  checkpoint_every=25)
    np.testing.assert_array_equal(np.asarray(ck.accum.mean.total_ll),
                                  np.asarray(straight.accum.mean.total_ll))
    np.testing.assert_array_equal(np.asarray(ck.accum.mean.rates),
                                  np.asarray(straight.accum.mean.rates))

    # simulate a crash: run once to completion, delete the final checkpoint
    # so the latest is mid-run, then "resume"
    d2 = tmp_path / "ck2"
    run_mcmc(panel.data, spec, SCHED, key, checkpoint_dir=str(d2),
             checkpoint_every=25)
    shutil.rmtree(d2 / "step_000000000060")
    shutil.rmtree(d2 / "step_000000000050")
    resumed = run_mcmc(panel.data, spec, SCHED, key, checkpoint_dir=str(d2),
                       checkpoint_every=25)
    np.testing.assert_array_equal(np.asarray(resumed.accum.mean.total_ll),
                                  np.asarray(straight.accum.mean.total_ll))
    np.testing.assert_array_equal(np.asarray(resumed.accum.mean.q),
                                  np.asarray(straight.accum.mean.q))
