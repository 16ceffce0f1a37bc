"""Multi-device tests on the virtual 8-CPU mesh: sharded chains + loci must
reproduce the single-device result bit-for-bit (same keys, same math) and
the dryrun entry used by the driver must pass."""

import jax
import numpy as np
import pytest

from instruct_tpu.config import ModelSpec, Schedule
from instruct_tpu.data.synthetic import synthetic_panel
from instruct_tpu.mcmc.driver import run_mcmc
from instruct_tpu.parallel.mesh import make_mesh


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_sharded_matches_unsharded():
    panel = synthetic_panel(n_indv=12, n_loci=16, n_pops=2, seed=3)
    spec = ModelSpec(mode=2, n_pops=2)
    sched = Schedule(n_iter=30, burnin=10, thinning=2, n_chains=4, ckrep=4,
                     nstep_check_empty_cluster=2)
    key = jax.random.key(11)
    ref = run_mcmc(panel.data, spec, sched, key)
    mesh = make_mesh(4, 2)
    got = run_mcmc(panel.data, spec, sched, key, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got.accum.mean.total_ll),
                               np.asarray(ref.accum.mean.total_ll),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.accum.mean.rates),
                               np.asarray(ref.accum.mean.rates), atol=1e-5)


@needs_8
def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn).lower(*args).compile()
    res = out(*args)
    assert np.isfinite(float(res.loglik_total))


@needs_8
def test_chain_shardmap_matches_unsharded():
    # Pure chain-parallel mesh (data axis = 1) takes the explicit
    # shard_map path (each device runs whole chains locally) and must
    # reproduce the single-device trajectories bit-for-bit.
    panel = synthetic_panel(n_indv=10, n_loci=12, n_pops=2, seed=4)
    spec = ModelSpec(mode=2, n_pops=2)
    sched = Schedule(n_iter=24, burnin=8, thinning=2, n_chains=8, ckrep=4,
                     nstep_check_empty_cluster=2)
    key = jax.random.key(7)
    ref = run_mcmc(panel.data, spec, sched, key)
    got = run_mcmc(panel.data, spec, sched, key, mesh=make_mesh(8, 1))
    np.testing.assert_allclose(np.asarray(got.accum.mean.total_ll),
                               np.asarray(ref.accum.mean.total_ll),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.accum.mean.rates),
                               np.asarray(ref.accum.mean.rates), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.final_state.loglik_total),
                               np.asarray(ref.final_state.loglik_total),
                               rtol=1e-5)


@needs_8
def test_use_pallas_with_data_shards_raises():
    """use_pallas=True + a sharded data axis must fail with a clear error,
    not a GSPMD partitioning failure (ADVICE r1)."""
    panel = synthetic_panel(n_indv=8, n_loci=16, n_pops=2, seed=4)
    spec = ModelSpec(mode=2, n_pops=2, use_pallas=True)
    sched = Schedule(n_iter=6, burnin=2, thinning=2, n_chains=2, ckrep=2,
                     nstep_check_empty_cluster=2)
    mesh = make_mesh(1, 8)
    with pytest.raises(ValueError, match="use_pallas"):
        run_mcmc(panel.data, spec, sched, jax.random.key(0), mesh=mesh)
