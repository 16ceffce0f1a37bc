"""On-TPU statistical validation: fused Pallas step vs XLA step.

Runs the same mode-2 panel through both step implementations (different RNG
realizations of the same Gibbs/MH conditionals) and requires the posterior
means of S, Q and the log-likelihood to agree within Monte-Carlo error.
CI runs kernels in interpret mode (tests/test_fused_step.py); this script
is the on-hardware acceptance check and is invoked manually / by bench
prep, not by pytest.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import numpy as np
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from instruct_tpu.config import ModelSpec, Schedule
    from instruct_tpu.data.synthetic import synthetic_panel
    from instruct_tpu.mcmc.driver import run_mcmc

    assert jax.default_backend() == "tpu", "run this on the TPU host"

    panel = synthetic_panel(n_indv=150, n_loci=400, n_pops=2, n_alleles=2,
                            selfing_rates=np.array([0.15, 0.7]),
                            admixture_alpha=0.2, seed=11)
    sched = Schedule(n_iter=6000, burnin=3000, thinning=5, n_chains=2,
                     ckrep=100, nstep_check_empty_cluster=200)

    results = {}
    for name, flag in [("fused", True), ("xla", False)]:
        spec = ModelSpec(mode=2, n_pops=2, use_pallas=flag)
        res = run_mcmc(panel.data, spec, sched, jax.random.key(42))
        results[name] = res
        print(f"{name}: mean S per chain =",
              np.asarray(res.posterior_mean.rates).round(4).tolist(),
              " mean logL =",
              np.asarray(res.posterior_mean.total_ll).round(1).tolist())

    s_f = np.sort(np.asarray(results["fused"].posterior_mean.rates).mean(0))
    s_x = np.sort(np.asarray(results["xla"].posterior_mean.rates).mean(0))
    q_f = np.asarray(results["fused"].posterior_mean.q).mean(0)
    q_x = np.asarray(results["xla"].posterior_mean.q).mean(0)
    ll_f = np.asarray(results["fused"].posterior_mean.total_ll).mean()
    ll_x = np.asarray(results["xla"].posterior_mean.total_ll).mean()

    ds = np.abs(s_f - s_x).max()
    # label-align Q by best column permutation per engine run
    dq = min(np.abs(q_f - q_x).mean(), np.abs(q_f - q_x[:, ::-1]).mean())
    dll = abs(ll_f - ll_x) / abs(ll_x)
    print(f"|dS|max={ds:.4f}  |dQ|mean={dq:.4f}  |dlogL|rel={dll:.5f}")
    assert ds < 0.06, ds
    assert dq < 0.05, dq
    assert dll < 0.02, dll
    print("FUSED-vs-XLA POSTERIOR PARITY: OK")


if __name__ == "__main__":
    main()
