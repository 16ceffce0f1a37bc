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

    def aligned(res):
        """Cluster labels are exchangeable and may permute per chain —
        align every chain by ascending posterior-mean S before averaging
        (the reference relabels by sorted S too, result_analysis.c:83-87)."""
        rates = np.asarray(res.posterior_mean.rates)       # [C, K]
        q = np.asarray(res.posterior_mean.q)               # [C, N, K]
        order = np.argsort(rates, axis=1)
        s = np.take_along_axis(rates, order, axis=1).mean(0)
        qa = np.stack([q[c][:, order[c]] for c in range(q.shape[0])]).mean(0)
        return s, qa

    s_f, q_f = aligned(results["fused"])
    s_x, q_x = aligned(results["xla"])
    ll_f = np.asarray(results["fused"].posterior_mean.total_ll).mean()
    ll_x = np.asarray(results["xla"].posterior_mean.total_ll).mean()

    ds = np.abs(s_f - s_x).max()
    dq = np.abs(q_f - q_x).mean()
    dll = abs(ll_f - ll_x) / abs(ll_x)
    print(f"|dS|max={ds:.4f}  |dQ|mean={dq:.4f}  |dlogL|rel={dll:.5f}")
    assert ds < 0.06, ds
    assert dq < 0.05, dq
    assert dll < 0.02, dll
    print("FUSED-vs-XLA POSTERIOR PARITY: OK")


def validate_dirichlet_kernel():
    """On-hardware statistical acceptance of the Pallas Dirichlet sampler
    (kernels/dirichlet_pallas.py): moments vs the exact Dirichlet at
    large and small (boost-path) concentrations."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instruct_tpu.kernels.dirichlet_pallas import dirichlet_rows
    from instruct_tpu.kernels.fused_step import seed_words

    rng = np.random.default_rng(1)
    for lo, hi, reps, label in [(1.0, 700.0, 400, "large"),
                                (0.1, 0.9, 1200, "boost")]:
        conc = jnp.asarray(rng.uniform(lo, hi, (2, 4096)), jnp.float32)
        outs = jax.jit(jax.vmap(
            lambda s: dirichlet_rows(s, conc, rows_per_group=2)))(
            jax.vmap(seed_words)(jax.random.split(jax.random.key(2), reps)))
        x = np.asarray(outs)[:, 0, :]
        cs = np.asarray(conc)
        a0 = cs.sum(0)
        want_m = cs[0] / a0
        want_v = cs[0] * cs[1] / (a0 ** 2 * (a0 + 1))
        zm = (x.mean(0) - want_m) / np.sqrt(want_v / reps)
        # max |z| over 4096 cells ~ 3.9 under H0; allow 5
        assert np.abs(zm).max() < 5.0, (label, np.abs(zm).max())
        print(f"dirichlet kernel [{label}]: max |mean z| = "
              f"{np.abs(zm).max():.2f} over {cs.shape[1]} cells "
              f"x {reps} reps: OK")


if __name__ == "__main__":
    main()
    validate_dirichlet_kernel()
