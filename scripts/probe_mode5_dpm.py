"""Mode-5 DPM vs mode-5 uniform step time on TPU (VERDICT r3 weak #5):
the DPM sweep's grid curve is now a stack of masked MXU matmuls
(dpm.f_loglik_grid), so the DPM step must land within ~2x of the uniform
step instead of the seconds/step the dense [N, L, M] contraction implied."""
import time
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from instruct_tpu.config import ModelSpec, Priors, PriorFamily
from instruct_tpu.data.synthetic import synthetic_panel
from instruct_tpu.mcmc.state import init_state
from instruct_tpu.mcmc.step import build_step_parts

panel = synthetic_panel(n_indv=1000, n_loci=10_000, n_pops=3, n_alleles=2,
                        seed=7)
data = panel.data
S = 100


def scan_time(spec, label):
    st = init_state(jax.random.key(0), spec, data)
    step_core, _ = build_step_parts(spec, data)
    key = jax.random.key(1)
    f = jax.jit(lambda c: jax.lax.scan(
        lambda cc, i: (step_core(cc, jax.random.fold_in(key, i)), None), c,
        jnp.arange(S, dtype=jnp.int32))[0])
    out = jax.block_until_ready(f(st))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(out))
    dt = (time.perf_counter() - t0) / S * 1e3
    print(f"{label:44s} {dt:7.3f} ms/step", flush=True)
    return dt


t_unif = scan_time(ModelSpec(mode=5, n_pops=3), "mode 5 uniform prior")
t_crp = scan_time(
    ModelSpec(mode=5, n_pops=3,
              priors=Priors(family=PriorFamily.DPM, alpha_dpm=3.0)),
    "mode 5 DPM (exact CRP scan)")
t_stick = scan_time(
    ModelSpec(mode=5, n_pops=3,
              priors=Priors(family=PriorFamily.DPM, alpha_dpm=3.0,
                            dp_truncation=32)),
    "mode 5 DPM (stick-breaking T=32)")
t3 = scan_time(
    ModelSpec(mode=3, n_pops=3,
              priors=Priors(family=PriorFamily.DPM, alpha_dpm=3.0)),
    "mode 3 DPM (exact CRP scan)")
print(f"DPM/uniform ratio: CRP {t_crp / t_unif:.2f}x, "
      f"stick {t_stick / t_unif:.2f}x")
