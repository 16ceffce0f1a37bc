"""In-scan component timing of the fused mode-2 step (TPU)."""
import time
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from instruct_tpu.config import ModelSpec
from instruct_tpu.data.synthetic import synthetic_panel
from instruct_tpu.mcmc.state import init_state
from instruct_tpu.mcmc.step import build_step_parts
from instruct_tpu.mcmc import updates as up
from instruct_tpu.kernels import fused_step as fs

panel = synthetic_panel(n_indv=1000, n_loci=10_000, n_pops=3, n_alleles=2, seed=7)
data = panel.data
spec = ModelSpec(mode=2, n_pops=3)
st = init_state(jax.random.key(0), spec, data)
step_core, add_ll = build_step_parts(spec, data)
S = 200

def scan_time(body, carry, label):
    f = jax.jit(lambda c: jax.lax.scan(lambda cc, i: (body(cc, i), None), c,
                                       jnp.arange(S, dtype=jnp.int32))[0])
    out = jax.block_until_ready(f(carry))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(carry))
    dt = (time.perf_counter() - t0) / S * 1e3
    print(f"{label:34s} {dt:7.3f} ms/step", flush=True)
    return out

key = jax.random.key(1)
scan_time(lambda s, i: step_core(s, jax.random.fold_in(key, i)), st, "full fused step_core")

wg = jnp.exp2(1.0 - jnp.stack([st.gen, st.gen + 1], 1).astype(jnp.float32))
def site_only(s, i):
    sw = fs.seed_words(jax.random.fold_in(key, i))
    z, qq, ll2, zc = fs.zq_gen_pass(sw, s.q, s.freq, data.geno,
                                    data.site_valid, data.hom, s.z, wg,
                                    structure=True)
    return s._replace(z=z, zcounts=zc if zc is not None else s.zcounts)
scan_time(site_only, st, "zq_gen_pass only")

def site_mode1(s, i):
    sw = fs.seed_words(jax.random.fold_in(key, i))
    z, qq, ll, zc = fs.zq_mode1_pass(sw, s.q, s.freq, data.geno, data.site_valid)
    return s._replace(z=z)
scan_time(site_mode1, st, "zq_mode1_pass (sample+mode1 lkh)")

def p_only(s, i):
    kp = jax.random.fold_in(key, i)
    freq = up.dirichlet_from_counts(kp, s.zcounts + 1.0, data.allele_valid[None])
    return s._replace(freq=freq)
scan_time(p_only, st, "P dirichlet from carried counts")

def small_only(s, i):
    kp, ks, kg, kq, ka, kacc = jax.random.split(jax.random.fold_in(key, i), 6)
    rates, ais = up.update_s_pop(ks, spec, s.q, s.gen, s.rates, s.ais_state)
    sbar = s.q @ rates
    gen_prop = up.sample_geometric(kg, sbar, spec.gen_cap)
    q_new = up.dirichlet_from_counts(kq, jnp.abs(s.q) * 100 + s.alpha)
    alpha = up.update_alpha(ka, spec, q_new, s.alpha)
    u = jax.random.uniform(kacc, s.gen.shape)
    gen = jnp.where(u < 0.5, gen_prop, s.gen)
    return s._replace(rates=rates, ais_state=ais, q=q_new, alpha=alpha, gen=gen)
scan_time(small_only, st, "small updates (S,G-prop,Q,alpha)")

def lkh_only(s, i):
    s2 = add_ll(s)
    return s._replace(loglik_total=s2.loglik_total + 0.0)
scan_time(lkh_only, st, "cal_lkh pass")
