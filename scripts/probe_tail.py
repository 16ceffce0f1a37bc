"""Component timing of the fused mode-2 step's small-update tail (TPU).

The site pass (zq_gendiff_pass) is ~0.53 ms at the bench config; this
script times each remaining component of the step at the same config
(s_subsweeps=12) to direct the tail fusion.
"""
import time
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from instruct_tpu.config import ModelSpec
from instruct_tpu.data.synthetic import synthetic_panel
from instruct_tpu.mcmc.state import init_state
from instruct_tpu.mcmc.step import build_step_parts, _s_subsweeps_pop
from instruct_tpu.mcmc import updates as up
from instruct_tpu.kernels import fused_step as fs
from instruct_tpu.kernels.dirichlet_pallas import dirichlet_kla, dirichlet_rows

panel = synthetic_panel(n_indv=1000, n_loci=10_000, n_pops=3, n_alleles=2,
                        seed=7)
data = panel.data
spec = ModelSpec(mode=2, n_pops=3, s_subsweeps=12)
st = init_state(jax.random.key(0), spec, data)
step_core, add_ll = build_step_parts(spec, data)
S = 400

def scan_time(body, carry, label):
    f = jax.jit(lambda c: jax.lax.scan(lambda cc, i: (body(cc, i), None), c,
                                       jnp.arange(S, dtype=jnp.int32))[0])
    out = jax.block_until_ready(f(carry))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(carry))
    dt = (time.perf_counter() - t0) / S * 1e3
    print(f"{label:40s} {dt:7.4f} ms/step", flush=True)
    return out

key = jax.random.key(1)
scan_time(lambda s, i: step_core(s, jax.random.fold_in(key, i)), st,
          "full fused step_core (J=12)")

def site_only(s, i):
    sw = fs.seed_words(jax.random.fold_in(key, i))
    wg_pair = jnp.exp2(1.0 - jnp.stack([s.gen, s.gen + 1], 1).astype(jnp.float32))
    z, qq, ll2, zc = fs.zq_gendiff_pass(sw, s.q, s.freq, data.geno,
                                        data.site_valid, data.hom, s.z,
                                        wg_pair, structure=True,
                                        bits2=data.bits2)
    return s._replace(z=z, zcounts=zc if zc is not None else s.zcounts)
scan_time(site_only, st, "zq_gendiff_pass only")

def s_only(s, i):
    ks = jax.random.fold_in(key, i)
    return _s_subsweeps_pop(spec, s, ks)
scan_time(s_only, st, "S subsweeps x12")

def gprop_only(s, i):
    kg = jax.random.fold_in(key, i)
    sbar = s.q @ s.rates
    gen_prop = up.sample_geometric(kg, sbar, spec.gen_cap)
    wg_pair = jnp.exp2(1.0 - jnp.stack([s.gen, gen_prop], 1).astype(jnp.float32))
    return s._replace(gen=jnp.where(wg_pair[:, 1] > 0, gen_prop, s.gen))
scan_time(gprop_only, st, "sbar + G proposal + wg_pair")

def p_only(s, i):
    kp = jax.random.fold_in(key, i)
    freq = dirichlet_kla(fs.seed_words(kp), s.zcounts + 1.0, data.allele_valid)
    return s._replace(freq=freq)
scan_time(p_only, st, "P dirichlet (Pallas)")

def q_only(s, i):
    kq = jax.random.fold_in(key, i)
    conc = (jnp.abs(s.q) * 100 + s.alpha).T
    out = dirichlet_rows(fs.seed_words(kq), conc, rows_per_group=conc.shape[0])
    return s._replace(q=out.T)
scan_time(q_only, st, "Q dirichlet (Pallas)")

def alpha_only(s, i):
    ka = jax.random.fold_in(key, i)
    alpha = up.update_alpha(ka, spec, s.q, s.alpha)
    return s._replace(alpha=alpha)
scan_time(alpha_only, st, "alpha MH")

def accept_only(s, i):
    kacc = jax.random.fold_in(key, i)
    u = jax.random.uniform(kacc, s.gen.shape, minval=1e-30)
    gen = jnp.where(jnp.log(u) < s.loglik_indv, s.gen + 1, s.gen)
    return s._replace(gen=gen)
scan_time(accept_only, st, "G accept (uniform + where)")

def keysplit_only(s, i):
    kp, ks, kg, kz, ka, kq, kacc = jax.random.split(jax.random.fold_in(key, i), 7)
    return s._replace(alpha=s.alpha + jax.random.uniform(kacc) * 0.0)
scan_time(keysplit_only, st, "key split(7) overhead")
