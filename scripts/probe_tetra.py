"""Component timing of the tetraploid step (TPU)."""
import time
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from instruct_tpu.config import ModelSpec
from instruct_tpu.data.synthetic import synthetic_tetra_panel
from instruct_tpu.tetra.engine import (build_tetra_step, init_tetra_state,
                                       build_tables, log_hwe_table,
                                       selfing_equilibrium, _update_p_tetra,
                                       _update_zq_tetra, _sample_geno,
                                       _site_loglik)

N, L, K = 500, 5000, 3
panel = synthetic_tetra_panel(n_indv=N, n_loci=L, n_pops=K, n_alleles=2,
                              seed=7)
data = panel.data
spec = ModelSpec(mode=2, n_pops=K, ploid=4)
st = init_tetra_state(jax.random.key(0), spec, data)
step, add_ll = build_tetra_step(spec, data)
tables = build_tables(spec, data)
S = 100
key = jax.random.key(1)

def scan_time(body, carry, label):
    f = jax.jit(lambda c: jax.lax.scan(lambda cc, i: (body(cc, i), None), c,
                                       jnp.arange(S, dtype=jnp.int32))[0])
    out = jax.block_until_ready(f(carry))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(carry))
    dt = (time.perf_counter() - t0) / S * 1e3
    print(f"{label:40s} {dt:7.3f} ms/step", flush=True)
    return out

scan_time(lambda s, i: step(s, jax.random.fold_in(key, i)), st,
          f"full tetra step ({N}x{L} K={K})")

def p_only(s, i):
    kp = jax.random.fold_in(key, i)
    freq, freq2 = _update_p_tetra(kp, spec, data, s.z, s.geno)
    return s._replace(freq=freq)
scan_time(p_only, st, "P update")

def hwe_only(s, i):
    lh = log_hwe_table(tables, spec, s.freq, s.freq2)
    return s._replace(loglik_total=lh.sum())
scan_time(hwe_only, st, "log HWE table")

def eq_only(s, i):
    lh = log_hwe_table(tables, spec, s.freq, s.freq2)
    tab = selfing_equilibrium(tables, lh, s.rates)
    return s._replace(loglik_total=tab.sum())
scan_time(eq_only, st, "HWE + selfing equilibrium solve")

def zq_only(s, i):
    kz = jax.random.fold_in(key, i)
    z, q = _update_zq_tetra(kz, tables, spec, data, s.freq, s.freq2, s.q,
                            s.alpha, s.geno)
    return s._replace(z=z, q=q)
scan_time(zq_only, st, "ZQ update")

def geno_only(s, i):
    kg = jax.random.fold_in(key, i)
    lh = log_hwe_table(tables, spec, s.freq, s.freq2)
    tab = selfing_equilibrium(tables, lh, s.rates)
    geno = _sample_geno(kg, tables, spec, data, s.freq, s.freq2, s.q, tab,
                        s.z)
    return s._replace(geno=geno)
scan_time(geno_only, st, "geno Gibbs (incl. table rebuild)")

def lkh_only(s, i):
    lh = log_hwe_table(tables, spec, s.freq, s.freq2)
    tab = selfing_equilibrium(tables, lh, s.rates)
    site = _site_loglik(tables, spec, data, s.freq, s.freq2, s.z, s.geno,
                        tab)
    return s._replace(loglik_total=site.sum())
scan_time(lkh_only, st, "site loglik (incl. table rebuild)")
