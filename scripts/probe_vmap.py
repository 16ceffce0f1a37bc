"""Where does the vmapped multi-chain step spend time vs C x single-chain?"""
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
from instruct_tpu.kernels import fused_step as fs

panel = synthetic_panel(n_indv=1000, n_loci=10_000, n_pops=3, n_alleles=2,
                        seed=7)
data = panel.data
spec = ModelSpec(mode=2, n_pops=3, s_subsweeps=12)
step_core, add_ll = build_step_parts(spec, data)
S = 200
key = jax.random.key(1)

def scan_time(body, carry, label, steps=S):
    f = jax.jit(lambda c: jax.lax.scan(lambda cc, i: (body(cc, i), None), c,
                                       jnp.arange(steps, dtype=jnp.int32))[0])
    out = jax.block_until_ready(f(carry))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(carry))
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(f"{label:44s} {dt:7.4f} ms/step", flush=True)
    return out

st1 = init_state(jax.random.key(0), spec, data)
scan_time(lambda s, i: step_core(s, jax.random.fold_in(key, i)), st1,
          "single-chain step_core")

for c in (2, 4, 8):
    keys = jax.random.split(jax.random.key(0), c)
    stc = jax.vmap(lambda kk: init_state(kk, spec, data))(keys)
    vstep = jax.vmap(step_core)
    def body(s, i):
        return vstep(s, jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys))
    scan_time(body, stc, f"vmap x{c} step_core (per device-step)")

# vmapped site pass only, 4 chains
c = 4
keys = jax.random.split(jax.random.key(0), c)
stc = jax.vmap(lambda kk: init_state(kk, spec, data))(keys)
def site_only1(s, i):
    sw = fs.seed_words(jax.random.fold_in(key, i))
    wg_pair = jnp.exp2(1.0 - jnp.stack([s.gen, s.gen + 1], 1).astype(jnp.float32))
    z, qq, ll2, zc = fs.zq_gendiff_pass(sw, s.q, s.freq, data.geno,
                                        data.site_valid, data.hom, s.z,
                                        wg_pair, structure=True,
                                        bits2=data.bits2)
    return s._replace(z=z, zcounts=zc if zc is not None else s.zcounts)
vsite = jax.vmap(site_only1, in_axes=(0, None))
scan_time(lambda s, i: vsite(s, i), stc, "vmap x4 site pass only")
