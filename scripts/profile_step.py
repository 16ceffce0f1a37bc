"""Per-kernel timing of the mode-2 step at the north-star panel size.

Times each update kernel jitted in isolation (donated state, block_until_ready)
plus the fused whole step, so the HBM-pass budget is visible kernel by kernel.
Run on the TPU: `python scripts/profile_step.py [--n 1000 --l 10000 --k 3]`.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, reps=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--l", type=int, default=10_000)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--chains", type=int, default=1)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    from instruct_tpu.config import ModelSpec
    from instruct_tpu.data.synthetic import synthetic_panel
    from instruct_tpu.mcmc import updates as up
    from instruct_tpu.mcmc.state import init_state
    from instruct_tpu.mcmc.step import build_step, _cal_lkh
    from instruct_tpu.model import likelihood as lk

    panel = synthetic_panel(n_indv=args.n, n_loci=args.l, n_pops=args.k,
                            n_alleles=2, seed=7)
    data = panel.data
    spec = ModelSpec(mode=2, n_pops=args.k)
    st = init_state(jax.random.key(0), spec, data)
    key = jax.random.key(1)

    step = jax.jit(build_step(spec, data))
    ms_step = timeit(step, st, key)
    print(f"full step          {ms_step:8.3f} ms")

    kp = jax.random.fold_in(key, 0)
    f_freq = jax.jit(lambda s, k: up.update_freq(k, spec, data, s.z, s.zz))
    print(f"update_freq        {timeit(f_freq, st, kp):8.3f} ms")

    f_spop = jax.jit(lambda s, k: up.update_s_pop(k, spec, s.q, s.gen,
                                                  s.rates, s.ais_state))
    print(f"update_s_pop       {timeit(f_spop, st, kp):8.3f} ms")

    f_gen = jax.jit(lambda s, k: up.update_gen(k, spec, data, s.freq, s.z,
                                               s.q, s.rates, s.gen))
    print(f"update_gen         {timeit(f_gen, st, kp):8.3f} ms")

    f_zq = jax.jit(lambda s, k: up.update_zq(k, spec, data, s.freq, s.q,
                                             s.alpha))
    print(f"update_zq          {timeit(f_zq, st, kp):8.3f} ms")

    f_lkh = jax.jit(lambda s: _cal_lkh(spec, data, s))
    print(f"cal_lkh            {timeit(f_lkh, st):8.3f} ms")

    f_site = jax.jit(lambda s: lk.site_loglik(spec, data, s.freq, s.z, s.q,
                                              s.gen, s.rates))
    print(f"  site_loglik      {timeit(f_site, st):8.3f} ms")

    f_mix = jax.jit(lambda s: lk.mixture_copy_probs(s.freq, data, s.q))
    print(f"  mixture_probs    {timeit(f_mix, st):8.3f} ms")

    f_gz = jax.jit(lambda s: lk.gather_freq_at_z(s.freq, data, s.z))
    print(f"  gather_freq_at_z {timeit(f_gz, st):8.3f} ms")

    f_cnt = jax.jit(lambda s: up.allele_pop_counts(spec, data, s.z, s.zz))
    print(f"  allele_counts    {timeit(f_cnt, st):8.3f} ms")

    if args.chains > 1:
        keys = jax.random.split(jax.random.key(3), args.chains)
        sts = jax.vmap(lambda kk: init_state(kk, spec, data))(keys)
        vstep = jax.jit(jax.vmap(build_step(spec, data)))
        ms = timeit(vstep, sts, keys)
        print(f"vmapped step x{args.chains}   {ms:8.3f} ms "
              f"({ms / args.chains:.3f} ms/chain)")


if __name__ == "__main__":
    main()


def scan_probe():
    """In-scan per-step cost (dispatch amortized) + dispatch floor."""
    import argparse
    import jax, jax.numpy as jnp
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--l", type=int, default=10_000)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--chains", type=int, default=1)
    ap.add_argument("--scan", type=int, default=100)
    args, _ = ap.parse_known_args()
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    from instruct_tpu.config import ModelSpec
    from instruct_tpu.data.synthetic import synthetic_panel
    from instruct_tpu.mcmc.state import init_state
    from instruct_tpu.mcmc.step import build_step

    trivial = jax.jit(lambda x: x + 1)
    print(f"dispatch floor     {timeit(trivial, jnp.ones((8, 128))):8.3f} ms")

    panel = synthetic_panel(n_indv=args.n, n_loci=args.l, n_pops=args.k,
                            n_alleles=2, seed=7)
    spec = ModelSpec(mode=2, n_pops=args.k)
    step = build_step(spec, panel.data)

    def block(state, key):
        def body(st, i):
            return step(st, jax.random.fold_in(key, i)), None
        st, _ = jax.lax.scan(body, state,
                             jnp.arange(args.scan, dtype=jnp.int32))
        return st

    if args.chains > 1:
        keys = jax.random.split(jax.random.key(3), args.chains)
        sts = jax.vmap(lambda kk: init_state(kk, spec, panel.data))(keys)
        vb = jax.jit(jax.vmap(block))
        ms = timeit(vb, sts, keys, reps=3)
        print(f"scan x{args.scan} x{args.chains}ch   {ms:8.2f} ms"
              f" ({ms/args.scan:.3f} ms/step, {ms/args.scan/args.chains:.3f}"
              f" ms/chain-step)")
    st = init_state(jax.random.key(0), spec, panel.data)
    jb = jax.jit(block)
    ms = timeit(jb, st, jax.random.key(1), reps=3)
    print(f"scan x{args.scan} 1ch     {ms:8.2f} ms ({ms/args.scan:.3f} ms/step)")


if __name__ == "__main__" and "--scan-probe" in sys.argv:
    pass
