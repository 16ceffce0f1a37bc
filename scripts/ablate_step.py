"""Marginal in-scan cost of each mode-2 kernel, by ablation.

Builds step variants with one update replaced by identity and times a
100-step scan each; the delta vs the full step is that kernel's true
marginal cost inside the fused program (isolated timings are misleading on
the remote-dispatch path).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from instruct_tpu.config import ModelSpec
    from instruct_tpu.data.synthetic import synthetic_panel
    from instruct_tpu.mcmc import updates as up
    from instruct_tpu.mcmc import step as step_mod
    from instruct_tpu.mcmc.state import init_state

    n, l, k = 1000, 10_000, 3
    panel = synthetic_panel(n_indv=n, n_loci=l, n_pops=k, n_alleles=2, seed=7)
    spec = ModelSpec(mode=2, n_pops=k)
    st0 = init_state(jax.random.key(0), spec, panel.data)

    def scan_ms(step, reps=3, t=100):
        def block(state, key):
            def body(s, i):
                return step(s, jax.random.fold_in(key, i)), None
            s, _ = jax.lax.scan(body, state, jnp.arange(t, dtype=jnp.int32))
            return s
        jb = jax.jit(block)
        out = jax.block_until_ready(jb(st0, jax.random.key(1)))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jb(st0, jax.random.key(1))
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps / t * 1e3

    full = scan_ms(step_mod.build_step(spec, panel.data))
    print(f"full step              {full:7.3f} ms/step")

    saved = {}

    def ablate(name, attr, fake):
        saved[name] = getattr(up if attr != "_cal_lkh" else step_mod, attr)
        mod = step_mod if attr == "_cal_lkh" else up
        orig = getattr(mod, attr)
        setattr(mod, attr, fake)
        try:
            ms = scan_ms(step_mod.build_step(spec, panel.data))
        finally:
            setattr(mod, attr, orig)
        print(f"- {name:20s} {ms:7.3f} ms/step  (marginal {full - ms:6.3f})")

    ablate("update_freq", "update_freq",
           lambda key, spec_, data, z, zz: st0.freq)
    ablate("update_s_pop", "update_s_pop",
           lambda key, spec_, q, gen, rates, ais: (rates, ais))
    ablate("update_gen", "update_gen",
           lambda key, spec_, data, freq, z, q, rates, gen: gen)
    ablate("update_zq", "update_zq",
           lambda key, spec_, data, freq, q, alpha, init=False:
           (st0.z, st0.q, None))
    ablate("update_alpha", "update_alpha",
           lambda key, spec_, q, alpha: alpha)
    ablate("cal_lkh", "_cal_lkh", lambda spec_, data, s: s)


if __name__ == "__main__":
    main()
