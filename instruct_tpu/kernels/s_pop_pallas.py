"""Fused Pallas TPU kernel for the mode-2 S-update tail.

The mode-2 selfing-rate update (update_S_POP, mcmc.c:913-983) is a
per-subpopulation MH sweep whose target couples the K pops through
sbar_i = sum_k q_ik s_k (proposal(), mcmc.c:1630-1648), so pops update one
at a time.  With `s_subsweeps` inner sweeps the XLA formulation is
J * K sequential micro-kernels (rank-1 sbar update + two O(N) reductions
each) — at the north-star config (J=12, K=3) that is ~0.4 ms/step of pure
kernel-launch latency, as expensive as the whole fused site pass.

This kernel runs the entire tail in one VMEM-resident pass:

  * all J * K back-reflection MH iterations, caching the scalar target
    f(sbar) = sum_i [ (g_i - 1) log sbar_i ]_{g_i > 1} + sum_i log(1 - sbar_i)
    so each iteration is one rank-1 update + one fresh evaluation;
  * the selfing-generation proposal g' ~ Geom(1 - sbar) at the fresh sbar
    with the boundary overrides of update_G (mcmc.c:1071-1084);
  * the generation-weight pair w = 2^{1-g} for (current, proposed) g that
    the fused site pass consumes; and
  * the log-uniforms for the downstream G accept,

using the on-core PRNG (one seed per (chain, step)).  Everything that was
36 launches + 5 threefry draws becomes one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-30


def _u01(shape, rng):
    """U(0, 1) strictly inside the open interval (23-bit resolution)."""
    if rng is not None:
        return next(rng)
    bits = pltpu.prng_random_bits(shape)
    return ((bits & 0x7FFFFF).astype(jnp.float32) + 0.5) * (1.0 / (1 << 23))


def _log(x):
    return jnp.log(jnp.maximum(x, _EPS))


def _kernel(seed_ref, q_ref, g1_ref, rates_ref,
            out_rates_ref, out_gprop_ref, out_wg_ref, out_logu_ref, *,
            n_pops, subsweeps, delta0, gen_cap, n_seed_words, rng=None):
    if rng is None:
        if n_seed_words >= 2:
            pltpu.prng_seed(seed_ref[0], seed_ref[1])
        else:
            pltpu.prng_seed(seed_ref[0])

    nu = subsweeps * n_pops
    urows = -(-nu // 128)
    u_prop = _u01((urows, 128), rng)
    u_acc = _u01((urows, 128), rng)

    g1 = g1_ref[:]                                   # (1, Np) f32, pad = 0
    ghas = g1 > 0.0
    rates = [rates_ref[0, k] for k in range(n_pops)]
    sbar = rates[0] * q_ref[0:1, :]
    for k in range(1, n_pops):
        sbar = sbar + rates[k] * q_ref[k:k + 1, :]

    def target(sb):
        # padded lanes: q rows are zero-padded so sb = 0 there ->
        # log(1 - 0) = 0 and g1 = 0 kills the first term: exact sum.
        t = jnp.where(ghas, g1 * _log(sb), 0.0) + _log(1.0 - sb)
        return t.sum()

    f_cur = target(sbar)
    for j in range(subsweeps):
        for k in range(n_pops):
            idx = j * n_pops + k
            u = u_prop[idx // 128, idx % 128]
            s_old = rates[k]
            s_step = jnp.abs(s_old + (2.0 * u - 1.0) * delta0)
            s_new = jnp.where(s_step >= 1.0, 2.0 - s_step, s_step)
            sbar_new = sbar + q_ref[k:k + 1, :] * (s_new - s_old)
            f_new = target(sbar_new)
            acc = jnp.log(u_acc[idx // 128, idx % 128]) < (f_new - f_cur)
            rates[k] = jnp.where(acc, s_new, s_old)
            sbar = jnp.where(acc, sbar_new, sbar)
            f_cur = jnp.where(acc, f_new, f_cur)

    # g' ~ Geom(1 - sbar) on {1..cap} with update_G's boundary overrides
    ug = _u01(g1.shape, rng)
    s_c = jnp.clip(sbar, 1e-6, 1.0 - 1e-6)
    g = 1 + jnp.floor(jnp.log(ug) / jnp.log(s_c)).astype(jnp.int32)
    g = jnp.clip(g, 1, gen_cap)
    g = jnp.where(sbar <= 1e-3, 1, g)
    g = jnp.where(sbar >= 1.0 - 1e-3, gen_cap, g)
    out_gprop_ref[:] = g

    gen_old = g1 + 1.0
    out_wg_ref[0:1, :] = jnp.exp2(1.0 - gen_old)
    out_wg_ref[1:2, :] = jnp.exp2(1.0 - g.astype(jnp.float32))
    out_logu_ref[:] = jnp.log(_u01(g1.shape, rng))

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    rvec = jnp.zeros((1, 128), jnp.float32)
    for k in range(n_pops):
        rvec = jnp.where(lane == k, rates[k], rvec)
    out_rates_ref[:] = rvec


@functools.partial(jax.jit, static_argnames=("subsweeps", "delta0",
                                             "gen_cap", "interpret"))
def s_pop_tail(seed, q, gen, rates, *, subsweeps, delta0, gen_cap,
               interpret=False, test_draws=None):
    """Fused mode-2 S tail: J*K MH subsweeps + G proposal + accept logu.

    seed    i32[] or i32[W]   key words (fused_step.seed_words)
    q       f32[N, K]         admixture proportions
    gen     i32[N]            current selfing generations
    rates   f32[K]            current selfing rates

    Returns (rates' f32[K], gen_prop i32[N], wg_pair f32[N, 2],
    logu_acc f32[N]).  wg_pair is 2^{1-g} at (current, proposed) g — the
    column pair zq_gendiff_pass consumes; logu_acc the log-uniforms for
    the G MH accept.  `test_draws` feeds explicit uniform planes in draw
    order (u_prop, u_acc [urows,128]; ug, u_logu [1,Np]) for
    interpret-mode testing.
    """
    n, k = q.shape
    if k > 8:
        raise ValueError(f"s_pop_tail supports n_pops <= 8, got {k}")
    np_ = n + (-n % 128)
    qp = jnp.pad(q.astype(jnp.float32).T, ((0, 8 - k), (0, np_ - n)))
    g1 = jnp.pad((gen.astype(jnp.float32) - 1.0)[None, :],
                 ((0, 0), (0, np_ - n)))
    rp = jnp.pad(rates.astype(jnp.float32)[None, :], ((0, 0), (0, 128 - k)))

    seed_w = jnp.atleast_1d(jnp.asarray(seed, jnp.int32)).reshape(-1)
    operands = [qp, g1, rp]
    in_specs = [
        pl.BlockSpec(qp.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(g1.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(rp.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
    ]
    rng = None
    if test_draws is not None:
        operands += list(test_draws)
        in_specs += [pl.BlockSpec(d.shape, lambda i, *_: (0, 0),
                                  memory_space=pltpu.VMEM)
                     for d in test_draws]

    def kernel(seed_ref, q_ref, g1_ref, rates_ref, *rest):
        *draw_refs, o_r, o_g, o_w, o_u = rest
        it = iter([d[:] for d in draw_refs]) if draw_refs else None
        _kernel(seed_ref, q_ref, g1_ref, rates_ref, o_r, o_g, o_w, o_u,
                n_pops=k, subsweeps=max(1, subsweeps), delta0=delta0,
                gen_cap=gen_cap, n_seed_words=seed_w.shape[0], rng=it)

    out_shapes = (jax.ShapeDtypeStruct((1, 128), jnp.float32),
                  jax.ShapeDtypeStruct((1, np_), jnp.int32),
                  jax.ShapeDtypeStruct((2, np_), jnp.float32),
                  jax.ShapeDtypeStruct((1, np_), jnp.float32))
    out_specs = tuple(
        pl.BlockSpec(s.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
        for s in out_shapes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,), in_specs=in_specs,
        out_specs=out_specs)
    r_out, gprop, wg, logu = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        interpret=interpret)(seed_w, *operands)
    return (r_out[0, :k], gprop[0, :n], wg[:, :n].T, logu[0, :n])
