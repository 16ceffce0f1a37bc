"""Fused Pallas TPU Dirichlet sampler over count rows.

The conjugate P update draws Dirichlet(counts + 1) for every (pop, locus)
cell (update_P, mcmc.c:799-861 via rdirich/rgamma, random.c:233-330).
`jax.random.gamma` spends ~0.5 ms/step on the [K, L, A] draw at the
north-star panel — not in gamma math but in per-lane threefry key
derivation.  Here the whole draw is one VPU pass using the on-core PRNG:

  * gamma via Marsaglia-Tsang (2000) squeeze with a FIXED number of
    rejection rounds (static unroll, no while_loop): per-round acceptance
    is >= 0.95 at alpha = 1 and -> 0.998 as alpha grows, so after 3 rounds
    the miss probability is < 1.5e-4 per lane; misses fall back to the
    Wilson-Hilferty cube approximation (exact to ~1e-4 KS where it is
    used).  The sampler is therefore exact up to a < 1.5e-4-weight
    substitution of an approximate draw — far below f32 Monte-Carlo
    resolution of any posterior summary.
  * normals via Box-Muller from 23-bit on-core uniform bits,
  * the alpha < 1 case (Q's counts + alpha concentration) via the
    standard boost: Gamma(a) = Gamma(a + 1) * U^{1/a}.
  * normalization across each group of `rows_per_group` consecutive rows
    (alleles within a pop for P; the K pops of one individual for Q).

Layout contract: counts arrive as rows [G * A, C] with the long axis C on
the 128-lane dimension — the same row layout the fused site kernels
(fused_step.py) already use for freq and carried counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY = 1e-30
_TWO_PI = 2.0 * np.pi


def _u01(shape, rng):
    """U(0, 1) strictly inside the open interval (23-bit resolution)."""
    if rng is not None:
        return next(rng)
    bits = pltpu.prng_random_bits(shape)
    return ((bits & 0x7FFFFF).astype(jnp.float32) + 0.5) * (1.0 / (1 << 23))


def _normal(shape, rng):
    """Standard normal via Box-Muller (replaces rstd_normal,
    random.c:338-365)."""
    u1 = _u01(shape, rng)
    u2 = _u01(shape, rng)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def _gamma_block(a, rng, rounds):
    """Gamma(a) per lane, a >= 1: Marsaglia-Tsang with `rounds` static
    rejection rounds, Wilson-Hilferty fallback."""
    d = a - 1.0 / 3.0
    c = jax.lax.rsqrt(9.0 * d)
    g = jnp.zeros_like(a)
    acc = jnp.zeros(a.shape, jnp.bool_)
    for _ in range(rounds):
        z = _normal(a.shape, rng)
        u = _u01(a.shape, rng)
        v1 = 1.0 + c * z
        v = v1 * v1 * v1
        ok = (v > 0.0) & (jnp.log(u) < 0.5 * z * z + d - d * v
                          + d * jnp.log(jnp.maximum(v, _TINY)))
        g = jnp.where(ok & ~acc, d * v, g)
        acc = acc | ok
    zf = _normal(a.shape, rng)
    w1 = 1.0 - 1.0 / (9.0 * a) + zf * jax.lax.rsqrt(9.0 * a)
    wh = a * w1 * w1 * w1
    return jnp.where(acc, g, jnp.maximum(wh, _TINY))


def _kernel(seed_ref, conc_ref, valid_ref, out_ref, *, groups,
            rows_per_group, rounds, boost, n_seed_words, rng=None):
    j = pl.program_id(0)
    if rng is None:
        if n_seed_words >= 2:
            pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ j)
        else:
            pltpu.prng_seed(seed_ref[0], j)

    valid = valid_ref[:] != 0
    a0 = jnp.where(valid, conc_ref[:], 1.0)
    if boost:
        a = a0 + (a0 < 1.0).astype(jnp.float32)
    else:
        a = a0
    g = _gamma_block(a, rng, rounds)
    if boost:
        ub = _u01(a.shape, rng)
        g = jnp.where(a0 < 1.0,
                      g * jnp.exp(jnp.log(ub) / jnp.maximum(a0, 1e-6)), g)
    g = jnp.where(valid, g, 0.0)
    for gi in range(groups):
        lo, hi = gi * rows_per_group, (gi + 1) * rows_per_group
        blk = g[lo:hi, :]
        tot = blk.sum(axis=0, keepdims=True)
        out_ref[lo:hi, :] = blk / jnp.maximum(tot, _TINY)


@functools.partial(jax.jit, static_argnames=("rows_per_group", "rounds",
                                             "interpret"))
def dirichlet_rows(seed, conc, valid=None, *, rows_per_group, rounds=3,
                   interpret=False, test_draws=None):
    """Dirichlet rows: normalize Gamma(conc) within each group of
    `rows_per_group` consecutive rows, per column.

    seed   i32[] or i32[W]  key words (see fused_step.seed_words)
    conc   f32[R, C]        concentrations, R = groups * rows_per_group
    valid  bool[R, C]       optional mask; invalid cells draw weight 0
    test_draws              optional [n_draws, R, C] stack of pre-drawn
                            uniforms consumed in order instead of the
                            on-core PRNG (interpret-mode testing)

    Returns f32[R, C] with each (group, column) simplex summing to 1.
    Handles conc < 1 via the Gamma(a+1) * U^{1/a} boost.
    """
    r, c = conc.shape
    if r % rows_per_group:
        raise ValueError(f"rows {r} not divisible by group {rows_per_group}")
    groups = r // rows_per_group
    bl = min(2048, -(-c // 128) * 128)
    cp = c + (-c % bl)
    conc_p = jnp.pad(conc, ((0, 0), (0, cp - c)), constant_values=1.0)
    if valid is None:
        valid_p = jnp.ones((r, cp), jnp.int8)
    else:
        valid_p = jnp.pad(valid.astype(jnp.int8), ((0, 0), (0, cp - c)))
    grid = (cp // bl,)

    seed_w = jnp.atleast_1d(jnp.asarray(seed, jnp.int32)).reshape(-1)
    operands = [conc_p, valid_p]
    in_specs = [pl.BlockSpec((r, bl), lambda j, *_: (0, j),
                             memory_space=pltpu.VMEM)] * 2
    rng = None
    if test_draws is not None:
        nd = test_draws.shape[0]
        operands += [jnp.pad(test_draws[i], ((0, 0), (0, cp - c)),
                             constant_values=0.5) for i in range(nd)]
        in_specs += [pl.BlockSpec((r, bl), lambda j, *_: (0, j),
                                  memory_space=pltpu.VMEM)] * nd

    def kernel(seed_ref, conc_ref, valid_ref, *rest):
        *draw_refs, out_ref = rest
        it = iter([d[:] for d in draw_refs]) if draw_refs else None
        _kernel(seed_ref, conc_ref, valid_ref, out_ref, groups=groups,
                rows_per_group=rows_per_group, rounds=rounds,
                boost=True, n_seed_words=seed_w.shape[0], rng=it)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((r, bl), lambda j, *_: (0, j),
                               memory_space=pltpu.VMEM))
    out = pl.pallas_call(kernel, grid_spec=grid_spec,
                         out_shape=jax.ShapeDtypeStruct((r, cp), jnp.float32),
                         interpret=interpret)(seed_w, *operands)
    return out[:, :c]


def n_test_draws(rounds=3):
    """Number of [R, C] uniform planes `dirichlet_rows` consumes per block
    when fed explicit test_draws: 3 per MT round (2 for the Box-Muller
    normal + 1 accept), 2 for the fallback normal, 1 for the boost."""
    return 3 * rounds + 3


def dirichlet_kla(seed, counts_kla, allele_valid=None, *, rounds=3,
                  interpret=False):
    """P-update convenience wrapper: counts f32[K, L, A] (+prior already
    added), allele_valid bool[L, A] -> freq f32[K, L, A]."""
    k, l, a = counts_kla.shape
    rows = jnp.transpose(counts_kla, (0, 2, 1)).reshape(k * a, l)
    vrows = None
    if allele_valid is not None:
        vrows = jnp.tile(allele_valid.T, (k, 1))
    out = dirichlet_rows(seed, rows, vrows, rows_per_group=a, rounds=rounds,
                         interpret=interpret)
    return out.reshape(k, a, l).transpose(0, 2, 1)
