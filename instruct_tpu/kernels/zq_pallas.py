"""Fused Pallas TPU kernel for the Z-Gibbs update.

The Z update (update_ZQ, mcmc.c:1122-1174) is the hot kernel of every
admixture mode: per allele copy, sample z ~ Cat_k(q_k * P[k, l, a]) and
accumulate the per-individual pop counts for the Q draw.  The XLA
formulation needs ~15 HBM passes over [N, S] (freq selects, cumulative
sums, uniforms, count reductions); this kernel does everything in one pass
per copy: the genotype block is read once into VMEM, per-(pop, allele)
frequency rows live in VMEM, randomness comes from the on-core PRNG
(pltpu.prng_random_bits), and z plus the count partials are written back.

Layout contract (see model/likelihood.py): per-copy [N, L] blocks with the
loci axis on the 128-lane dimension; K and A are tiny static loops.

Outputs: z per copy i32[N, L] and qqnum f32[N, K] (counts of valid copies
per pop), accumulated across the loci grid axis by block revisiting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seed_ref, q_ref, freq_ref, *refs, n_pops, max_alleles, ploid,
            n_l_blocks, inkernel_prng, n_seed_words):
    geno_refs = refs[:ploid]
    valid_ref = refs[ploid]
    u_refs = () if inkernel_prng else refs[ploid + 1:2 * ploid + 1]
    off = (ploid + 1) if inkernel_prng else (2 * ploid + 1)
    z_refs = refs[off:off + ploid]
    cnt_ref = refs[off + ploid]

    i = pl.program_id(0)
    j = pl.program_id(1)
    if inkernel_prng:
        # Two-slot seeding: (key word 0, key word 1 XOR block id) — never
        # a linear seed+offset of one 31-bit word, which collides across
        # (step, chain, block) by birthday (see fused_step.py).
        block = i * n_l_blocks + j
        if n_seed_words >= 2:
            pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ block)
        else:
            pltpu.prng_seed(seed_ref[0], block)

    @pl.when(j == 0)
    def _init():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    valid = valid_ref[:] != 0
    for c in range(ploid):
        geno = geno_refs[c][:].astype(jnp.int32)
        # w_k = q[n, k] * freq[k, l, a_{nl}] via static (k, a) selects
        terms = []
        for k in range(n_pops):
            w = jnp.zeros(geno.shape, jnp.float32)
            for a in range(max_alleles):
                row = freq_ref[k * max_alleles + a, :][None, :]
                w = jnp.where(geno == a, row, w)
            terms.append(q_ref[:, k][:, None] * w)
        total = terms[0]
        for t in terms[1:]:
            total = total + t
        if inkernel_prng:
            # prng_random_bits yields signed i32 and Mosaic can't cast
            # uint32->f32: mask to the low 23 bits (always non-negative)
            # for a U[0,1) with single-precision mantissa resolution
            bits = pltpu.prng_random_bits(geno.shape)
            u01 = ((bits & 0x7FFFFF).astype(jnp.float32)
                   * (1.0 / (1 << 23)))
        else:
            u01 = u_refs[c][:]
        u = u01 * total
        z = jnp.zeros(geno.shape, jnp.int32)
        cum = jnp.zeros_like(total)
        for k in range(n_pops - 1):
            cum = cum + terms[k]
            z = z + (u > cum).astype(jnp.int32)
        z_refs[c][:] = z
        for k in range(n_pops):
            mask = valid & (z == k)
            cnt_ref[:, k] += mask.astype(jnp.float32).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("n_pops", "interpret"))
def zq_sample_counts(seed, q, freq, geno, site_valid, *, n_pops,
                     interpret=False, u=None):
    """Fused Z sample + counts.

    seed  i32[]          per-step PRNG seed (used by the on-core PRNG)
    q     f32[N, K]      admixture proportions
    freq  f32[K, L, A]   allele frequencies
    geno  i32[N, S]      flat allele codes (S = L * ploid)
    site_valid bool[N, L]
    u     optional f32[N, S] uniforms; when given the kernel consumes them
          instead of the on-core PRNG (needed under the CPU interpreter,
          where pltpu.prng_seed has no lowering; also makes the kernel
          bit-reproducible against the XLA path)

    Returns (z i32[N, S], qqnum f32[N, K]).
    """
    n, s = geno.shape
    l = site_valid.shape[1]
    ploid = s // l
    k, _, a = freq.shape

    # Block sizes sized for the ~16MB VMEM budget with double buffering:
    # per block ~ (2*ploid + 1) buffers of bn*bl*4B, x2 for pipelining.
    bn = min(128, n)
    bl = min(1024, l)
    n_pad = -n % bn
    l_pad = -l % bl
    inkernel_prng = u is None
    genos = [geno[:, c * l:(c + 1) * l] for c in range(ploid)]
    us = ([] if inkernel_prng
          else [u[:, c * l:(c + 1) * l] for c in range(ploid)])
    if n_pad or l_pad:
        genos = [jnp.pad(g, ((0, n_pad), (0, l_pad))) for g in genos]
        us = [jnp.pad(x, ((0, n_pad), (0, l_pad)), constant_values=0.5)
              for x in us]
        site_valid = jnp.pad(site_valid, ((0, n_pad), (0, l_pad)))
        q = jnp.pad(q, ((0, n_pad), (0, 0)))
        freq = jnp.pad(freq, ((0, 0), (0, l_pad), (0, 0)))
    np_, lp = n + n_pad, l + l_pad
    freq_rows = jnp.transpose(freq, (0, 2, 1)).reshape(k * a, lp)
    grid = (np_ // bn, lp // bl)

    seed_words = jnp.atleast_1d(jnp.asarray(seed, jnp.int32)).reshape(-1)
    kernel = functools.partial(_kernel, n_pops=n_pops, max_alleles=a,
                               ploid=ploid, n_l_blocks=grid[1],
                               inkernel_prng=inkernel_prng,
                               n_seed_words=seed_words.shape[0])
    out_shapes = ([jax.ShapeDtypeStruct((np_, lp), jnp.int32)
                   for _ in range(ploid)]
                  + [jax.ShapeDtypeStruct((np_, k), jnp.float32)])
    in_specs = (
        [pl.BlockSpec((bn, k), lambda i, j, *_: (i, 0),
                      memory_space=pltpu.VMEM),          # q
         pl.BlockSpec((k * a, bl), lambda i, j, *_: (0, j),
                      memory_space=pltpu.VMEM)]          # freq rows
        + [pl.BlockSpec((bn, bl), lambda i, j, *_: (i, j),
                        memory_space=pltpu.VMEM)         # geno per copy
           for _ in range(ploid)]
        + [pl.BlockSpec((bn, bl), lambda i, j, *_: (i, j),
                        memory_space=pltpu.VMEM)]        # valid
        + [pl.BlockSpec((bn, bl), lambda i, j, *_: (i, j),
                        memory_space=pltpu.VMEM)         # uniforms per copy
           for _ in range(len(us))]
    )
    out_specs = ([pl.BlockSpec((bn, bl), lambda i, j, *_: (i, j),
                               memory_space=pltpu.VMEM)
                  for _ in range(ploid)]
                 + [pl.BlockSpec((bn, k), lambda i, j, *_: (i, 0),
                                 memory_space=pltpu.VMEM)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(seed_words, q, freq_rows, *genos,
      site_valid.astype(jnp.int32), *us)

    zs = [o[:n, :l] for o in outs[:ploid]]
    qqnum = outs[ploid][:n]
    z = jnp.concatenate(zs, axis=1)        # copy-major [N, S]
    return z, qqnum
