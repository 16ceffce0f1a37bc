"""Loci-axis sharding layout for the explicit shard_map SPMD step.

The model is conditionally independent across loci given (Z, Q, P)
(survey §2.2: every per-locus loop of the reference — update_P's count
loop mcmc.c:815-845, update_ZQ mcmc.c:1135-1174, log_ld_indv
mcmc.c:1735-1770 — is pointwise in L), so the natural tensor-parallel
decomposition splits the loci axis L into contiguous per-device blocks.
Each device owns a fully local sub-panel (its own [N, ploid*L_loc]
copy-major site tensors); the only cross-device traffic per MCMC step is

  * psum of the per-individual pop counts  [N, K]   (before the Q draw),
  * psum of the MH log-ratio columns       [N] or [K] (G / S / F accepts),
  * psum of the per-individual log-liks    [N]      (cal_lkh, stored steps),

all tiny compared to the local [N, L_loc] site passes, and all riding ICI
as XLA `psum` collectives.  This is the explicit (shard_map) alternative
to GSPMD auto-partitioning: it keeps the fused Pallas kernels usable
(GSPMD cannot partition custom calls) and makes the collective set
auditable.

Layout contract: the loci axis is padded to a multiple of the shard count
(padding loci have site_valid == False and allele_valid == False, so they
contribute nothing anywhere), then split contiguously.  Stacked tensors
carry a leading shard axis consumed by shard_map in_specs P(DATA_AXIS).

Sharded-run site tensors (z) that leave the shard_map region are in
"blocked" layout: the global [N, ploid*L] axis is the concatenation of the
shards' local copy-major blocks.  :func:`unblock_sites` converts back to
the standard copy-major global layout; :func:`block_sites` is its inverse
(used when feeding a restored checkpoint back into the sharded program).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from instruct_tpu.data.dataset import Dataset


def pad_loci(data: Dataset, n_shards: int) -> Dataset:
    """Pad the loci axis so L % n_shards == 0; padded loci are invalid."""
    if data.distinct is not None:
        raise NotImplementedError(
            "loci sharding of the tetraploid panel is not supported; use a "
            "chain-parallel mesh for ploid=4")
    l = data.n_loci
    pad = -l % n_shards
    if pad == 0:
        return data
    n, p = data.n_indv, data.ploid
    geno3 = jnp.reshape(data.geno, (n, p, l))
    geno3 = jnp.pad(geno3, ((0, 0), (0, 0), (0, pad)))
    return Dataset(
        geno=geno3.reshape(n, p * (l + pad)),
        site_valid=jnp.pad(data.site_valid, ((0, 0), (0, pad))),
        allele_valid=jnp.pad(data.allele_valid, ((0, pad), (0, 0))),
        hom=jnp.pad(data.hom, ((0, 0), (0, pad))),
        bits2=(None if data.bits2 is None
               else jnp.pad(data.bits2, ((0, 0), (0, pad)))),
    )


def stack_loci(data: Dataset, n_shards: int) -> Dataset:
    """Split the (padded) panel into ``n_shards`` contiguous loci blocks,
    stacked on a new leading axis for shard_map's P(DATA_AXIS) in_specs.

    Each [shard] slice is a self-contained local panel with
    L_loc = L / n_shards loci in standard copy-major layout.
    """
    data = pad_loci(data, n_shards)
    n, l, p = data.n_indv, data.n_loci, data.ploid
    ll = l // n_shards
    geno = (jnp.reshape(data.geno, (n, p, n_shards, ll))
            .transpose(2, 0, 1, 3).reshape(n_shards, n, p * ll))

    def split_l1(x):  # [N, L] -> [S, N, L_loc]
        return jnp.reshape(x, (n, n_shards, ll)).transpose(1, 0, 2)

    return Dataset(
        geno=geno,
        site_valid=split_l1(data.site_valid),
        allele_valid=(jnp.reshape(data.allele_valid,
                                  (n_shards, ll, data.max_alleles))),
        hom=split_l1(data.hom),
        bits2=None if data.bits2 is None else split_l1(data.bits2),
    )


def local_view(stacked: Dataset) -> Dataset:
    """The per-device panel inside the shard_map body (leading axis 1)."""
    return Dataset(
        geno=stacked.geno[0],
        site_valid=stacked.site_valid[0],
        allele_valid=stacked.allele_valid[0],
        hom=stacked.hom[0],
        bits2=None if stacked.bits2 is None else stacked.bits2[0],
    )


def unblock_sites(x, n_shards: int, ploid: int):
    """Blocked-global site tensor [..., n_shards * ploid * L_loc] (shard-
    major concatenation of local copy-major blocks) -> standard copy-major
    [..., ploid * L] with L = n_shards * L_loc."""
    x = np.asarray(x)
    lead = x.shape[:-1]
    ll = x.shape[-1] // (n_shards * ploid)
    x = x.reshape(*lead, n_shards, ploid, ll)
    order = tuple(range(len(lead)))
    x = x.transpose(*order, len(lead) + 1, len(lead), len(lead) + 2)
    return x.reshape(*lead, ploid * n_shards * ll)


def block_sites(x, n_shards: int, ploid: int):
    """Inverse of :func:`unblock_sites`."""
    x = np.asarray(x)
    lead = x.shape[:-1]
    ll = x.shape[-1] // (n_shards * ploid)
    x = x.reshape(*lead, ploid, n_shards, ll)
    order = tuple(range(len(lead)))
    x = x.transpose(*order, len(lead) + 1, len(lead), len(lead) + 2)
    return x.reshape(*lead, ploid * n_shards * ll)
