"""Device-resident genotype panel representation.

The reference stores genotypes as a ragged `int ***seqdata` plus missing-data
masks built in data_interface.c (get_missing, data_interface.c:812-846).  The
TPU-native layout is a dense, padded, statically-shaped tensor pack:

  * ``geno``        int32[N, L, ploid] — allele codes in [0, A); 0 where
                    missing (the mask makes the value irrelevant).
  * ``site_valid``  bool[N, L]         — observed AND polymorphic locus.
                    Mirrors `missindx[i][j]!=1 && allelenum[j]>1`
                    (mcmc.c:817, 1137).
  * ``allele_valid`` bool[L, A]        — per-locus padding mask over the
                    max-allele axis (allelenum, data_interface.c:507).
  * ``hom``         bool[N, L]         — all `ploid` copies identical;
                    precomputes `chcksame(seqdata[i][j])` (mcmc.c:1658-1667).

All arrays are leading-axis shardable on individuals (N) or loci (L); the
model is conditionally independent across loci given (Z, Q, P), so loci-axis
sharding needs only a `psum` of log-lik partial sums and allele counts.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class Dataset(NamedTuple):
    """The jit-traversable pytree of panel tensors."""

    geno: jnp.ndarray          # int32[N, L, ploid]
    site_valid: jnp.ndarray    # bool[N, L]
    allele_valid: jnp.ndarray  # bool[L, A]
    hom: jnp.ndarray           # bool[N, L]

    @property
    def n_indv(self) -> int:
        return self.geno.shape[0]

    @property
    def n_loci(self) -> int:
        return self.geno.shape[1]

    @property
    def ploid(self) -> int:
        return self.geno.shape[2]

    @property
    def max_alleles(self) -> int:
        return self.allele_valid.shape[1]


def make_dataset(geno: np.ndarray, missing: np.ndarray,
                 n_alleles: Optional[np.ndarray] = None) -> Dataset:
    """Build a :class:`Dataset` from host arrays.

    ``geno`` int[N, L, ploid] with allele codes (missing entries arbitrary),
    ``missing`` bool[N, L] marks loci unobserved for an individual (any copy
    missing drops the whole site, as in get_missing, data_interface.c:826-833).
    """
    geno = np.asarray(geno, dtype=np.int32)
    missing = np.asarray(missing, dtype=bool)
    n, l, p = geno.shape
    geno = np.where(missing[:, :, None], 0, geno)
    if n_alleles is None:
        n_alleles = np.zeros(l, dtype=np.int32)
        for j in range(l):
            obs = geno[:, j][~missing[:, j]]
            n_alleles[j] = int(obs.max()) + 1 if obs.size else 0
    n_alleles = np.asarray(n_alleles, dtype=np.int32)
    a_max = max(int(n_alleles.max()), 2)
    allele_valid = np.arange(a_max)[None, :] < n_alleles[:, None]
    # Monomorphic / empty loci contribute nothing (mcmc.c:817: allelenum>1).
    site_valid = (~missing) & (n_alleles > 1)[None, :]
    hom = np.all(geno == geno[:, :, :1], axis=2)
    return Dataset(
        geno=jnp.asarray(geno),
        site_valid=jnp.asarray(site_valid),
        allele_valid=jnp.asarray(allele_valid),
        hom=jnp.asarray(hom),
    )


@dataclasses.dataclass
class Panel:
    """Host-side panel: the device Dataset plus human metadata.

    Mirrors what SEQDATA carries beyond the genotype tensor: individual
    labels (`indvname`), pre-defined population index/names (`popindx`,
    `poptype`, data_interface.c:147-216), marker names, and allele-type
    string tables used by the report writer (result_analysis.c:349).
    """

    data: Dataset
    indv_names: Optional[Sequence[str]] = None
    pop_index: Optional[np.ndarray] = None      # int[N] pre-defined pop of each indv
    pop_names: Optional[Sequence[str]] = None
    marker_names: Optional[Sequence[str]] = None
    allele_names: Optional[Sequence[Sequence[str]]] = None  # per locus
    n_alleles: Optional[np.ndarray] = None

    @property
    def n_indv(self) -> int:
        return self.data.n_indv

    @property
    def n_loci(self) -> int:
        return self.data.n_loci

    @property
    def missing_per_indv(self) -> np.ndarray:
        """`missvec` (data_interface.c:819-834): # missing loci per indiv."""
        return np.asarray(~np.asarray(self.data.site_valid), dtype=np.int64).sum(1)

    @property
    def n_predefined_pops(self) -> int:
        if self.pop_index is None:
            return 1
        return int(np.max(self.pop_index)) + 1
