"""DIC-based selection of the number of subpopulations K.

Mirrors inf_K_val (InStruct.c:536-601): sweep K in [n_small, n_large]
(default upper bound N^0.3 + 1, InStruct.c:547-548), run all chains per K,
pick the K minimising the per-K minimum DIC over chains (InStruct.c:588-592).

Each K is a separate jit specialisation (freq has shape [K, L, A]); the
chains within one K run vmapped/sharded as usual, so the sweep costs
K_num compiles but each runs at full device utilisation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import numpy as np

from instruct_tpu.config import ModelSpec, Schedule
from instruct_tpu.data.dataset import Dataset
from instruct_tpu.mcmc.driver import RunResult, run_mcmc


@dataclasses.dataclass
class KSelectResult:
    best_k: int
    dic: Dict[int, np.ndarray]        # per-K, per-chain DIC
    results: Dict[int, RunResult]


def infer_k(
    data: Dataset,
    spec: ModelSpec,
    sched: Schedule,
    key: jax.Array,
    n_small: int = 1,
    n_large: int = 0,
    mesh=None,
    **run_kwargs,
) -> KSelectResult:
    if n_large < 1 or n_small < 1 or n_small > n_large:
        n_small = 1
        n_large = int(data.n_indv ** 0.3) + 1  # InStruct.c:547-548
    dic: Dict[int, np.ndarray] = {}
    results: Dict[int, RunResult] = {}
    for k in range(n_small, n_large + 1):
        spec_k = dataclasses.replace(spec, n_pops=k)
        res = run_mcmc(data, spec_k, sched, jax.random.fold_in(key, k),
                       mesh=mesh, **run_kwargs)
        results[k] = res
        dic[k] = res.dic()
    best_k = min(dic, key=lambda k: dic[k].min())
    return KSelectResult(best_k=best_k, dic=dic, results=results)
