from instruct_tpu.mcmc.state import McmcState, init_state
from instruct_tpu.mcmc.step import build_step
from instruct_tpu.mcmc.driver import run_mcmc, RunResult

__all__ = ["McmcState", "init_state", "build_step", "run_mcmc", "RunResult"]
