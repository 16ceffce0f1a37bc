from instruct_tpu.kernels.dirichlet_pallas import (dirichlet_kla,
                                                   dirichlet_rows)
from instruct_tpu.kernels.zq_pallas import zq_sample_counts

__all__ = ["zq_sample_counts", "dirichlet_rows", "dirichlet_kla"]
