from instruct_tpu.kernels.zq_pallas import zq_sample_counts

__all__ = ["zq_sample_counts"]
