from instruct_tpu.data.dataset import Dataset, Panel
from instruct_tpu.data.synthetic import synthetic_panel

__all__ = ["Dataset", "Panel", "synthetic_panel"]
