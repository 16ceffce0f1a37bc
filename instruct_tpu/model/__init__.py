from instruct_tpu.model import likelihood

__all__ = ["likelihood"]
