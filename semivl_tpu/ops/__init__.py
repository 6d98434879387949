from semivl_tpu.ops.resize import resize, resize_longer_matrix
from semivl_tpu.ops.dropout import dropout2d

__all__ = ["resize", "resize_longer_matrix", "dropout2d"]
