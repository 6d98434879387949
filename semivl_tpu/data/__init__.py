from semivl_tpu.data.dataset import SemiDataset
from semivl_tpu.data.loader import ShardedLoader

__all__ = ["SemiDataset", "ShardedLoader"]
