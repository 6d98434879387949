from semivl_tpu.datasets.classes import CLASSES, NUM_CLASSES
from semivl_tpu.datasets.palettes import get_palette

__all__ = ["CLASSES", "NUM_CLASSES", "get_palette"]
