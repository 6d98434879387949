from semivl_tpu.losses.ce import cross_entropy, ohem_cross_entropy
from semivl_tpu.losses.conf_weight import confidence_weighted_loss

__all__ = ["cross_entropy", "ohem_cross_entropy", "confidence_weighted_loss"]
