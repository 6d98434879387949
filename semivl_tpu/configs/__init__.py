from semivl_tpu.configs.experiments import (
    config_from_vars,
    generate_experiment_cfgs,
    save_experiment_cfgs,
)
from semivl_tpu.configs.models import get_model_config

__all__ = [
    "config_from_vars",
    "generate_experiment_cfgs",
    "save_experiment_cfgs",
    "get_model_config",
]
