from semivl_tpu.parallel.mesh import (
    global_batch_to_device,
    make_data_mesh,
    setup_multihost,
)

__all__ = ["global_batch_to_device", "make_data_mesh", "setup_multihost"]
