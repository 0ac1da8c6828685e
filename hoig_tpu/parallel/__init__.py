from hoig_tpu.parallel.mesh import (
    DataParallel,
    coordination_barrier,
    local_batch_slice,
    make_data_mesh,
    num_data_devices,
    per_process_batch_size,
    process_is_primary,
)
