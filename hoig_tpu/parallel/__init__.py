from hoig_tpu.parallel.mesh import (
    DataParallel,
    local_batch_slice,
    make_data_mesh,
    process_is_primary,
)
