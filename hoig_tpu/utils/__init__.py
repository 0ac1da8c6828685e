from hoig_tpu.utils.util import (
    Colorize,
    labelcolormap,
    mkdirs,
    read_json,
    read_pickle,
    tensor2im,
    tensor2maskim,
    write_json,
    write_pickle,
)
