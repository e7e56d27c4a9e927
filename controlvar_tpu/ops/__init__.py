from controlvar_tpu.ops.resize import (  # noqa: F401
    resize_matrix,
    resize_area,
    resize_bicubic,
    upsample_nearest_2x,
)
