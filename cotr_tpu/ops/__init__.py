from cotr_tpu.ops.canvas import (make_canvas_batch, normalize_canvas,
                                 two_images_side_by_side)
from cotr_tpu.ops.sampling import (build_pyramid, crop_and_resize,
                                   crop_and_resize_level,
                                   crop_and_resize_matmul,
                                   crop_and_resize_pyramid, grid_sample,
                                   mip_level_for, resize_bilinear)

__all__ = [
    "make_canvas_batch",
    "normalize_canvas",
    "two_images_side_by_side",
    "build_pyramid",
    "crop_and_resize",
    "crop_and_resize_level",
    "crop_and_resize_matmul",
    "crop_and_resize_pyramid",
    "grid_sample",
    "mip_level_for",
    "resize_bilinear",
]
