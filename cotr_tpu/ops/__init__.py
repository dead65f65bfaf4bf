"""TPU-native op library: canvas building, sampling, CV solvers."""

from cotr_tpu.ops.canvas import (make_canvas_batch, normalize_canvas,
                                 two_images_side_by_side)
from cotr_tpu.ops.sampling import (crop_and_resize, crop_and_resize_matmul,
                                   crop_and_resize_window_indexed,
                                   crop_and_resize_windowed, grid_sample,
                                   resize_bilinear)

__all__ = [
    "make_canvas_batch",
    "normalize_canvas",
    "two_images_side_by_side",
    "crop_and_resize",
    "crop_and_resize_matmul",
    "crop_and_resize_window_indexed",
    "crop_and_resize_windowed",
    "grid_sample",
    "resize_bilinear",
]
