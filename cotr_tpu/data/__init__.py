from cotr_tpu.data.colmap import (ColmapAsciiReader,
                                  ColmapWithDepthAsciiReader,
                                  image_path_to_depth_path, read_cameras_txt,
                                  read_images_meta, read_points3d_txt,
                                  read_valid_list)
from cotr_tpu.data.dataset import (CotrDataset, CotrZoomDataset,
                                   batch_iterator, compute_corrs)
from cotr_tpu.data.megadepth import DataConfig, MegadepthDataset
from cotr_tpu.data.scenes import ReprojRatioKnnSearch, SfmScene

__all__ = [
    "ColmapAsciiReader", "ColmapWithDepthAsciiReader",
    "image_path_to_depth_path", "read_cameras_txt", "read_images_meta",
    "read_points3d_txt", "read_valid_list", "CotrDataset", "CotrZoomDataset",
    "batch_iterator", "compute_corrs", "DataConfig", "MegadepthDataset",
    "ReprojRatioKnnSearch", "SfmScene",
]
