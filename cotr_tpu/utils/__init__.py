from cotr_tpu.utils import constants
from cotr_tpu.utils.constants import MAX_SIZE, CANVAS_H, CANVAS_W

__all__ = ["constants", "MAX_SIZE", "CANVAS_H", "CANVAS_W"]
