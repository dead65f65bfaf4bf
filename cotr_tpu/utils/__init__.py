from cotr_tpu.utils import constants
from cotr_tpu.utils.constants import MAX_SIZE, CANVAS_H, CANVAS_W
from cotr_tpu.utils.misc import (confirm, fix_randomness, has_nan,
                                 print_notification)

__all__ = ["constants", "MAX_SIZE", "CANVAS_H", "CANVAS_W", "confirm",
           "fix_randomness", "has_nan", "print_notification"]
