"""Framework-wide constants.

Mirrors the reference's load-bearing coordinate convention
(/root/reference COTR/utils/constants.py:1-3 and SURVEY.md §2.2):

* Each image of a pair is resized to a ``MAX_SIZE`` square and the two squares
  are placed side-by-side on one canvas of shape (MAX_SIZE, 2*MAX_SIZE).
* All query/target coordinates are normalized so that x spans [0, 1] across
  the *full double-wide canvas* and y spans [0, 1]; the left image occupies
  x in [0, 0.5], the right image x in [0.5, 1].
"""

MAX_SIZE = 256
CANVAS_H = MAX_SIZE
CANVAS_W = 2 * MAX_SIZE

#: kNN image-retrieval overlap threshold (reference COTR/utils/constants.py:3)
VALID_NN_OVERLAPPING_THRESH = 0.1

#: ImageNet normalization applied to every canvas before the backbone
#: (reference COTR/inference/refinement_task.py:120).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# Inference thresholds (reference COTR/inference/inference_helper.py:15-19).
THRESHOLD_SPARSE = 0.02
THRESHOLD_PIXELS_RELATIVE = 0.02
BASE_ZOOM = 1.0
THRESHOLD_AREA = 0.02


def zoom_ladder(depth: int):
    """Depth-N zoom-in schedule ending at the finest 0.0625 level — the
    demos' ``np.linspace(0.5, 0.0625, 4)`` generalized over depth (reference
    demo_single_pair.py:28). ``linspace(..., num=1)`` would return [0.5], so
    depth 1 pins to the finest level instead of silently evaluating coarse.
    """
    import numpy as np

    assert depth >= 1, depth
    if depth == 1:
        return [0.0625]
    return [float(z) for z in np.linspace(0.5, 0.0625, depth)]
