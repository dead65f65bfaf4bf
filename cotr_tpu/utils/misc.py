"""Small utilities mirroring reference COTR/utils/utils.py helpers."""

from __future__ import annotations

import random
from typing import Optional, Sequence

import numpy as np


def fix_randomness(seed: int = 42) -> None:
    """Seed python + numpy RNGs (utils.py:57-62). JAX randomness is already
    explicit through PRNG keys."""
    random.seed(seed)
    np.random.seed(seed)


def has_nan(x) -> bool:
    """True if x contains NaN (utils.py:95-103)."""
    if x is None:
        return False
    arr = np.asarray(x)
    return bool(np.isnan(arr).any())


def print_notification(content_list: Sequence[str],
                       notification_type: str = "NOTIFICATION") -> None:
    print(f"---------------------- {notification_type} "
          "----------------------\n")
    for content in content_list:
        print(content)
    print("\n----------------------------------------------------")


def confirm(question: str = "OK to continue?") -> bool:
    """Interactive y/n gate (utils.py:106-115)."""
    answer = ""
    while answer not in ("y", "n"):
        answer = input(f"{question} [y/n] ").lower()
    return answer == "y"
