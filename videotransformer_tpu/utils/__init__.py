"""Utilities / distributed helpers (reference utils.py, SURVEY §2.1 #15)."""

from videotransformer_tpu.utils.helpers import (
    build_param_groups,
    denormalize,
    get_rank,
    get_world_size,
    is_dist_avail_and_initialized,
    is_main_process,
    print_on_rank_zero,
    show_processed_image,
    timeit_wrapper,
)

__all__ = [
    "build_param_groups",
    "denormalize", "get_rank", "get_world_size",
    "is_dist_avail_and_initialized", "is_main_process", "print_on_rank_zero",
    "show_processed_image", "timeit_wrapper",
]
