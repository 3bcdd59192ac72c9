"""NL-Kalman core: dense block-matching, group statistics, Kalman/Wiener
updates, and overlapping-patch aggregation."""

from .nlkalman import (  # noqa: F401
    nlkalman_filter_frame,
    nlkalman_smooth_frame,
    patch_validity,
)
