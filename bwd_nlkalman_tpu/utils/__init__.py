"""Utility subsystems: pixel-expression evaluation (plambda), image
statistics (imprintf), and profiling/tracing."""

from .plambda import plambda  # noqa: F401
from .imprintf import imprintf  # noqa: F401
from .profiling import StageTimer, trace  # noqa: F401
