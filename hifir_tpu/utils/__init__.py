"""Utilities: logging, timing, IO (ref layer 1, SURVEY.md §1)."""
from .log import HifError, hif_assert, hif_error, hif_info, hif_warning, verbose_enabled
from .timer import Timer
from . import io
