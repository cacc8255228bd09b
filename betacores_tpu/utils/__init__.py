from .cache import enable_persistent_cache
from .errors import (
    TOL,
    NumericalPrecisionError,
    STATUS_NUMERIC_LIMIT,
    STATUS_OK,
    STATUS_RETRYING,
    get_tolerance,
    set_tolerance,
)
from .logging import get_logger, set_verbosity
from .opt import nn_adam, step_schedule
from .prng import KeySequence, key_from_seed

__all__ = [
    "enable_persistent_cache",
    "TOL",
    "NumericalPrecisionError",
    "STATUS_NUMERIC_LIMIT",
    "STATUS_OK",
    "STATUS_RETRYING",
    "get_tolerance",
    "set_tolerance",
    "get_logger",
    "set_verbosity",
    "nn_adam",
    "step_schedule",
    "KeySequence",
    "key_from_seed",
]
