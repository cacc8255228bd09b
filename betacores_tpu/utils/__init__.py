from .cache import enable_persistent_cache
from .export import (export_incremental_build, export_program, load_program,
                     load_program_file, save_program)
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
    "export_program",
    "export_incremental_build",
    "load_program",
    "load_program_file",
    "save_program",
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
