from .api import (
    BatchPSVICoreset,
    BetaBlackBoxProjector,
    BetaCoreset,
    BlackBoxProjector,
    Coreset,
    HilbertCoreset,
    SparseVICoreset,
    UniformSamplingCoreset,
)
from .bpsvi import BPSVIConfig, bpsvi_build_batch, make_bpsvi_builder
from .incremental import IncrementalBuilder, IncrementalConfig, make_incremental_builder
from .state import CoresetState, get, init_state, warm_start_state

__all__ = [
    "BatchPSVICoreset",
    "BetaBlackBoxProjector",
    "BetaCoreset",
    "BlackBoxProjector",
    "Coreset",
    "HilbertCoreset",
    "SparseVICoreset",
    "UniformSamplingCoreset",
    "BPSVIConfig",
    "bpsvi_build_batch",
    "make_bpsvi_builder",
    "IncrementalBuilder",
    "IncrementalConfig",
    "make_incremental_builder",
    "CoresetState",
    "get",
    "init_state",
    "warm_start_state",
]
