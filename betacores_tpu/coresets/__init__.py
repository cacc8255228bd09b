from .api import (
    BatchPSVICoreset,
    BetaBlackBoxProjector,
    BetaCoreset,
    BlackBoxProjector,
    ContextualProjector,
    Coreset,
    HilbertCoreset,
    SparseVICoreset,
    UniformSamplingCoreset,
)
from .groups import (
    GroupCoresetState,
    group_ids_from_groups,
    init_group_state,
    make_group_incremental_builder,
)
from .bpsvi import BPSVIConfig, bpsvi_build_batch, make_bpsvi_builder
from .dpbpsvi import (DiffPrivBatchPSVICoreset, DPConfig, gaussian_rdp_epsilon,
                      make_dp_bpsvi_builder, poisson_batch_cap,
                      poisson_overflow_p, sgm_rdp, subsampled_gaussian_epsilon)
from .incremental import IncrementalBuilder, IncrementalConfig, make_incremental_builder
from .psvi import PseudoSparseVICoreset, make_psvi_builder
from .refine import refine_weights
from .select_beta import select_beta, trimmed_mean
from .state import CoresetState, get, init_state, warm_start_state
from .streaming import merge_reduce_build

__all__ = [
    "merge_reduce_build",
    "select_beta",
    "trimmed_mean",
    "BatchPSVICoreset",
    "BetaBlackBoxProjector",
    "BetaCoreset",
    "BlackBoxProjector",
    "ContextualProjector",
    "Coreset",
    "GroupCoresetState",
    "group_ids_from_groups",
    "init_group_state",
    "make_group_incremental_builder",
    "HilbertCoreset",
    "SparseVICoreset",
    "UniformSamplingCoreset",
    "BPSVIConfig",
    "bpsvi_build_batch",
    "make_bpsvi_builder",
    "DiffPrivBatchPSVICoreset",
    "DPConfig",
    "gaussian_rdp_epsilon",
    "make_dp_bpsvi_builder",
    "poisson_batch_cap",
    "poisson_overflow_p",
    "sgm_rdp",
    "subsampled_gaussian_epsilon",
    "IncrementalBuilder",
    "IncrementalConfig",
    "make_incremental_builder",
    "PseudoSparseVICoreset",
    "refine_weights",
    "make_psvi_builder",
    "CoresetState",
    "get",
    "init_state",
    "warm_start_state",
]
