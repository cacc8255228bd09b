from .projection import (
    Groups,
    center,
    draw_subsample,
    project_beta,
    project_beta_with_grad,
    project_groups,
    project_ll,
    project_ll_with_grad,
)

__all__ = [
    "Groups",
    "center",
    "draw_subsample",
    "project_beta",
    "project_beta_with_grad",
    "project_groups",
    "project_ll",
    "project_ll_with_grad",
]
