from .checks import (
    assert_in_bounds,
    checked,
    finite_or_skip_step,
    guard_finite,
    tree_all_finite,
)
from .profiling import Roofline, annotate, chain_calls, measure_op, time_fn, trace
from .port_weights import (
    egnn_network_params_from_torch,
    egnn_params_from_torch,
    egnn_sparse_network_params_from_torch,
    egnn_sparse_params_from_torch,
)
from .rotations import rot, rot_y, rot_z

__all__ = [
    "rot",
    "egnn_params_from_torch",
    "egnn_network_params_from_torch",
    "egnn_sparse_network_params_from_torch",
    "egnn_sparse_params_from_torch",
    "rot_y",
    "rot_z",
    "Roofline",
    "annotate",
    "chain_calls",
    "measure_op",
    "time_fn",
    "trace",
    "assert_in_bounds",
    "checked",
    "finite_or_skip_step",
    "guard_finite",
    "tree_all_finite",
]
