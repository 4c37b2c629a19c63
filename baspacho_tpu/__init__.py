"""baspacho_tpu — TPU-native batched supernodal sparse Cholesky.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
facebookresearch/baspacho: host-side symbolic analysis emits static block
plans; numeric factor/solve run as shape-static jitted kernels over flat
HBM buffers, with batching as a vmapped leading axis and multi-chip
scaling via jax.sharding over the batch dimension.
"""

from .sparse_structure import SparseStructure
from .block_matrix import CoalescedBlockMatrixSkel
from .accessor import CoalescedAccessor, PermutedCoalescedAccessor
from .computation_model import ComputationModel
from .solver import (
    AddFillPolicy,
    BackendType,
    Settings,
    Solver,
    create_solver,
)
from .utils import (
    cum_sum_vec,
    inverse_permutation,
    compose_permutations,
    left_permute,
)

__all__ = [
    "SparseStructure",
    "CoalescedBlockMatrixSkel",
    "CoalescedAccessor",
    "PermutedCoalescedAccessor",
    "ComputationModel",
    "AddFillPolicy",
    "BackendType",
    "Settings",
    "Solver",
    "create_solver",
    "cum_sum_vec",
    "inverse_permutation",
    "compose_permutations",
    "left_permute",
]
