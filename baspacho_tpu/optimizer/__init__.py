from .soft_loss import TrivialLoss, HuberLoss, CauchyLoss
from .pcg import pcg
from .preconditioner import (
    IdentityPrecond,
    BlockJacobiPrecond,
    BlockGaussSeidelPrecond,
    LowerPrecSolvePrecond,
)
from .optimizer import Optimizer, OptimizerSettings, VariableFamily
from .lie import SE3

__all__ = [
    "TrivialLoss", "HuberLoss", "CauchyLoss", "pcg",
    "IdentityPrecond", "BlockJacobiPrecond", "BlockGaussSeidelPrecond",
    "LowerPrecSolvePrecond", "Optimizer", "OptimizerSettings",
    "VariableFamily", "SE3",
]
