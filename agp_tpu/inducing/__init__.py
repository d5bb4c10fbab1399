from .algorithms import (
    GreedyVariance,
    KmeansAlg,
    OIPS,
    RandomSubset,
    UniGrid,
    inducingpoints,
)

__all__ = [
    "GreedyVariance",
    "KmeansAlg",
    "OIPS",
    "RandomSubset",
    "UniGrid",
    "inducingpoints",
]
