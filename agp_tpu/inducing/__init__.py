from .algorithms import KmeansAlg, OIPS, RandomSubset, UniGrid, inducingpoints

__all__ = ["KmeansAlg", "OIPS", "RandomSubset", "UniGrid", "inducingpoints"]
