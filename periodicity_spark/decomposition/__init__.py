from periodicity_spark.decomposition.ceemdan import CEEMDAN
from periodicity_spark.decomposition.emd import emd_modes, lmd_modes, orthogonality_matrix

__all__ = ["CEEMDAN", "emd_modes", "lmd_modes", "orthogonality_matrix"]
