from periodicity_spark.phase.pdm import PDM, pdm_theta
from periodicity_spark.phase.stringlength import StringLength, string_length

__all__ = ["PDM", "pdm_theta", "StringLength", "string_length"]
