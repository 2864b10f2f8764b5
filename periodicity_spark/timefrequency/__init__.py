from periodicity_spark.timefrequency.hht import hht
from periodicity_spark.timefrequency.wps import (
    composite_spectrum,
    denoise,
    gwps,
    reconstruct,
    sav,
    with_coi_mask,
    wps,
)

__all__ = [
    "wps", "sav", "gwps", "with_coi_mask", "composite_spectrum", "hht",
    "denoise", "reconstruct",
]
