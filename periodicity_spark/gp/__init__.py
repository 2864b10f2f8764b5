from periodicity_spark.gp.modelers import (
    gaussian_prior_density,
    gp_map,
    gp_mcmc_period,
    make_gaussian_prior_mixture,
)

__all__ = [
    "gp_map",
    "gp_mcmc_period",
    "make_gaussian_prior_mixture",
    "gaussian_prior_density",
]
