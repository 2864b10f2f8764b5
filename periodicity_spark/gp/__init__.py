from periodicity_spark.gp.modelers import (
    celerite_map,
    celerite_mcmc,
    gaussian_prior_density,
    gp_map,
    gp_mcmc_period,
    make_gaussian_prior_mixture,
)

__all__ = [
    "celerite_map",
    "celerite_mcmc",
    "gp_map",
    "gp_mcmc_period",
    "make_gaussian_prior_mixture",
    "gaussian_prior_density",
]
