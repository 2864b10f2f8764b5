from periodicity_spark.spectral.gls import GLS, default_freq_grid, gls_periodogram

__all__ = ["GLS", "default_freq_grid", "gls_periodogram"]
