"""Device-side numerics: EM kernels, bootstrap weighting, redistribution."""
