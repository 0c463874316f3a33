"""Estimator drivers (the reference's level-5 'modes')."""
