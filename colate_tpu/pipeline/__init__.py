"""Host-side columnarisation: stream joins, block assignment, binning."""
