"""Multi-device execution: mesh construction, sharded binning, psum merges."""
