"""Hot-op kernels: Pallas TPU implementations with XLA reference paths."""
