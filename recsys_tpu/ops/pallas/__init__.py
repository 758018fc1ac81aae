"""Pallas TPU kernels. Every kernel has an XLA reference implementation
and an equivalence test; ``interpret=True`` is used automatically off-TPU."""
