"""Single home for backend-platform detection (used by the Pallas
kernels and the retrieval dispatcher to choose compiled-vs-interpret
and flash-vs-XLA paths)."""

from __future__ import annotations


def on_tpu() -> bool:
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover — no backend at all
        return False
