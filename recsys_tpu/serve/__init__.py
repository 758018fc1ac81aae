"""Serving layer: recommendation service + HTTP API.

Endpoint/contract parity with the reference FastAPI app (``app/main.py``)
including the ``/recommend/batch`` endpoint the reference documents and
smoke-tests but never shipped (``app/test_api.py:107-130`` vs
``app/main.py`` — SURVEY §4)."""

from recsys_tpu.serve.service import RecommendationService, StubRecommendationService

__all__ = ["RecommendationService", "StubRecommendationService"]
