"""Data layer: raw parsing, synthetic generation, preprocessing,
feature engineering, negative sampling, and the batched input pipeline."""

from recsys_tpu.data.movielens import load_movielens_data, synthesize_ratings
from recsys_tpu.data.preprocessing import (
    check_preprocessing_quality,
    preprocessing_pipeline,
)
from recsys_tpu.data.pipeline import Batcher

__all__ = [
    "load_movielens_data",
    "synthesize_ratings",
    "preprocessing_pipeline",
    "check_preprocessing_quality",
    "Batcher",
]
