from marketdatapipeline_spark.features.engineering import (
    compute_all_features,
    compute_momentum_features,
    compute_technical_features,
    compute_temporal_features,
    compute_volatility_features,
)
from marketdatapipeline_spark.features.targets import generate_targets

__all__ = [
    "compute_all_features",
    "compute_technical_features",
    "compute_momentum_features",
    "compute_volatility_features",
    "compute_temporal_features",
    "generate_targets",
]
