from tec_mollm_tpu.data.scaler import StandardScaler
from tec_mollm_tpu.data.hdf5_io import load_and_split_data
from tec_mollm_tpu.data.features import (
    broadcast_indices,
    construct_feature_tensor,
    construct_target_tensor,
    create_features_and_targets,
    extract_time_features,
    standardize_features,
)
from tec_mollm_tpu.data.dataset import SlidingWindowDataset, BatchLoader

__all__ = [
    "StandardScaler",
    "load_and_split_data",
    "broadcast_indices",
    "construct_feature_tensor",
    "construct_target_tensor",
    "create_features_and_targets",
    "extract_time_features",
    "standardize_features",
    "SlidingWindowDataset",
    "BatchLoader",
]
