from .augment import AugmentConfig, apply_transform_chain, mixup, mosaic4
from .dataset import DetectionDataset, load_names
from .loader import DataLoader, collate_batch, infinite_indices
