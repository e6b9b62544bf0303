from .augment import AugmentConfig, apply_transform_chain, mixup, mosaic4
from .dataset import DetectionDataset, load_names
from .device_aug import plan_sample, render_batch
from .loader import DataLoader, collate_batch, collate_plan_batch, infinite_indices
