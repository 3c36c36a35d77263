from .coco import CocoDetectionDataset, DAPairedDataset, build_dataset
from .loader import make_da_loader, make_eval_loader
