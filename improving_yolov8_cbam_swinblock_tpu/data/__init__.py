from .dataset import DataLoader, YOLODataset, check_det_dataset  # noqa: F401
