from .build import build_dataloader, build_yolo_dataset, check_source, load_inference_source  # noqa: F401
from .dataset import DataLoader, YOLODataset, check_det_dataset  # noqa: F401
from .utils import check_cls_dataset  # noqa: F401
