from . import modules  # noqa: F401
from .tasks import DetectionModel, GraphNet, parse_model, yaml_model_load  # noqa: F401
