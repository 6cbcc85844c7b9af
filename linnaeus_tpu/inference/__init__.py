from .config import InferenceConfig, load_inference_config  # noqa: F401
from .handler import LinnaeusInferenceHandler  # noqa: F401
from .schemas import (  # noqa: F401
    HierarchicalClassificationResult,
    InferenceRequestMetadata,
    ModelInformation,
    TaskPrediction,
)
