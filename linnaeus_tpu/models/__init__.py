from linnaeus_tpu.models.factory import (  # noqa: F401
    create_head,
    create_model,
    list_heads,
    list_models,
    register_head,
    register_model,
)
from linnaeus_tpu.models import mformer_v0  # noqa: F401  (registers mFormerV0)
from linnaeus_tpu.models import mformer_v1  # noqa: F401  (registers mFormerV1)
from linnaeus_tpu.models import aggregation  # noqa: F401  (registers aggregations/resolvers)
from linnaeus_tpu.models.attention import zoo  # noqa: F401  (registers attention zoo)
from linnaeus_tpu.models.mformer_v0 import MFormerV0  # noqa: F401
from linnaeus_tpu.models.mformer_v1 import MFormerV1  # noqa: F401
from linnaeus_tpu.models.heads.heads import (  # noqa: F401
    Conv1dHead,
    LinearHead,
    MultiTaskHeads,
    configure_classification_heads,
)
from linnaeus_tpu.models.build import build_model, resolve_compute_dtype  # noqa: F401
