from .build import build_datasets, build_loaders  # noqa: F401
from .collate import (  # noqa: F401
    MixConfig,
    apply_meta_masking,
    apply_mixing,
    apply_partial_meta_masking,
    selective_cutmix,
    selective_mixup,
)
from .datasets import (  # noqa: F401
    DirImageSource,
    H5ImageSource,
    PrefetchingDataset,
    SyntheticImageSource,
)
from .ensure_ops_schedule import ensure_ops_schedule  # noqa: F401
from .image_verifier import ImageVerifier  # noqa: F401
from .loader import H5DataLoader  # noqa: F401
from .memcache import MemoryCache  # noqa: F401
from .processor import DatasetProcessor, ProcessedLabels  # noqa: F401
from .sampler import GroupedBatchSampler, build_sampler  # noqa: F401
