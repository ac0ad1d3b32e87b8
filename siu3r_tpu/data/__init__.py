from siu3r_tpu.data.datasets import (  # noqa: F401
    ConcatSceneDataset,
    MultiViewSceneDataset,
    ReplicaDataset,
    ScanNetDataset,
    ScanNetPPDataset,
    ScanReferDataset,
)
from siu3r_tpu.data.loader import Loader, collate  # noqa: F401
