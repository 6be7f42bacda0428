from anomalyclip_tpu.data.datamodule import AnomalyCLIPDataModule, DataConfig
from anomalyclip_tpu.data.records import (
    VideoRecord,
    frame_labels_for,
    parse_annotation_file,
    parse_temporal_annotations,
)
from anomalyclip_tpu.data.sampling import (
    gather_frame_indices,
    test_start_indices,
    train_start_indices,
)

__all__ = [
    "AnomalyCLIPDataModule",
    "DataConfig",
    "VideoRecord",
    "frame_labels_for",
    "parse_annotation_file",
    "parse_temporal_annotations",
    "gather_frame_indices",
    "test_start_indices",
    "train_start_indices",
]
