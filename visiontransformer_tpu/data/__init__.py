from visiontransformer_tpu.data.classdict import (
    assign_closest_class,
    convert_bw,
    load_classdict,
)
from visiontransformer_tpu.data.split import train_val_test_split
from visiontransformer_tpu.data.dataset import CESegmentationDataset, PAEDBinaryDataset

__all__ = [
    "assign_closest_class",
    "convert_bw",
    "load_classdict",
    "train_val_test_split",
    "CESegmentationDataset",
    "PAEDBinaryDataset",
]
