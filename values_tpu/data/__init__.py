from .pipeline import NumpyBatchLoader
from .samples import get_train_data_samples, get_val_test_data_samples
from .toy_datamodule import ToyDataModule3D

__all__ = ["NumpyBatchLoader", "get_train_data_samples",
           "get_val_test_data_samples", "ToyDataModule3D"]
