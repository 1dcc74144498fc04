from .pipeline import NumpyBatchLoader
from .samples import get_train_data_samples, get_val_test_data_samples
from .toy_datamodule import ToyDataModule3D
from .lidc_datamodule import LidcIdriDataModule3D
from .base_datamodule import BaseDataModule, SimpleDataLoader
from .cityscapes_dataset import CityscapesDataset

__all__ = ["NumpyBatchLoader", "get_train_data_samples",
           "get_val_test_data_samples", "ToyDataModule3D",
           "LidcIdriDataModule3D", "BaseDataModule", "SimpleDataLoader",
           "CityscapesDataset"]
