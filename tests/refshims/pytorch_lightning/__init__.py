"""pytorch_lightning shim: import surface + seed_everything only."""
import os
import random

import numpy as np
import torch


def seed_everything(seed, workers=False):
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)
    os.environ["PL_GLOBAL_SEED"] = str(seed)
    return seed


class LightningDataModule:
    def __init__(self, *args, **kwargs):
        pass


class LightningModule(torch.nn.Module):
    def save_hyperparameters(self, *args, **kwargs):
        pass


class Callback:
    pass


class Trainer:
    @staticmethod
    def add_argparse_args(parser):
        return parser

    @staticmethod
    def from_argparse_args(*args, **kwargs):
        raise NotImplementedError("shim Trainer cannot run fits")
